"""The fused SemanticDepth pipeline: one jitted XLA program from full-res
frame to road-width scalar.

Reference counterpart: ``FrameProcessor.process_frame`` (semantic_depth.py:
81-460; sequence variant seq:103-376), which bounces between host OpenCV,
two tf.Sessions, host NumPy/SciPy and Open3D — ~79% of its wall time is host
work (thesis Table 19). Here every stage is staged into a single ``jax.jit``
program:

    resize (MXU matmuls) -> FCN-8s softmax masks -> monodepth flip-batch
    -> flip-average postprocess -> disparity scaling -> Q back-projection
    -> masked road denoise chain -> MXU outlier removal -> rw endpoints
    [-> fence chains + plane intersections for f2f]
    -> overlay composition

Dynamic quantities that change across frames/sweeps — the focal length (the
Munich 380/580 sweep, semantic_depth.py:854-859) and the disparity multiplier
(original width vs hardcoded 3800, seq:105) — are traced scalars, so no
recompilation occurs between sweep points.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import camera as camera_lib
from .config import PipelineConfig
from .models import FCN8s, Monodepth
from .models.monodepth import flip_average_postprocess
from .ops import neighbors, pcl
from .ops.overlay import segmentation_overlay
from .ops.resize import resize_clip_u8


@struct.dataclass
class FrameOutputs:
    """Everything the entry points need; all device arrays, fetched lazily.

    Scalars are f32 ();  masks (h, w) bool; dense clouds share (h*w,)-shaped
    storage with ``points3d``/``colors`` via boolean masks instead of gathers.
    """

    dist_rw: jnp.ndarray
    dist_f2f: jnp.ndarray  # nan when approach == 'rw'
    rw_found: jnp.ndarray  # bool — the sequence script's line_found guard
    left_pt_rw: jnp.ndarray  # (3,)
    right_pt_rw: jnp.ndarray  # (3,)
    left_pt_f2f: jnp.ndarray  # (3,) nan when approach == 'rw'
    right_pt_f2f: jnp.ndarray  # (3,)
    road_plane: jnp.ndarray  # (4,) [Cx, Cy, Cz, C]
    fence_left_plane: jnp.ndarray  # (4,)
    fence_right_plane: jnp.ndarray  # (4,)
    road_mask: jnp.ndarray  # (h, w) bool
    fence_mask: jnp.ndarray  # (h, w) bool
    disparity: jnp.ndarray  # (h, w) f32, already multiplied
    points3d: jnp.ndarray  # (h, w, 3) f32
    colors: jnp.ndarray  # (h, w, 3) f32 RGB 0..255
    overlay_small: jnp.ndarray  # (h, w, 3) f32 0..255, input channel order
    frame_small: jnp.ndarray  # (h, w, 3) f32 0..255 resized network input
    road_cloud: pcl.MaskedCloud  # compacted + fully denoised road points
    fence_left_valid: jnp.ndarray  # (h*w,) bool over points3d.reshape(-1, 3)
    fence_right_valid: jnp.ndarray  # (h*w,) bool


_REF_H, _REF_W = 256, 512  # the reference networks' working resolution


def _denoise_road(cloud: pcl.MaskedCloud, cfg: PipelineConfig, grid_hw=None):
    """Road denoise chain (semantic_depth.py:206-245).

    grid_hw: when the cloud is a back-projected image grid, its (H, W) —
    enables the windowed-stencil statistical filter (cfg.road.stat_mode ==
    'grid'), which replaces the O(N^2) top-k pass with O(N * window) math.

    The radius outlier filter's neighbor counts are kept on the REFERENCE's
    density scale: counts measured on a stride-subsampled (compacted) cloud
    are multiplied back by the stride, and counts measured on a denser-than
    -256x512 grid (the native full-res mode) are divided by the pixel ratio,
    so the reference's ``nb_points=80 within 0.5 m`` criterion
    (semantic_depth.py:238) means the same physical density everywhere.

    Both road-width estimators read the returned (compacted, fully
    filtered) cloud — see ``_road_width``.
    """
    rc = cfg.road
    cloud = pcl.keep_beyond(cloud, 2, rc.z_keep_beyond)
    cloud = pcl.mad_filter(cloud, rc.mad_y.axis, rc.mad_y.threshold)
    cloud = pcl.mad_filter(cloud, rc.mad_x.axis, rc.mad_x.threshold)
    cloud, road_plane = pcl.plane_inlier_filter(cloud, rc.plane.axis, rc.plane.threshold)
    px_scale = 1.0
    if grid_hw is not None:
        px_scale = (grid_hw[0] * grid_hw[1]) / float(_REF_H * _REF_W)
    # Overflow compaction keeps the ROAD-WIDTH SLAB at full density (its
    # min/max-x points ARE the output) and stride-subsamples the rest; the
    # radius cut then weights each candidate by its sampling stride so the
    # nb_points threshold keeps the reference's 256x512-density meaning.
    depth_rw = cfg.depth - cfg.rw_depth_offset
    slab_lo = -(depth_rw + cfg.rw_slab_halfwidth)
    slab_hi = -(depth_rw - cfg.rw_slab_halfwidth)

    def compact_slab_aware(c):
        return pcl.compact_slab_aware(
            c, rc.neighbor_capacity, 2, slab_lo, slab_hi, px_scale
        )

    if rc.stat_mode == "grid" and grid_hw is not None:
        h, w = grid_hw
        # FIXED window at every resolution. The kNN ball SHRINKS as the grid
        # densifies (a pixel's k nearest valid points are its immediate grid
        # neighbors at any resolution), so the 256x512-tuned window stays a
        # superset of the true k-neighborhood on finer grids. Verified on
        # TPU at 512x1024: (5,21) vs (7,31) leave finite-masks identical and
        # filter keep-sets within 0.004%. The previous linear scaling
        # ballooned the stencil ~64x at 1024x2048 (160 ms/frame) and its
        # >= (7,31)-at-512x1024 variants exceed Mosaic's 16 MB VMEM stack.
        new_valid = neighbors.statistical_outlier_filter_grid(
            cloud.xyz.reshape(h, w, 3),
            cloud.valid.reshape(h, w),
            rc.stat_nb_neighbors,
            rc.stat_std_ratio,
            rc.stat_window,
        )
        cloud = cloud.with_mask(new_valid.reshape(-1))
        cloud, weights = compact_slab_aware(cloud)
    else:
        cloud, weights = compact_slab_aware(cloud)
        cloud = neighbors.statistical_outlier_filter(
            cloud, rc.stat_nb_neighbors, rc.stat_std_ratio
        )
        weights = jnp.where(cloud.valid, weights, 0.0)
    cloud = neighbors.radius_outlier_filter(
        cloud, rc.radius_nb_points, rc.radius, weights=weights
    )
    return cloud, road_plane


def _fence_f2f(fence: pcl.MaskedCloud, road_plane: jnp.ndarray, cfg: PipelineConfig):
    """Fence denoise chains + plane-plane intersections (semantic_depth.py:
    273-324)."""
    fc = cfg.fence
    fence = pcl.mad_filter(fence, fc.mad_y.axis, fc.mad_y.threshold)
    fence = pcl.threshold_abs(fence, 2, fc.z_abs_threshold)
    left, right = pcl.split_by_mean(fence, 0)
    # the two MAD cuts are independent: batch their four medians into two
    # (same results as two mad_filter calls, half the reduction passes)
    if fc.mad_x_left.axis != fc.mad_x_right.axis:
        # a bare assert would vanish under python -O and silently filter
        # BOTH fences on the left's axis
        raise ValueError(
            f"fence mad_x axes must match for the paired filter: "
            f"{fc.mad_x_left.axis} vs {fc.mad_x_right.axis}"
        )
    left, right = pcl.mad_filter_pair(
        left, right, fc.mad_x_left.axis, fc.mad_x_left.threshold,
        fc.mad_x_right.threshold,
    )
    left, left_plane = pcl.plane_inlier_filter(left, fc.plane_left.axis, fc.plane_left.threshold)
    right, right_plane = pcl.plane_inlier_filter(
        right, fc.plane_right.axis, fc.plane_right.threshold
    )
    left_pt = pcl.planes_intersection_at_depth(road_plane, left_plane, cfg.depth)
    right_pt = pcl.planes_intersection_at_depth(road_plane, right_plane, cfg.depth)
    dist = pcl.distance_3d(left_pt, right_pt)
    return left, right, left_plane, right_plane, left_pt, right_pt, dist


def _road_width(cfg, road_cloud, road_plane, cam):
    """Road-width endpoints under cfg.rw_estimator; ONE definition shared by
    the fused/batched geometry tail and the staged profiling mode. Both
    estimators read the SAME fully denoised cloud.

    'slab_minmax' reproduces the reference (pcl.get_end_points_of_road,
    pcl.py:271-313): min/max x of the measured slab points — inherits the
    disparity network's per-point range noise at the two extremes.
    'plane_edge' (pcl.plane_edge_width_cloud) takes the same slab points but
    replaces each measured x with its ray-plane intersection, so the only
    remaining error sources are the plane fit and mask quantization. Earlier
    r5 variants read edges off the segmentation mask instead and were
    hostage to its false positives (5.7 m rw MAE raw, 0.3 m gated by the
    pre-compaction denoise validity — a ~15 px boundary halo the
    post-compaction filters remove cannot be mapped back to the grid, so the
    estimator moved to the cloud the full chain already cleans)."""
    depth_rw = cfg.depth - cfg.rw_depth_offset
    if cfg.rw_estimator == "plane_edge":
        return pcl.plane_edge_width_cloud(
            road_cloud, road_plane, cam.focal, depth_rw, cfg.rw_slab_halfwidth
        )
    if cfg.rw_estimator != "slab_minmax":
        raise ValueError(f"unknown rw_estimator: {cfg.rw_estimator!r}")
    left, right, found = pcl.road_endpoints(
        road_cloud, depth_rw, cfg.rw_slab_halfwidth
    )
    # width along x only (semantic_depth.py:259)
    return left, right, found, jnp.abs(left[0] - right[0])


def _scaled_camera(cfg: PipelineConfig, focal):
    """Intrinsics at the pipeline's working resolution.

    The reference camera presets are calibrated for its fixed 256x512
    network input (semantic_depth.py:592-607). Running the networks at
    another resolution (the native full-res mode) scales cx and the focal
    with width and cy with height so the back-projected cloud is the same
    physical scene; the caller must also scale the disparity multiplier by
    the returned width factor (disparity pixels scale with image width). At
    256x512 every factor is exactly 1.0 — bit-identical to the unscaled
    path. Focal uses the width factor (the CLIs preserve the reference's
    2:1 aspect, so width and height factors agree).
    """
    s_w = cfg.input_width / float(_REF_W)
    s_h = cfg.input_height / float(_REF_H)
    if abs(s_w - s_h) > 1e-9:
        # a single pinhole focal cannot represent anisotropic scaling: focal
        # scales with width here, so a non-2:1 grid would silently squash the
        # cloud's Y axis and change every plane fit / MAD cut downstream
        raise ValueError(
            f"input {cfg.input_height}x{cfg.input_width} breaks the camera "
            f"preset's 2:1 aspect ({_REF_H}x{_REF_W}): width factor {s_w:g} "
            f"!= height factor {s_h:g}"
        )
    cam = dataclasses.replace(
        cfg.camera,
        focal=focal * s_w,
        cx=cfg.camera.cx * s_w,
        cy=cfg.camera.cy * s_h,
    )
    return cam, s_w


def resolve_frame_scalars(cfg: PipelineConfig, frame_width: int, focal, disparity_mult):
    """Default the per-frame scalar inputs: focal from the config camera;
    disparity multiplier from the config or the ORIGINAL frame width
    (semantic_depth.py:109,145). One definition for the live pipeline (all
    three entry methods) AND frozen serving (cli.semantic_depth
    _FrozenPipeline) so the two paths cannot drift."""
    if focal is None:
        focal = cfg.camera.focal
    if disparity_mult is None:
        disparity_mult = (
            cfg.disparity_multiplier
            if cfg.disparity_multiplier is not None
            else float(frame_width)
        )
    return focal, disparity_mult


class SemanticDepthPipeline:
    """Builds and owns the jitted frame program.

    Args:
      config: pipeline configuration (presets in semantic_depth_tpu.config).
      fcn_params / mono_params: flax variable dicts for the two networks.
      fcn / mono: optionally pre-built modules (tests pass width-scaled ones).
    """

    def __init__(
        self,
        config: PipelineConfig,
        fcn_params: Any,
        mono_params: Any,
        fcn: Optional[FCN8s] = None,
        mono: Optional[Monodepth] = None,
    ):
        self.config = config
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.fcn = fcn or FCN8s(num_classes=config.segmenter.num_classes, compute_dtype=dtype)
        self.mono = mono or Monodepth(encoder=config.monodepth.encoder, compute_dtype=dtype)
        self.fcn_params = fcn_params
        self.mono_params = mono_params
        # Params are jit ARGUMENTS, not closure constants: closed-over
        # variable dicts get baked into the XLA module as literals (hundreds
        # of MB for the full networks), exploding compile time.
        self._process = jax.jit(self._process_impl)
        self._process_batch = jax.jit(self._process_batch_impl)

    # ------------------------------------------------------------------
    def segment(
        self, fcn_params: Any, frame_small: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """FCN-8s forward + 0.5-threshold masks (semantic_depth.py:544-556).
        frame_small: (h, w, 3) f32 0..255 raw intensities."""
        logits = self.fcn.apply(fcn_params, frame_small[None])
        probs = jax.nn.softmax(logits[0], axis=-1)
        thr = self.config.segmenter.threshold
        road = probs[:, :, 0] > thr
        fence = probs[:, :, 1] > thr
        return road, fence, probs

    def disparity(
        self, mono_params: Any, frame_small: jnp.ndarray, disparity_mult: jnp.ndarray
    ) -> jnp.ndarray:
        """Monodepth flip-batch forward + flip-average postprocess + scaling
        (semantic_depth.py:667-678, 144-145). flip_average=False (native
        mode, config.MonodepthConfig doc) runs the single forward only."""
        norm = frame_small.astype(jnp.float32) / 255.0
        if not self.config.monodepth.flip_average:
            return (
                self.mono.apply(mono_params, norm[None], method=self.mono.disp_left)[0]
                * disparity_mult
            )
        batch = jnp.stack([norm, norm[:, ::-1, :]], axis=0)
        disp = self.mono.apply(mono_params, batch, method=self.mono.disp_left)
        disp_pp = flip_average_postprocess(disp)
        return disp_pp * disparity_mult

    # ------------------------------------------------------------------
    def _process_impl(
        self,
        fcn_params: Any,
        mono_params: Any,
        frame: jnp.ndarray,
        focal: jnp.ndarray,
        disparity_mult: jnp.ndarray,
    ) -> FrameOutputs:
        cfg = self.config
        h, w = cfg.input_height, cfg.input_width
        cam, s_w = _scaled_camera(cfg, focal)

        # frames may arrive uint8 (the camera payload — 4x cheaper on the
        # host->device link); all math is f32 from here.
        frame_small = resize_clip_u8(frame.astype(jnp.float32), (h, w))
        road_mask, fence_mask, _ = self.segment(fcn_params, frame_small)
        disparity = self.disparity(mono_params, frame_small, disparity_mult * s_w)
        return self._frame_geometry(frame_small, road_mask, fence_mask, disparity, cam)

    def _frame_geometry(self, frame_small, road_mask, fence_mask, disparity, cam) -> FrameOutputs:
        """Per-frame tail shared by the fused single-frame program and the
        vmapped batch program: reprojection -> masked clouds -> denoise ->
        rw endpoints -> (f2f) -> overlay -> FrameOutputs. ONE definition so
        the two paths cannot drift (the staged profiling mode keeps its own
        per-stage split and is pinned equal by tests/test_pipeline.py)."""
        cfg = self.config
        h, w = cfg.input_height, cfg.input_width
        points3d = camera_lib.reproject_disparity(disparity, cam)
        colors = frame_small[:, :, ::-1]  # BGR -> RGB (semantic_depth.py:161)

        road = pcl.from_dense(points3d, colors, road_mask)
        road, road_plane = _denoise_road(road, cfg, grid_hw=(h, w))

        left_rw, right_rw, found, dist_rw = _road_width(cfg, road, road_plane, cam)

        nan3 = jnp.full((3,), jnp.nan, jnp.float32)
        nan4 = jnp.full((4,), jnp.nan, jnp.float32)
        n = h * w
        if cfg.approach == "both":
            fence = pcl.from_dense(points3d, colors, fence_mask)
            (fl, fr, lplane, rplane, left_f2f, right_f2f, dist_f2f) = _fence_f2f(
                fence, road_plane, cfg
            )
            fl_valid, fr_valid = fl.valid, fr.valid
        else:
            dist_f2f = jnp.float32(jnp.nan)
            left_f2f = right_f2f = nan3
            lplane = rplane = nan4
            fl_valid = fr_valid = jnp.zeros((n,), bool)

        overlay = segmentation_overlay(
            frame_small, road_mask, fence_mask, cfg.segmenter.road_rgba, cfg.segmenter.fence_rgba
        )

        return FrameOutputs(
            dist_rw=dist_rw,
            dist_f2f=dist_f2f,
            rw_found=found,
            left_pt_rw=left_rw,
            right_pt_rw=right_rw,
            left_pt_f2f=left_f2f,
            right_pt_f2f=right_f2f,
            road_plane=road_plane,
            fence_left_plane=lplane,
            fence_right_plane=rplane,
            road_mask=road_mask,
            fence_mask=fence_mask,
            disparity=disparity,
            points3d=points3d,
            colors=colors,
            overlay_small=overlay,
            frame_small=frame_small,
            road_cloud=road,
            fence_left_valid=fl_valid,
            fence_right_valid=fr_valid,
        )

    # ------------------------------------------------------------------
    def _process_batch_impl(
        self,
        fcn_params: Any,
        mono_params: Any,
        frames: jnp.ndarray,
        focal: jnp.ndarray,
        disparity_mult: jnp.ndarray,
    ) -> FrameOutputs:
        """Batched variant: frames (B, H0, W0, 3). The networks run natively
        batched (FCN on B, monodepth on one 2B flip-batch — better MXU
        utilization than B separate batch-2 calls); the geometry chain is
        vmapped. This is the streamed video batch path (BASELINE.json) the
        reference lacks (its sequence loop is strictly one-by-one,
        seq:689-701). Composed from the three batch stages below so the
        pipeline-parallel scheduler (parallel/pp.py) runs the exact same
        code, just on different devices."""
        cfg = self.config
        cam, s_w = _scaled_camera(cfg, focal)
        small, road_masks, fence_masks = self._batch_segment(fcn_params, frames)
        disps = self._batch_disparity(mono_params, small, disparity_mult * s_w)
        return self._batch_geometry(small, road_masks, fence_masks, disps, cam)

    # --- the three batch stages (also the pp stage boundaries) ------------
    def _batch_segment(self, fcn_params: Any, frames: jnp.ndarray):
        """Resize + FCN-8s forward + 0.5-threshold masks for a frame batch.
        Returns (small f32 (B,h,w,3) 0..255, road_masks, fence_masks)."""
        cfg = self.config
        h, w = cfg.input_height, cfg.input_width
        frames = frames.astype(jnp.float32)  # uint8 camera payloads welcome
        small = jax.vmap(lambda f: resize_clip_u8(f, (h, w)))(frames)  # (B, h, w, 3)
        logits = self.fcn.apply(fcn_params, small)
        probs = jax.nn.softmax(logits, axis=-1)
        thr = cfg.segmenter.threshold
        return small, probs[..., 0] > thr, probs[..., 1] > thr

    def _batch_disparity(
        self, mono_params: Any, small: jnp.ndarray, disparity_mult: jnp.ndarray
    ) -> jnp.ndarray:
        """Monodepth forward for a batch of resized frames; disparity_mult
        must already carry the width factor (``_scaled_camera``'s s_w)."""
        cfg = self.config
        b = small.shape[0]
        norm = small.astype(jnp.float32) / 255.0
        if cfg.monodepth.flip_average:
            flip_batch = jnp.concatenate([norm, norm[:, :, ::-1, :]], axis=0)  # (2B, h, w, 3)
            disp_all = self.mono.apply(mono_params, flip_batch, method=self.mono.disp_left)
            pairs = jnp.stack([disp_all[:b], disp_all[b:]], axis=1)  # (B, 2, h, w)
            return jax.vmap(flip_average_postprocess)(pairs) * disparity_mult
        # config.MonodepthConfig.flip_average doc: the scene-trained
        # native sets don't need the flip pass — halves the mono cost.
        return self.mono.apply(mono_params, norm, method=self.mono.disp_left) * disparity_mult

    def _batch_geometry(self, small, road_masks, fence_masks, disps, cam) -> FrameOutputs:
        """The vmapped per-frame geometry tail over a batch."""

        def geometry(frame_small, road_mask, fence_mask, disparity):
            return self._frame_geometry(frame_small, road_mask, fence_mask,
                                        disparity, cam)

        return jax.vmap(geometry)(small, road_masks, fence_masks, disps)

    def process_batch(
        self,
        frames,
        focal: Optional[float] = None,
        disparity_mult: Optional[float] = None,
    ) -> FrameOutputs:
        """Batched process: frames (B, H0, W0, 3) -> FrameOutputs with a
        leading batch axis on every leaf."""
        focal, disparity_mult = resolve_frame_scalars(
            self.config, frames.shape[2], focal, disparity_mult
        )
        frames = jnp.asarray(frames)
        return self._process_batch(
            self.fcn_params, self.mono_params, frames,
            jnp.float32(focal), jnp.float32(disparity_mult),
        )

    # ------------------------------------------------------------------
    def process_frame_staged(
        self,
        frame,
        focal: Optional[float] = None,
        disparity_mult: Optional[float] = None,
    ):
        """Stage-by-stage execution with host synchronization between stages,
        for real per-stage wall times in the reference's ``_times.txt``
        format (semantic_depth.py:100-454 timed every stage around host
        boundaries; the fused program has none, so this mode deliberately
        splits it). Slower than process_frame — each stage pays a dispatch +
        sync round trip; use for profiling, not serving.

        Returns (FrameOutputs, times) where times has the reference's stage
        keys: semantic, disparity, to3D, road, rw, fences, f2f.

        The FIRST call per shape runs every stage once untimed (warmup), so
        the reported numbers are execution, not XLA compilation — a cold
        cache would otherwise write tens of seconds of compile time into
        _times.txt as if it were stage work.
        """
        import time as _time

        cfg = self.config
        h, w = cfg.input_height, cfg.input_width
        focal, disparity_mult = resolve_frame_scalars(
            cfg, frame.shape[1], focal, disparity_mult
        )
        if not hasattr(self, "_stages"):
            self._build_stages()
        S = self._stages
        warm_key = tuple(frame.shape)
        if getattr(self, "_stages_warm", None) != warm_key:
            self._stages_warm = warm_key  # set first: the warmup call recurses
            self.process_frame_staged(frame, focal, disparity_mult)
        times = {}
        frame = jnp.asarray(frame)
        focal = jnp.float32(focal)
        mult = jnp.float32(disparity_mult * (w / float(_REF_W)))

        def sync(x):
            jax.block_until_ready(x)
            # block_until_ready is unreliable on some remote backends; a tiny
            # fetch guarantees completion
            jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
            return x

        t0 = _time.time()
        frame_small = sync(S["resize"](frame))
        times["read"] = _time.time() - t0  # device resize ~ the read+resize slot

        t0 = _time.time()
        road_mask, fence_mask = sync(S["segment"](self.fcn_params, frame_small))
        times["semantic"] = _time.time() - t0

        t0 = _time.time()
        disparity = sync(S["disparity"](self.mono_params, frame_small, mult))
        times["disparity"] = _time.time() - t0

        t0 = _time.time()
        points3d = sync(S["to3d"](disparity, focal))
        times["to3D"] = _time.time() - t0

        t0 = _time.time()
        road_cloud, road_plane = sync(S["road"](points3d, frame_small, road_mask))
        times["road"] = _time.time() - t0

        t0 = _time.time()
        left_rw, right_rw, found, dist_rw = sync(
            S["rw"](road_cloud, road_plane, focal)
        )
        times["rw"] = _time.time() - t0

        nan3 = jnp.full((3,), jnp.nan, jnp.float32)
        nan4 = jnp.full((4,), jnp.nan, jnp.float32)
        if cfg.approach == "both":
            t0 = _time.time()
            fl_valid, fr_valid, lplane, rplane = sync(
                S["fences"](points3d, frame_small, fence_mask)
            )
            times["fences"] = _time.time() - t0
            t0 = _time.time()
            left_f2f, right_f2f, dist_f2f = sync(S["f2f"](road_plane, lplane, rplane))
            times["f2f"] = _time.time() - t0
        else:
            times["fences"] = times["f2f"] = 0.0
            fl_valid = fr_valid = jnp.zeros((h * w,), bool)
            lplane = rplane = nan4
            left_f2f = right_f2f = nan3
            dist_f2f = jnp.float32(jnp.nan)

        overlay = S["overlay"](frame_small, road_mask, fence_mask)
        out = FrameOutputs(
            dist_rw=dist_rw, dist_f2f=dist_f2f, rw_found=found,
            left_pt_rw=left_rw, right_pt_rw=right_rw,
            left_pt_f2f=left_f2f, right_pt_f2f=right_f2f,
            road_plane=road_plane, fence_left_plane=lplane,
            fence_right_plane=rplane, road_mask=road_mask,
            fence_mask=fence_mask, disparity=disparity, points3d=points3d,
            colors=frame_small[:, :, ::-1], overlay_small=overlay,
            frame_small=frame_small, road_cloud=road_cloud,
            fence_left_valid=fl_valid, fence_right_valid=fr_valid,
        )
        return out, times

    def _build_stages(self):
        cfg = self.config
        h, w = cfg.input_height, cfg.input_width

        def to3d(disparity, focal):
            cam, _ = _scaled_camera(cfg, focal)
            return camera_lib.reproject_disparity(disparity, cam)

        def road_stage(points3d, frame_small, road_mask):
            colors = frame_small[:, :, ::-1]
            road = pcl.from_dense(points3d, colors, road_mask)
            return _denoise_road(road, cfg, grid_hw=(h, w))

        def rw_stage(road_cloud, road_plane, focal):
            cam, _ = _scaled_camera(cfg, focal)
            return _road_width(cfg, road_cloud, road_plane, cam)

        def fences_stage(points3d, frame_small, fence_mask):
            colors = frame_small[:, :, ::-1]
            fence = pcl.from_dense(points3d, colors, fence_mask)
            fc = cfg.fence
            fence = pcl.mad_filter(fence, fc.mad_y.axis, fc.mad_y.threshold)
            fence = pcl.threshold_abs(fence, 2, fc.z_abs_threshold)
            left, right = pcl.split_by_mean(fence, 0)
            left = pcl.mad_filter(left, fc.mad_x_left.axis, fc.mad_x_left.threshold)
            left, lplane = pcl.plane_inlier_filter(left, fc.plane_left.axis,
                                                   fc.plane_left.threshold)
            right = pcl.mad_filter(right, fc.mad_x_right.axis, fc.mad_x_right.threshold)
            right, rplane = pcl.plane_inlier_filter(right, fc.plane_right.axis,
                                                    fc.plane_right.threshold)
            return left.valid, right.valid, lplane, rplane

        def f2f_stage(road_plane, lplane, rplane):
            lp = pcl.planes_intersection_at_depth(road_plane, lplane, cfg.depth)
            rp = pcl.planes_intersection_at_depth(road_plane, rplane, cfg.depth)
            return lp, rp, pcl.distance_3d(lp, rp)

        self._stages = {
            "resize": jax.jit(lambda f: resize_clip_u8(f.astype(jnp.float32), (h, w))),
            "segment": jax.jit(lambda p, fs: self.segment(p, fs)[:2]),
            "disparity": jax.jit(self.disparity),
            "to3d": jax.jit(to3d),
            "road": jax.jit(road_stage),
            "rw": jax.jit(rw_stage),
            "fences": jax.jit(fences_stage),
            "f2f": jax.jit(f2f_stage),
            "overlay": jax.jit(
                lambda fs, rm, fm: segmentation_overlay(
                    fs, rm, fm, cfg.segmenter.road_rgba, cfg.segmenter.fence_rgba
                )
            ),
        }

    # ------------------------------------------------------------------
    def process_frame(
        self,
        frame,
        focal: Optional[float] = None,
        disparity_mult: Optional[float] = None,
    ) -> FrameOutputs:
        """Run the fused program on one frame.

        frame: (H0, W0, 3) array, any resolution, 0..255 intensities in the
          caller's channel order (the reference feeds BGR).
        focal: overrides config camera focal (traced — no recompile).
        disparity_mult: overrides config; defaults to the original frame
          width as in semantic_depth.py:109.
        """
        focal, disparity_mult = resolve_frame_scalars(
            self.config, frame.shape[1], focal, disparity_mult
        )
        frame = jnp.asarray(frame)
        return self._process(
            self.fcn_params, self.mono_params, frame,
            jnp.float32(focal), jnp.float32(disparity_mult),
        )
