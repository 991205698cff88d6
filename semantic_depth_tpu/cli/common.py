"""Shared CLI plumbing: image IO, annotation, weight loading, artifact suite.

Host-side by design: everything here happens before/after the fused device
program (reading frames, writing PNGs/PLYs/text files). cv2 is used when
available (it is what the reference used, and keeps annotation/codec parity);
PIL is the fallback.
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Optional, Tuple

import numpy as np

_WARNED_NO_TEXT = False

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..io import artifacts as art
from ..io.ply import PlyCloud
from ..models import FCN8s, Monodepth
from ..models import weights as weights_lib
from ..pipeline import FrameOutputs, SemanticDepthPipeline


def imread_bgr(path: str) -> np.ndarray:
    """Read an image as BGR uint8 — cv2.imread semantics
    (semantic_depth.py:105)."""
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"))
    return rgb[:, :, ::-1].copy()


def prefetch_decoded(paths, load, depth: int = 4, workers: int = 2):
    """Yield (path, load(path)) in order, decoding up to ``depth`` frames
    AHEAD on worker threads (VERDICT r4 #4: the streaming loops decoded
    serially between device dispatches).

    Entropy decode (JPEG/PNG) is host work by design on TPU — see DESIGN.md
    "Decode" — so the way to hide it is overlap, not porting it on-chip:
    cv2/PIL release the GIL inside the codec, and the device computes
    without the host CPU, so decode of frame N+k proceeds while the device
    chews frame N even on a single host core. ``load`` failures propagate
    per item (callers already map unreadable frames to None and skip)."""
    import concurrent.futures as cf
    from collections import deque

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        q = deque()
        for p in paths:
            q.append((p, ex.submit(load, p)))
            if len(q) >= depth:
                path, fut = q.popleft()
                yield path, fut.result()
        while q:
            path, fut = q.popleft()
            yield path, fut.result()


def imwrite(path: str, img: np.ndarray) -> None:
    """Write a BGR uint8 image — cv2.imwrite semantics."""
    img = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    if _HAS_CV2:
        cv2.imwrite(path, img)
        return
    from PIL import Image

    Image.fromarray(img[:, :, ::-1]).save(path)


def save_gray_png(path: str, img: np.ndarray) -> None:
    img = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    if _HAS_CV2:
        cv2.imwrite(path, img)
    else:
        from PIL import Image

        Image.fromarray(img, mode="L").save(path)


def host_resize(img: np.ndarray, oh: int, ow: int, cubic: bool = True) -> np.ndarray:
    """Host-side resize for ARTIFACT writing only (the compute-path resize is
    the MXU kernel in ops/resize.py). Keeps artifact IO off the device and
    avoids a fresh XLA compile per input resolution."""
    img = np.asarray(img)
    if _HAS_CV2:
        interp = cv2.INTER_CUBIC if cubic else cv2.INTER_LINEAR
        return cv2.resize(img, (ow, oh), interpolation=interp)
    from PIL import Image

    mode = Image.BICUBIC if cubic else Image.BILINEAR
    return np.asarray(Image.fromarray(img.astype(np.uint8)).resize((ow, oh), mode))


def save_disparity_png(disp: np.ndarray, output_name: str, oh: int, ow: int) -> None:
    """Disparity visualization: upsample to original size, gray colormap
    (semantic_depth.py:681-683 used scipy.misc.imresize + plt.imsave)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = host_resize((disp / max(float(np.max(disp)), 1e-9) * 255.0).astype(np.float32),
                    oh, ow, cubic=False)
    plt.imsave(f"{output_name}_disp.png", np.clip(d, 0, 255).astype(np.uint8), cmap="gray")


# ---------------------------------------------------------------------------
# Annotation (cv2.putText / rectangle layout of semantic_depth.py:339-399)
# ---------------------------------------------------------------------------
#
# With cv2 present the calls match the reference pixel-for-pixel; without it
# a PIL ImageDraw fallback renders the same text/layout (different font
# rasterization, same content) instead of silently returning the image
# un-annotated. With NEITHER optional dependency installed, text is skipped
# with a one-time warning (the band rectangle still lands via numpy) — a
# base install must not crash the whole frame over a label.


def _fill_rect(img: np.ndarray, p0, p1, color_bgr) -> None:
    if _HAS_CV2:
        cv2.rectangle(img, p0, p1, color_bgr, -1)
        return
    x0, y0 = p0
    x1, y1 = p1
    img[max(0, y0) : max(0, y1), max(0, x0) : max(0, x1)] = np.asarray(
        color_bgr, np.uint8
    )


def _put_text(img: np.ndarray, text, org, font_scale, color_bgr, thickness) -> None:
    if _HAS_CV2:
        cv2.putText(
            img, text, org, fontFace=16, fontScale=font_scale, color=color_bgr,
            thickness=thickness,
        )
        return
    try:
        from PIL import Image, ImageDraw, ImageFont
    except ImportError:
        global _WARNED_NO_TEXT
        if not _WARNED_NO_TEXT:
            warnings.warn(
                "neither cv2 nor PIL available: annotation text skipped "
                "(install the 'io' extra for annotated overlays)"
            )
            _WARNED_NO_TEXT = True
        return

    pil = Image.fromarray(img[:, :, ::-1])
    draw = ImageDraw.Draw(pil)
    size = max(10, int(22 * font_scale))  # ~cv2 Hershey glyph height
    try:
        font = ImageFont.load_default(size=size)
    except TypeError:  # older Pillow: fixed-size bitmap font
        font = ImageFont.load_default()
    rgb = tuple(int(c) for c in color_bgr[::-1])
    # cv2's org is the text BASELINE; PIL anchors at the ascender
    draw.text((org[0], max(0, org[1] - size)), text, fill=rgb, font=font)
    img[:] = np.asarray(pil)[:, :, ::-1]


def annotate_single(
    img: np.ndarray,
    depth: float,
    is_city: bool,
    approach: str,
    dist_rw: float,
    left_rw: np.ndarray,
    right_rw: np.ndarray,
    dist_f2f: Optional[float] = None,
    left_f2f: Optional[np.ndarray] = None,
    right_f2f: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Header band + distance texts, matching semantic_depth.py:350-395."""
    img = np.clip(np.asarray(img), 0, 255).astype(np.uint8).copy()
    h, w = img.shape[:2]
    if is_city:
        thickness, font_scale = 2, 2
    else:
        thickness, font_scale = 5, 4
    left, middle = 0.01, 0.33
    right = 0.68 if is_city else 0.67
    h_zero, h_first, h_second = 0.05 * h, 0.12 * h, 0.18 * h

    _fill_rect(img, (0, 0), (w, int(0.2 * h)), (156, 157, 159))
    _put_text(
        img, "At {:.2f}m depth:".format(depth), (int(middle * w), int(h_zero)),
        font_scale, (255, 255, 255), thickness,
    )
    if approach == "both" and dist_f2f is not None and np.isfinite(dist_f2f):
        _put_text(
            img, "{:.2f}m to l fence".format(-left_f2f[0]), (int(left * w), int(h_first)),
            font_scale, (255, 255, 255), thickness,
        )
        _put_text(
            img, "{:.2f}m to r fence".format(right_f2f[0]), (int(right * w), int(h_first)),
            font_scale, (255, 255, 255), thickness,
        )
        _put_text(
            img, "Fence2Fence: {:.2f}m".format(dist_f2f), (int(middle * w), int(h_first)),
            font_scale, (255, 255, 255), thickness,
        )
    _put_text(
        img, "{:.2f}m to road's l".format(-left_rw[0]), (int(left * w), int(h_second)),
        font_scale, (255, 255, 255), thickness,
    )
    _put_text(
        img, "{:.2f}m to road's r".format(right_rw[0]), (int(right * w), int(h_second)),
        font_scale, (255, 255, 255), thickness,
    )
    _put_text(
        img, "Road's width: {:.2f}m".format(dist_rw), (int(middle * w), int(h_second)),
        font_scale, (255, 255, 255), thickness,
    )
    return img


def annotate_sequence(
    img: np.ndarray,
    depth: float,
    line_found: bool,
    dist_rw: float = float("nan"),
    left_rw=None,
    right_rw=None,
) -> np.ndarray:
    """Sequence-script annotation incl. the 'Cannot compute width' fallback
    (seq:310-328)."""
    img = np.clip(np.asarray(img), 0, 255).astype(np.uint8).copy()
    h, w = img.shape[:2]
    thickness, font_scale = 2, 2
    if line_found:
        _fill_rect(img, (0, 0), (w, int(0.25 * h)), (156, 157, 159))
        _put_text(
            img, "At {:.2f} m depth:".format(depth), (int(0.36 * w), int(0.05 * h)),
            font_scale + 0.2, (255, 255, 255), thickness,
        )
        _put_text(
            img, "{:.2f}m to road's left end".format(-left_rw[0]),
            (int(0.05 * w), int(0.13 * h)), font_scale, (255, 255, 255), thickness,
        )
        _put_text(
            img, "{:.2f}m to road's right end".format(right_rw[0]),
            (int(0.5 * w), int(0.13 * h)), font_scale, (255, 255, 255), thickness,
        )
        _put_text(
            img, "Road's width: {:.2f} m".format(dist_rw), (int(0.35 * w), int(0.22 * h)),
            font_scale, (255, 255, 255), thickness,
        )
    else:
        _put_text(
            img, "Cannot compute width of road at {:.2f} m depth:".format(depth),
            (int(0.28 * w), int(0.035 * h)),
            font_scale + 0.2, (0, 255, 0), thickness,
        )
    return img


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------


def load_fcn_params(model: FCN8s, path: str, input_hw: Tuple[int, int]):
    """Load FCN-8s weights from a native .msgpack file, a directory containing
    fcn8s.msgpack, or a TF1 checkpoint directory (converted on the fly).
    ``path == 'random'`` initializes random weights (smoke tests)."""
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    )
    if path == "random":
        return template
    if os.path.isfile(path) and path.endswith(".msgpack"):
        return weights_lib.load_params(template, path)
    native = os.path.join(path, "fcn8s.msgpack")
    if os.path.isfile(native):
        return weights_lib.load_params(template, native)
    # TF checkpoint layout: <path>/variables/saved_model.* (fcn.py:100-107)
    import tensorflow as tf

    ckpt_dir = os.path.join(path, "variables")
    ckpt = tf.train.latest_checkpoint(ckpt_dir if os.path.isdir(ckpt_dir) else path)
    if ckpt is None:
        raise FileNotFoundError(f"no FCN weights found under {path}")
    converted = weights_lib.convert_fcn_checkpoint(ckpt)
    return weights_lib.as_jax_params(template, converted)


def load_mono_params(model: Monodepth, path: str, input_hw: Tuple[int, int]):
    """Monodepth weights: native .msgpack or TF1 checkpoint prefix
    (models/get_monodepth_model.sh layout). 'random' for smoke tests."""
    template = model.init(
        jax.random.PRNGKey(1), jnp.zeros((2, input_hw[0], input_hw[1], 3), jnp.float32)
    )
    if path == "random":
        return template
    if os.path.isfile(path) and path.endswith(".msgpack"):
        return weights_lib.load_params(template, path)
    # Converted-msgpack lookup: INSIDE a directory argument, or as a SIBLING
    # of a TF checkpoint prefix. (A bare `dirname(path)` would resolve 'w'
    # and 'w/' differently — trailing-slash-sensitive behavior.)
    base = path if os.path.isdir(path) else (os.path.dirname(path) or ".")
    native = os.path.join(base, "monodepth.msgpack")
    if os.path.isfile(native):
        return weights_lib.load_params(template, native)
    converted = weights_lib.convert_monodepth_checkpoint(path, encoder=model.encoder)
    return weights_lib.as_jax_params(template, converted)


class FrozenPipeline:
    """Serves frames from a StableHLO export (cli.export_pipeline) — the
    reference's ``--use_frozen optimized_graph.pb`` path
    (semantic_depth.py:472-513), with the whole fused program (not just the
    segmenter) in the artifact. Weights are baked in; no model code runs.
    The blob's frame shape (and batch, for batched exports) is fixed at
    export time, like the reference's frozen graph.

    mesh: optionally dp-shard a batched export over a device mesh
    (export.load_pipeline_sharded); the served batch becomes
    export_batch * dp, exposed as ``self.global_batch``."""

    global_batch: int | None = None

    def __init__(self, path: str, cfg: PipelineConfig, mesh=None):
        from ..export import load_pipeline, load_pipeline_meta, load_pipeline_sharded

        if mesh is not None:
            self._call = load_pipeline_sharded(path, mesh)
            self.global_batch = self._call.global_batch
        else:
            self._call = load_pipeline(path)
        self._path = path
        meta = load_pipeline_meta(path)
        if meta is not None:
            # The geometry (depth, approach, camera) is BAKED into the blob;
            # scalar defaults must come from the EXPORT config or serving
            # with a different CLI preset silently feeds the wrong focal.
            # Warn when the serving config disagrees on baked behavior.
            for key, got in (
                ("depth", cfg.depth),
                ("approach", cfg.approach),
                ("input_height", cfg.input_height),
                ("input_width", cfg.input_width),
            ):
                if meta.get(key) is not None and meta[key] != got:
                    warnings.warn(
                        f"--use_frozen: {key}={got} is ignored — the blob "
                        f"was exported with {key}={meta[key]} (baked in)"
                    )
            cfg = dataclasses.replace(
                cfg,
                camera=cfg.camera.with_focal(meta["camera_focal"]),
                disparity_multiplier=meta["disparity_multiplier"],
                depth=meta["depth"],
                approach=meta["approach"],
            )
        self.config = cfg

    def _run(self, frames, width, focal, disparity_mult):
        from ..pipeline import resolve_frame_scalars

        focal, disparity_mult = resolve_frame_scalars(
            self.config, width, focal, disparity_mult
        )
        out = self._call(jnp.asarray(frames), focal, disparity_mult)
        if isinstance(out, (tuple, list)):  # scalars-only export surface
            from types import SimpleNamespace

            return SimpleNamespace(dist_rw=out[0], dist_f2f=out[1], rw_found=out[2])
        return out

    def process_frame(self, frame, focal=None, disparity_mult=None):
        return self._run(frame, frame.shape[1], focal, disparity_mult)

    def process_batch(self, frames, focal=None, disparity_mult=None):
        return self._run(frames, frames.shape[2], focal, disparity_mult)


def require_dense_outputs(out, flag_context: str):
    """Fail with an actionable message when a scalars-only frozen blob is
    used on a path that writes dense artifacts."""
    if not hasattr(out, "overlay_small"):
        raise SystemExit(
            f"{flag_context} needs dense outputs; this frozen artifact was "
            "exported scalars-only — re-export with "
            "cli.export_pipeline --full_outputs"
        )
    return out


def apply_encoder_override(cfg: PipelineConfig, encoder: str) -> PipelineConfig:
    """Apply a --monodepth_encoder value (vgg|resnet50, reference flag
    semantic_depth.py:721-722) to the config."""
    if encoder not in ("vgg", "resnet50"):
        raise ValueError(f"unknown monodepth encoder: {encoder!r}")
    if encoder == cfg.monodepth.encoder:
        return cfg
    return dataclasses.replace(
        cfg, monodepth=dataclasses.replace(cfg.monodepth, encoder=encoder)
    )


def build_pipeline(
    cfg: PipelineConfig, semantic_model: str, monodepth_checkpoint: str,
    tiny: bool = False, native_s2d: bool = False,
):
    """tiny=True builds width-scaled networks (random weights only) — a CI /
    smoke-test mode; production weights require the full architecture.
    native_s2d=True builds the input_s2d full-res variants (models/fcn8s.py
    + models/monodepth.py docs — trained per-resolution sets, e.g.
    tools/train_bench_weights.py --native) and turns OFF the monodepth
    flip-average pass, matching every other native surface (bench native leg,
    tests/golden/native_golden.json, __graft_entry__.dryrun_multichip): the
    scene-trained native sets don't need it and it doubles the mono cost."""
    if native_s2d:
        cfg = dataclasses.replace(
            cfg, monodepth=dataclasses.replace(cfg.monodepth, flip_average=False)
        )
    # the packed vgg monodepth trunk halves 7 times (input/2 must divide by
    # 128); the resnet50 trunk halves 6 times (divide by 64) — fail here
    # with a usable message instead of a shape error deep in the encoder
    need = 256 if cfg.monodepth.encoder == "vgg" else 128
    if native_s2d and (cfg.input_height % need or cfg.input_width % need):
        raise ValueError(
            f"--native_s2d needs input_height/input_width multiples of {need} "
            f"(got {cfg.input_height}x{cfg.input_width}): the 2x2-packed "
            f"{cfg.monodepth.encoder} trunk requires its half-resolution grid "
            f"to divide by {need // 2}"
        )
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if tiny:
        fcn = FCN8s(num_classes=cfg.segmenter.num_classes, width_mult=0.0625,
                    fc_channels=32, input_s2d=native_s2d, compute_dtype=dtype)
        mono = Monodepth(encoder=cfg.monodepth.encoder, width_mult=0.0625,
                         input_s2d=native_s2d, compute_dtype=dtype)
    else:
        fcn = FCN8s(num_classes=cfg.segmenter.num_classes, input_s2d=native_s2d,
                    compute_dtype=dtype)
        mono = Monodepth(encoder=cfg.monodepth.encoder, input_s2d=native_s2d,
                         compute_dtype=dtype)
    hw = (cfg.input_height, cfg.input_width)
    fcn_params = load_fcn_params(fcn, semantic_model, hw)
    mono_params = load_mono_params(mono, monodepth_checkpoint, hw)
    return SemanticDepthPipeline(cfg, fcn_params, mono_params, fcn=fcn, mono=mono)


# ---------------------------------------------------------------------------
# Artifact suite for the single-image entry (FrameProcessor save_data path,
# semantic_depth.py:129-438)
# ---------------------------------------------------------------------------


def save_frame_artifacts(
    out: FrameOutputs,
    cfg: PipelineConfig,
    output_name: str,
    original_bgr: np.ndarray,
    is_city: bool,
) -> None:
    oh, ow = original_bgr.shape[:2]
    overlay_small = np.asarray(out.overlay_small)
    overlay_full = host_resize(overlay_small.astype(np.float32), oh, ow)

    # only-segmentation image (semantic_depth.py:341-345)
    imwrite(f"{output_name}_only_segmentation.png", overlay_full)

    # disparity visualization
    save_disparity_png(np.asarray(out.disparity), output_name, oh, ow)

    # gray masked sanity images (semantic_depth.py:172-177)
    colors = np.asarray(out.colors)
    gray = colors @ np.array([0.299, 0.587, 0.114])
    road_mask = np.asarray(out.road_mask)
    fence_mask = np.asarray(out.fence_mask)
    save_gray_png(f"{output_name}_road_mask.png", gray * road_mask)
    save_gray_png(f"{output_name}_fence_mask.png", gray * fence_mask)

    points3d = np.asarray(out.points3d)
    flat_pts = points3d.reshape(-1, 3)
    flat_cols = colors.reshape(-1, 3)

    # raw full cloud (semantic_depth.py:163-166)
    PlyCloud(flat_pts, flat_cols, f"{output_name}_raw").save()

    # npz of masked clouds (semantic_depth.py:194-197)
    np.savez(
        f"{output_name}_pointCloud.npz",
        road3D=flat_pts[road_mask.reshape(-1)],
        road_colors=flat_cols[road_mask.reshape(-1)],
        fence3D=flat_pts[fence_mask.reshape(-1)],
        fence_colors=flat_cols[fence_mask.reshape(-1)],
    )

    road_valid = np.asarray(out.road_cloud.valid)
    road_xyz = np.asarray(out.road_cloud.xyz)[road_valid]
    road_rgb = np.asarray(out.road_cloud.rgb)[road_valid]
    PlyCloud(road_xyz, road_rgb, f"{output_name}_ROAD").save()

    line_found = bool(out.rw_found)
    combined = PlyCloud(road_xyz, road_rgb, output_name)
    mesh, mesh_cols = art.plane_mesh(
        road_xyz, np.asarray(out.road_plane), cfg.road.plane.axis, cfg.road.plane.plane_color
    )
    combined.add(mesh, mesh_cols)
    if line_found:
        line, line_cols = art.measurement_line(
            np.asarray(out.left_pt_rw), np.asarray(out.right_pt_rw), [250, 0, 0]
        )
        line[:, 2] += 0.2  # visualization shift (semantic_depth.py:265)
        combined.add(line, line_cols)

    if cfg.approach == "both":
        fl_valid = np.asarray(out.fence_left_valid)
        fr_valid = np.asarray(out.fence_right_valid)
        fl_xyz, fl_rgb = flat_pts[fl_valid], flat_cols[fl_valid]
        fr_xyz, fr_rgb = flat_pts[fr_valid], flat_cols[fr_valid]
        fence_ply = PlyCloud(fl_xyz, fl_rgb, f"{output_name}_FENCE")
        fence_ply.add(fr_xyz, fr_rgb)
        fence_ply.save()

        combined.add(fl_xyz, fl_rgb)
        combined.add(fr_xyz, fr_rgb)
        if fl_xyz.shape[0] and fr_xyz.shape[0]:
            lmesh, lcols = art.plane_mesh(
                fl_xyz, np.asarray(out.fence_left_plane), cfg.fence.plane_left.axis,
                cfg.fence.plane_left.plane_color,
            )
            rmesh, rcols = art.plane_mesh(
                fr_xyz, np.asarray(out.fence_right_plane), cfg.fence.plane_right.axis,
                cfg.fence.plane_right.plane_color,
            )
            combined.add(lmesh, lcols)
            combined.add(rmesh, rcols)
        f2f_line, f2f_cols = art.measurement_line(
            np.asarray(out.left_pt_f2f), np.asarray(out.right_pt_f2f), [0, 255, 0]
        )
        combined.add(f2f_line, f2f_cols)
    combined.save()

    # ALL cloud with measurement lines (semantic_depth.py:433-438)
    all_ply = PlyCloud(flat_pts, flat_cols, f"{output_name}_ALL")
    if line_found:
        line, line_cols = art.measurement_line(
            np.asarray(out.left_pt_rw), np.asarray(out.right_pt_rw), [250, 0, 0]
        )
        all_ply.add(line, line_cols)
    if cfg.approach == "both":
        f2f_line, f2f_cols = art.measurement_line(
            np.asarray(out.left_pt_f2f), np.asarray(out.right_pt_f2f), [0, 255, 0]
        )
        all_ply.add(f2f_line, f2f_cols)
    all_ply.save()

    # annotated overlay (the headline output PNG)
    annotated = annotate_single(
        overlay_full,
        cfg.depth,
        is_city,
        cfg.approach,
        float(out.dist_rw),
        np.asarray(out.left_pt_rw),
        np.asarray(out.right_pt_rw),
        float(out.dist_f2f),
        np.asarray(out.left_pt_f2f),
        np.asarray(out.right_pt_f2f),
    )
    imwrite(f"{output_name}.png", annotated)
