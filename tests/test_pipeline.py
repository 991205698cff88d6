"""Pipeline tests: analytic road-width recovery on a synthetic scene, and a
full fused-program smoke test with width-scaled networks."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from semantic_depth_tpu import camera as camera_lib
from semantic_depth_tpu import pipeline as pl
from semantic_depth_tpu.config import (
    CAMERA_MUNICH,
    PipelineConfig,
    munich_pipeline_config,
)
from semantic_depth_tpu.models import FCN8s, Monodepth
from semantic_depth_tpu.ops import pcl


def synthetic_road_scene(cam, h=256, w=512, road_halfwidth=4.0, cam_height=1.5):
    """Disparity map + road mask for a flat ground plane y = -cam_height.

    Ground rows (below the principal point) get the disparity consistent with
    the plane; the road mask covers |X| < road_halfwidth. Analytic road width
    at any visible depth is 2 * road_halfwidth (up to one pixel footprint).
    """
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    # Y = (cy - y) * b / d == -cam_height  =>  d = (y - cy) * b / cam_height
    d = np.broadcast_to((ys - cam.cy) * cam.baseline / cam_height, (h, w)).copy()
    # A perfectly planar cloud has MAD == 0, which (faithfully to the
    # reference's nan-penalty semantics) removes every point — add realistic
    # sub-pixel disparity noise so the denoise chain behaves as on real data.
    rng = np.random.default_rng(0)
    d = d * (1.0 + rng.normal(0.0, 1e-3, size=d.shape))
    ground = d > 1e-3
    d = np.where(ground, d, 1e-3)
    # X = (x - cx) * b / d
    X = (xs - cam.cx) * cam.baseline / d
    road_mask = ground & (np.abs(X) < road_halfwidth)
    return d.astype(np.float32), road_mask


def test_geometry_chain_recovers_analytic_width():
    cfg = munich_pipeline_config()
    cam = CAMERA_MUNICH
    disp, road_mask = synthetic_road_scene(cam, road_halfwidth=4.0)
    pts = camera_lib.reproject_disparity(jnp.asarray(disp), cam)
    colors = jnp.zeros_like(pts)
    cloud = pcl.from_dense(pts, colors, jnp.asarray(road_mask))
    road, road_plane = pl._denoise_road(cloud, cfg)
    depth_rw = cfg.depth - cfg.rw_depth_offset
    left, right, found = pcl.road_endpoints(road, depth_rw, cfg.rw_slab_halfwidth)
    assert bool(found)
    width = float(jnp.abs(left[0] - right[0]))
    # pixel footprint at ~10 m with f=380 is ~2.6 cm; allow 2 pixels
    assert width == pytest.approx(8.0, abs=0.06)
    # the fitted road plane should be y = -1.5: coeffs ~ (0, -1, 0, -1.5)
    plane = np.asarray(road_plane)
    np.testing.assert_allclose(plane, [0.0, -1.0, 0.0, -1.5], atol=1e-2)


def tiny_pipeline(approach="both"):
    import jax

    cfg = munich_pipeline_config(
        input_height=128,
        input_width=256,
        approach=approach,
        road=dataclasses.replace(munich_pipeline_config().road, neighbor_capacity=2048),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    x = jnp.zeros((1, 128, 256, 3), jnp.float32)
    fcn_params = fcn.init(jax.random.PRNGKey(0), x)
    mono_params = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3), jnp.float32))
    return pl.SemanticDepthPipeline(cfg, fcn_params, mono_params, fcn=fcn, mono=mono)


def test_full_pipeline_smoke():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(384, 768, 3)).astype(np.float32)
    pipe = tiny_pipeline()
    out = pipe.process_frame(frame)
    assert out.disparity.shape == (128, 256)
    assert out.points3d.shape == (128, 256, 3)
    assert out.overlay_small.shape == (128, 256, 3)
    ov = np.asarray(out.overlay_small)
    assert ov.min() >= 0 and ov.max() <= 255
    assert out.road_mask.dtype == bool
    # scalars must materialize without error (values may be nan on noise input)
    float(out.dist_rw)
    float(out.dist_f2f)
    # disparity multiplier defaulted to original width
    assert np.asarray(out.disparity).max() <= 0.3 * 768 + 1e-3


def test_pipeline_focal_and_mult_are_traced_not_static():
    frame = np.zeros((256, 512, 3), np.float32)
    pipe = tiny_pipeline(approach="rw")
    pipe.process_frame(frame, focal=380.0)
    n0 = pipe._process._cache_size()
    pipe.process_frame(frame, focal=580.0, disparity_mult=3800.0)
    assert pipe._process._cache_size() == n0  # no recompile across the sweep


def test_flip_average_off_single_forward():
    """flip_average=False (config.MonodepthConfig doc — the native mode's
    single-forward disparity) must yield the un-blended left disparity,
    identically between the single and batch paths."""
    import jax

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(2, 128, 256, 3)).astype(np.float32)
    base = tiny_pipeline(approach="rw")
    cfg = dataclasses.replace(
        base.config,
        monodepth=dataclasses.replace(base.config.monodepth, flip_average=False),
    )
    pipe = pl.SemanticDepthPipeline(
        cfg, base.fcn_params, base.mono_params, fcn=base.fcn, mono=base.mono
    )
    out_b = pipe.process_batch(frames)
    out_s = pipe.process_frame(frames[0])
    np.testing.assert_allclose(
        np.asarray(out_b.disparity[0]), np.asarray(out_s.disparity),
        rtol=1e-5, atol=1e-5,
    )
    # equals the raw net output times one scalar (the disparity multiplier
    # chain) — i.e. NO spatial blending happened
    norm = jnp.asarray(frames[0] / 255.0, jnp.float32)
    raw = np.asarray(
        base.mono.apply(base.mono_params, norm[None], method=base.mono.disp_left)[0]
    )
    got = np.asarray(out_s.disparity)
    ratio = got / np.maximum(raw, 1e-9)
    np.testing.assert_allclose(ratio, ratio.flat[0], rtol=1e-4)


def test_process_batch_matches_single():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 256, 512, 3)).astype(np.float32)
    pipe = tiny_pipeline(approach="rw")
    single = [pipe.process_frame(frames[i]) for i in range(2)]
    batched = pipe.process_batch(frames)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(batched.disparity[i]), np.asarray(single[i].disparity),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(batched.road_mask[i]), np.asarray(single[i].road_mask)
        )
        a, b = float(batched.dist_rw[i]), float(single[i].dist_rw)
        assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(b, rel=1e-5)


def test_export_roundtrip(tmp_path):
    """AOT export (frozen-graph equivalent): serialized pipeline must produce
    the same scalars without model code."""
    from semantic_depth_tpu.export import export_pipeline, load_pipeline

    pipe = tiny_pipeline(approach="rw")
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(256, 512, 3)).astype(np.float32)

    path = export_pipeline(pipe, str(tmp_path / "pipeline.shlo"),
                           frame_shape=(256, 512, 3))
    call = load_pipeline(path)
    got = call(jnp.asarray(frame), jnp.float32(380.0), jnp.float32(512.0))
    want = pipe.process_frame(frame, focal=380.0, disparity_mult=512.0)
    a, b = float(got[0]), float(want.dist_rw)
    assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(b, rel=1e-6)
    assert bool(got[2]) == bool(want.rw_found)


def test_export_roundtrip_native(tmp_path):
    """The native input_s2d architecture exports/reloads through the same
    StableHLO serving path (frozen-graph equivalent) as the reference nets."""
    import jax

    from semantic_depth_tpu.export import export_pipeline, load_pipeline

    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        input_height=256, input_width=512, approach="rw",
        road=dataclasses.replace(base.road, neighbor_capacity=2048),
    )
    cfg = dataclasses.replace(
        cfg, monodepth=dataclasses.replace(cfg.monodepth, flip_average=False)
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32, input_s2d=True)
    mono = Monodepth(encoder="vgg", width_mult=0.0625, input_s2d=True)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3), jnp.float32))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 256, 512, 3), jnp.float32))
    pipe = pl.SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(256, 512, 3)).astype(np.float32)
    path = export_pipeline(pipe, str(tmp_path / "native.shlo"),
                           frame_shape=(256, 512, 3))
    call = load_pipeline(path)
    got = call(jnp.asarray(frame), jnp.float32(380.0), jnp.float32(512.0))
    want = pipe.process_frame(frame, focal=380.0, disparity_mult=512.0)
    a, b = float(got[0]), float(want.dist_rw)
    assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(b, rel=1e-6)


def test_pipeline_resnet50_encoder():
    """Pipeline with the monodepth resnet50 encoder variant (reference
    --monodepth_encoder=resnet50, semantic_depth.py:721-722)."""
    import jax

    cfg = munich_pipeline_config(
        input_height=128, input_width=256, approach="rw",
        road=dataclasses.replace(munich_pipeline_config().road, neighbor_capacity=2048),
        monodepth=dataclasses.replace(munich_pipeline_config().monodepth, encoder="resnet50"),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="resnet50", width_mult=0.0625)
    fcn_params = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)))
    mono_params = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3)))
    pipe = pl.SemanticDepthPipeline(cfg, fcn_params, mono_params, fcn=fcn, mono=mono)
    frame = np.random.default_rng(0).integers(0, 256, (256, 512, 3)).astype(np.uint8)
    out = pipe.process_frame(frame)
    assert out.disparity.shape == (128, 256)
    float(out.dist_rw)


def test_pipeline_is_deterministic():
    """Same frame -> bit-identical outputs across calls (no hidden state)."""
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, size=(256, 512, 3)).astype(np.uint8)
    pipe = tiny_pipeline(approach="rw")
    a = pipe.process_frame(frame)
    b = pipe.process_frame(frame)
    np.testing.assert_array_equal(np.asarray(a.disparity), np.asarray(b.disparity))
    np.testing.assert_array_equal(np.asarray(a.road_mask), np.asarray(b.road_mask))
    np.testing.assert_array_equal(
        np.asarray(a.road_cloud.valid), np.asarray(b.road_cloud.valid)
    )


def test_staged_matches_fused():
    """process_frame_staged (per-stage host-sync profiling mode) must produce
    the same results as the fused program — guards the two implementations
    against drifting apart (e.g. the resolution-dependent camera/disparity
    scaling must be applied identically in both)."""
    pipe = tiny_pipeline()
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(256, 512, 3)).astype(np.float32)

    fused = pipe.process_frame(frame)
    staged, times = pipe.process_frame_staged(frame)

    np.testing.assert_allclose(
        np.asarray(staged.disparity), np.asarray(fused.disparity),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(staged.road_mask), np.asarray(fused.road_mask)
    )
    for name in ("dist_rw", "dist_f2f"):
        a = float(getattr(fused, name))
        b = float(getattr(staged, name))
        assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(b, rel=1e-4), name
    assert set(times) >= {"read", "semantic", "disparity", "to3D", "road", "rw"}


def test_uint8_frames_match_f32():
    """The CLIs ship raw uint8 camera payloads (4x less host->device traffic);
    the device-side cast must make results identical to f32 feeds."""
    rng = np.random.default_rng(9)
    frame_u8 = rng.integers(0, 256, size=(256, 512, 3), dtype=np.uint8)
    pipe = tiny_pipeline(approach="rw")
    a = pipe.process_frame(frame_u8)
    b = pipe.process_frame(frame_u8.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(a.disparity), np.asarray(b.disparity))
    np.testing.assert_array_equal(np.asarray(a.road_mask), np.asarray(b.road_mask))
    fa, fb = float(a.dist_rw), float(b.dist_rw)
    assert (np.isnan(fa) and np.isnan(fb)) or fa == fb
    ba = pipe.process_batch(frame_u8[None])
    bb = pipe.process_batch(frame_u8[None].astype(np.float32))
    np.testing.assert_array_equal(np.asarray(ba.disparity), np.asarray(bb.disparity))


# ---------------------------------------------------------------------------
# rw_estimator='plane_edge' (the native mode's robust width estimator)
# ---------------------------------------------------------------------------


def test_plane_edge_geometry_chain_beats_slab_minmax():
    """On the noisy synthetic ground plane, the plane_edge estimator must
    recover the analytic 8 m width tighter than the reference slab_minmax
    extreme (which eats the disparity noise at the slab's min/max points)."""
    cfg = munich_pipeline_config()
    cam = CAMERA_MUNICH
    disp, road_mask = synthetic_road_scene(cam, road_halfwidth=4.0)
    pts = camera_lib.reproject_disparity(jnp.asarray(disp), cam)
    colors = jnp.zeros_like(pts)
    cloud = pcl.from_dense(pts, colors, jnp.asarray(road_mask))
    road, road_plane = pl._denoise_road(cloud, cfg, grid_hw=disp.shape)

    cfg_pe = dataclasses.replace(cfg, rw_estimator="plane_edge")
    left, right, found, width = pl._road_width(cfg_pe, road, road_plane, cam)
    assert bool(found)
    # slab_minmax tolerance in test_geometry_chain_recovers_analytic_width is
    # 6 cm; the ray-plane-projected estimator should land within ~1.5 cm
    assert float(width) == pytest.approx(8.0, abs=0.015)
    # endpoints lie ON the fitted plane (y = -1.5) within the measured-z slab
    np.testing.assert_allclose(float(left[1]), -1.5, atol=0.02)
    assert abs(float(left[2]) + (cfg.depth - cfg.rw_depth_offset)) \
        <= cfg.rw_slab_halfwidth + 0.02


def test_plane_edge_fused_staged_and_batched_agree():
    """staged == fused == batched under rw_estimator='plane_edge' (the shared
    _road_width definition must be wired identically into all three paths)."""
    import jax

    base = tiny_pipeline(approach="rw")
    cfg = dataclasses.replace(base.config, rw_estimator="plane_edge")
    pipe = pl.SemanticDepthPipeline(
        cfg, base.fcn_params, base.mono_params, fcn=base.fcn, mono=base.mono
    )
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, size=(256, 512, 3)).astype(np.float32)

    fused = pipe.process_frame(frame)
    staged, _ = pipe.process_frame_staged(frame)
    batched = pipe.process_batch(np.stack([frame, frame]))

    a = float(fused.dist_rw)
    b = float(staged.dist_rw)
    c0, c1 = np.asarray(batched.dist_rw)
    for other in (b, c0, c1):
        assert (np.isnan(a) and np.isnan(other)) or a == pytest.approx(
            float(other), rel=1e-4
        )


def test_rw_estimator_unknown_rejected():
    base = tiny_pipeline(approach="rw")
    cfg = dataclasses.replace(base.config, rw_estimator="nope")
    pipe = pl.SemanticDepthPipeline(
        cfg, base.fcn_params, base.mono_params, fcn=base.fcn, mono=base.mono
    )
    with pytest.raises(ValueError, match="rw_estimator"):
        pipe.process_frame(np.zeros((256, 512, 3), np.float32))
