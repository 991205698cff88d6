"""Golden end-to-end regression (VERDICT r1 item 7).

One frozen synthetic-scene run through the fused pipeline with fixed-seed
tiny nets: scalars pinned to 1e-6 and artifact bytes (PLY text, distances.txt,
overlay pixel buffer) pinned by sha256. Any silent numeric or format drift —
a refactor, a jax/XLA upgrade, a writer change — fails this test.

Regenerate deliberately after an *intended* change with:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden_e2e.py -q

and commit the updated tests/golden/e2e_golden.json with a justification.
Reference output inventory this freezes: semantic_depth.py:339-458.
"""

import dataclasses
import hashlib
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "e2e_golden.json")

SCALARS = (
    "dist_rw",
    "dist_f2f",
    "left_pt_rw",
    "right_pt_rw",
    "left_pt_f2f",
    "right_pt_f2f",
    "road_plane",
)


def _sha(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _run(tmp_path):
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.io import artifacts, ply
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline
    from semantic_depth_tpu.utils.make_mockup import _scene

    base = munich_pipeline_config()
    cfg = munich_pipeline_config(
        input_height=128, input_width=256, approach="both",
        road=dataclasses.replace(base.road, neighbor_capacity=2048),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    mono = Monodepth(encoder="vgg", width_mult=0.0625)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3), jnp.float32))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3), jnp.float32))
    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    frame, _ = _scene(np.random.default_rng(0), 256, 512)
    out = pipe.process_frame(frame.astype(np.float32))

    record = {}
    for name in SCALARS:
        record[name] = np.asarray(getattr(out, name), np.float64).reshape(-1).tolist()
    record["rw_found"] = bool(np.asarray(out.rw_found))

    # artifact bytes: road-cloud PLY (our deterministic ASCII writer),
    # distances.txt, and the overlay pixel buffer (pixels, not PNG container,
    # so the hash is image-encoder-version independent)
    cloud = out.road_cloud
    m = np.asarray(cloud.valid)
    ply_path = ply.write_ply(
        np.asarray(cloud.xyz)[m], np.asarray(cloud.rgb)[m], str(tmp_path / "road")
    )
    with open(ply_path, "rb") as f:
        record["ply_sha256"] = _sha(f.read())
    dist_path = artifacts.write_distances(
        str(tmp_path / "g"), float(out.dist_rw), float(out.dist_f2f)
    )
    with open(dist_path, "rb") as f:
        record["distances_sha256"] = _sha(f.read())
    overlay_u8 = np.clip(np.asarray(out.overlay_small), 0, 255).astype(np.uint8)
    record["overlay_sha256"] = _sha(overlay_u8.tobytes())
    record["masks_sha256"] = _sha(
        np.packbits(np.asarray(out.road_mask)).tobytes()
        + np.packbits(np.asarray(out.fence_mask)).tobytes()
    )
    # pins monodepth forward + flip-average + resize exactly (f32 bytes)
    record["disparity_sha256"] = _sha(
        np.asarray(out.disparity, np.float32).tobytes()
    )

    # Second record: the full geometry chain driven by the analytic
    # fence-scene (networks bypassed) so the frozen dist_rw/dist_f2f are real
    # numbers, not NaN (random-weight nets legitimately find no road).
    import test_chain_equivalence as tce

    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu import pipeline as pl
    from semantic_depth_tpu.config import CAMERA_MUNICH
    from semantic_depth_tpu.ops import pcl

    gcfg = munich_pipeline_config(
        road=dataclasses.replace(base.road, stat_nb_neighbors=2, stat_std_ratio=1e9,
                                 radius_nb_points=0, radius=1e9)
    )
    disp, road_mask, fence_mask = tce.synthetic_scene_with_fences(CAMERA_MUNICH)
    pts = camera_lib.reproject_disparity(jnp.asarray(disp), CAMERA_MUNICH)
    road = pcl.from_dense(pts, jnp.zeros_like(pts), jnp.asarray(road_mask))
    road, road_plane = pl._denoise_road(road, gcfg, grid_hw=(256, 512))
    left, right, found = pcl.road_endpoints(
        road, gcfg.depth - gcfg.rw_depth_offset, gcfg.rw_slab_halfwidth
    )
    fence = pcl.from_dense(pts, jnp.zeros_like(pts), jnp.asarray(fence_mask))
    *_, g_f2f = pl._fence_f2f(fence, road_plane, gcfg)
    record["geom_rw_found"] = bool(found)
    record["geom_dist_rw"] = float(jnp.abs(left[0] - right[0]))
    record["geom_dist_f2f"] = float(g_f2f)
    record["geom_road_plane"] = np.asarray(road_plane, np.float64).tolist()
    return record


def test_golden_end_to_end(tmp_path):
    record = _run(tmp_path)

    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}; commit it")

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)

    assert record["rw_found"] == golden["rw_found"]
    assert record["geom_rw_found"] == golden["geom_rw_found"]
    for name in SCALARS:
        np.testing.assert_allclose(
            np.asarray(record[name]), np.asarray(golden[name]),
            rtol=0, atol=1e-6, err_msg=f"scalar drift in {name}",
        )
    for name in ("geom_dist_rw", "geom_dist_f2f", "geom_road_plane"):
        np.testing.assert_allclose(
            np.asarray(record[name]), np.asarray(golden[name]),
            rtol=0, atol=1e-6, err_msg=f"scalar drift in {name}",
        )
    for key in (
        "ply_sha256", "distances_sha256", "overlay_sha256", "masks_sha256",
        "disparity_sha256",
    ):
        assert record[key] == golden[key], f"artifact drift: {key}"
