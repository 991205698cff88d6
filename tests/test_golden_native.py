"""Golden regression for the NATIVE full-res architecture (input_s2d
trunks + single-forward disparity — DESIGN.md 4c).

Freezes one fixed-seed tiny-net run at grid 256x512 (packed trunks see
128x256): disparity bytes, mask bits, overlay pixels, and the output
scalars. Any drift in the s2d conv-form lowerings, the phase decoders, the
level-0 head, or the flip-free disparity path fails here.

Regenerate deliberately with:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden_native.py -q
"""

import dataclasses
import hashlib
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "native_golden.json")


def _sha(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _run():
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline
    from semantic_depth_tpu.utils.make_mockup import _scene

    base = munich_pipeline_config()
    # Threshold/depth/z-window are tuned so the RANDOM-init tiny nets drive
    # the full geometry chain to a FINITE width (rw_found=True): a random
    # 3-class softmax needs threshold < 1/3 to produce a road mask, and the
    # random mono net's disparity (~75-82) maps to ~4.6-5.1 m depth, so the
    # target slab and the z-window cut must sit in that range. Without this
    # the dist_rw golden pins NaN and the post-disparity chain is unpinned.
    cfg = munich_pipeline_config(
        input_height=256, input_width=512, approach="rw",
        road=dataclasses.replace(
            base.road, neighbor_capacity=2048, z_keep_beyond=4.0
        ),
        depth=4.85,
    )
    cfg = dataclasses.replace(
        cfg,
        monodepth=dataclasses.replace(cfg.monodepth, flip_average=False),
        segmenter=dataclasses.replace(cfg.segmenter, threshold=0.3),
    )
    fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32, input_s2d=True)
    mono = Monodepth(encoder="vgg", width_mult=0.0625, input_s2d=True)
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3), jnp.float32))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 256, 512, 3), jnp.float32))
    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

    frame, _ = _scene(np.random.default_rng(0), 256, 512)
    out = pipe.process_batch(frame.astype(np.float32)[None])

    record = {
        "dist_rw": np.asarray(out.dist_rw, np.float64).reshape(-1).tolist(),
        "rw_found": bool(np.asarray(out.rw_found)[0]),
        "disparity_sha256": _sha(np.asarray(out.disparity, np.float32).tobytes()),
        "masks_sha256": _sha(
            np.packbits(np.asarray(out.road_mask)).tobytes()
            + np.packbits(np.asarray(out.fence_mask)).tobytes()
        ),
        "overlay_sha256": _sha(
            np.clip(np.asarray(out.overlay_small), 0, 255).astype(np.uint8).tobytes()
        ),
        "disparity_shape": list(np.asarray(out.disparity).shape),
    }
    return record


def test_golden_native():
    record = _run()
    assert record["disparity_shape"] == [1, 256, 512]  # full grid, not packed
    # the golden must pin a SUCCESSFUL geometry chain, not a NaN one
    assert record["rw_found"] is True
    assert np.isfinite(record["dist_rw"]).all()

    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        if os.environ.get("GOLDEN_REGEN") != "1":
            raise AssertionError(
                "native golden was missing; regenerated — rerun the test"
            )
        return

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    for k in ("disparity_sha256", "masks_sha256", "overlay_sha256", "rw_found",
              "disparity_shape"):
        assert record[k] == golden[k], k
    np.testing.assert_allclose(
        np.asarray(record["dist_rw"]), np.asarray(golden["dist_rw"]),
        rtol=1e-6, equal_nan=True,
    )
