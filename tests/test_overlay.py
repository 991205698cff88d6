"""On-device overlay blend vs actual PIL paste semantics (the reference
composed overlays with scipy.misc.toimage + PIL paste, semantic_depth.py:
548-569)."""

import numpy as np
from PIL import Image

import jax.numpy as jnp

from semantic_depth_tpu.ops.overlay import rgb_to_gray, segmentation_overlay


def pil_reference_overlay(frame, road_mask, fence_mask, road_rgba, fence_rgba):
    """The reference's exact composition: build an RGBA mask image per class
    and paste it with itself as the mask."""
    im = Image.fromarray(frame.astype(np.uint8))
    for mask, rgba in ((road_mask, road_rgba), (fence_mask, fence_rgba)):
        layer = np.zeros((*mask.shape, 4), np.uint8)
        layer[mask] = rgba
        layer_im = Image.fromarray(layer, mode="RGBA")
        im.paste(layer_im, box=None, mask=layer_im)
    return np.asarray(im)


def test_overlay_matches_pil_paste():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(48, 96, 3)).astype(np.uint8)
    # heavy masks so road∧fence overlap pixels (where PIL's per-paste uint8
    # rounding matters — the second paste reads the first paste's INTEGER
    # result) are well represented
    road = rng.uniform(size=(48, 96)) < 0.5
    fence = rng.uniform(size=(48, 96)) < 0.5
    assert (road & fence).sum() > 500
    road_rgba = (128, 64, 128, 64)
    fence_rgba = (160, 10, 10, 64)

    want = pil_reference_overlay(frame, road, fence, road_rgba, fence_rgba)
    got = np.asarray(
        segmentation_overlay(
            jnp.asarray(frame, jnp.float32), jnp.asarray(road), jnp.asarray(fence),
            road_rgba, fence_rgba,
        )
    )
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_rgb_to_gray_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(32, 64, 3)).astype(np.uint8)
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    got = np.asarray(rgb_to_gray(jnp.asarray(rgb, jnp.float32)))
    assert np.abs(got - want.astype(np.float32)).max() <= 1
