"""Horizontal bilinear warp sampler (monodepth's bilinear_sampler_1d_h).

The reference trains monodepth by warping the right image into the left view
with the predicted disparity (upstream bilinear_sampler.py, vendored but
absent in-tree — monodepth_lib/README.md:3; wrap_mode='border' per the
monodepth_parameters surface, semantic_depth.py:617). The sampler only
displaces along x:

    out[b, y, x] = I[b, y, x + d[b, y, x] * W]   (offset in width-normalized
                                                  units, scaled by W)

Published 'border' semantics (transcribed from the upstream _interpolate):
the image is padded with a ONE-PIXEL ZERO border (`tf.pad(..., 'CONSTANT')`
with edge_size 1), sample coordinates shift by +1 into the padded frame and
are clipped to [0, (W-1) + 2*edge_size]; x1 = min(x0 + 1, W+1) while the
left weight stays x1_f - x with the un-clipped x1_f = x0_f + 1. So samples
just past the border blend toward ZERO, and samples beyond the pad are fully
zero — NOT clamp-to-edge ('edge' mode, edge_size 0, is the clamping one).
tests/test_weights.py pins this against a live-TF transcription.

TPU-native formulation: instead of flattening to a 1D gather with computed
flat indices (the TF implementation), we keep the (B, H, W) structure and use
``jnp.take_along_axis`` on the W axis — XLA lowers this to an efficient
per-row gather, and everything fuses with the surrounding loss graph.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_x(
    img: jnp.ndarray, x_offset: jnp.ndarray, wrap_mode: str = "border"
) -> jnp.ndarray:
    """Sample ``img`` at x' = x + x_offset * W (monodepth scales the
    normalized offset by image width). img: (B, H, W, C); x_offset:
    (B, H, W) normalized (positive samples to the right). Returns
    (B, H, W, C)."""
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    sample_x = xs + x_offset * jnp.float32(w)
    if wrap_mode == "border":
        edge = 1
        img = jnp.pad(img, ((0, 0), (0, 0), (edge, edge), (0, 0)))
        sample_x = sample_x + edge
        wp = w + 2 * edge  # padded width
        sample_x = jnp.clip(sample_x, 0.0, float(w - 1 + 2 * edge))
    elif wrap_mode == "edge":
        wp = w
        sample_x = jnp.clip(sample_x, 0.0, float(w - 1))
    else:
        raise ValueError(f"unknown wrap_mode {wrap_mode!r}")
    x0 = jnp.floor(sample_x)
    frac = sample_x - x0  # == x - x0_f; left weight = x1_f - x = 1 - frac
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, wp - 1)

    def take(idx):
        return jnp.take_along_axis(img, idx[..., None].astype(jnp.int32), axis=2)

    left = take(x0i)
    right = take(x1i)
    return left * (1.0 - frac)[..., None] + right * frac[..., None]


def warp_right_to_left(right_img: jnp.ndarray, left_disp: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the left view: sample the right image at x - d_L(x)."""
    return bilinear_sample_x(right_img, -left_disp)


def warp_left_to_right(left_img: jnp.ndarray, right_disp: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the right view: sample the left image at x + d_R(x)."""
    return bilinear_sample_x(left_img, right_disp)
