"""Horizontal bilinear warp sampler (monodepth's bilinear_sampler_1d_h).

The reference trains monodepth by warping the right image into the left view
with the predicted disparity (upstream bilinear_sampler.py, vendored but
absent in-tree; wrap_mode='border' per semantic_depth.py:617). The sampler
only displaces along x:

    out[b, y, x] = I[b, y, x - d[b, y, x] * W]   (disparity in [0,1] units
                                                  scaled by image width)

TPU-native formulation: instead of flattening to a 1D gather with computed
indices (the TF implementation), we keep the (B, H, W) structure and use
``jnp.take_along_axis`` on the W axis — XLA lowers this to an efficient
per-row gather, and everything fuses with the surrounding loss graph.
Border handling clamps sample coordinates to [0, W-1] ('border' mode).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_x(img: jnp.ndarray, x_offset: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at x' = x + x_offset * W (monodepth scales the
    normalized offset by image width). img: (B, H, W, C); x_offset:
    (B, H, W) normalized (positive samples to the right). Returns
    (B, H, W, C)."""
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    sample_x = xs + x_offset * jnp.float32(w)
    sample_x = jnp.clip(sample_x, 0.0, w - 1.0)  # border wrap mode
    x0 = jnp.floor(sample_x)
    frac = sample_x - x0
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    # gather along W for each channel
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
