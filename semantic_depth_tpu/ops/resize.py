"""Image resize as separable interpolation matmuls on the MXU.

The reference resizes every frame on the host with ``cv2.resize(...,
INTER_CUBIC)`` (semantic_depth.py:111-112) — 54.7% of its end-to-end wall
time (thesis Table 19). A fixed (src -> dst) resize is a linear map, so we
precompute sparse-in-structure interpolation matrices W_rows (dst_h, src_h)
and W_cols (dst_w, src_w) on the host once per shape pair and evaluate

    out[i, j, c] = sum_{k, l} W_rows[i, k] * img[k, l, c] * W_cols[j, l]

as two dense matmuls inside the jitted program: systolic-array work instead
of a host OpenCV call, and it fuses with the rest of the pipeline.

The cubic kernel matches OpenCV's (Catmull-Rom family with A = -0.75) and the
half-pixel source mapping src = (dst + 0.5) * scale - 0.5 with replicated
borders. OpenCV evaluates it in 11-bit fixed point, so agreement is to ~1e-3
in [0, 1] units (~0.3/255), not bit-exact.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_CUBIC_A = -0.75  # OpenCV INTER_CUBIC coefficient


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Cubic convolution kernel value at |t| (vectorized), A = -0.75."""
    a = _CUBIC_A
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w


@lru_cache(maxsize=64)
def _interp_matrix(src: int, dst: int, method: str) -> np.ndarray:
    """Dense (dst, src) interpolation matrix for one axis."""
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(x).astype(np.int64)
    frac = x - base
    mat = np.zeros((dst, src), dtype=np.float32)
    if method == "cubic":
        taps = range(-1, 3)
        weights = [_cubic_weights(frac - t) for t in taps]
    elif method == "linear":
        taps = range(0, 2)
        weights = [1.0 - frac, frac]
    elif method == "nearest":
        # OpenCV INTER_NEAREST uses floor(dst * scale) without the half-pixel
        # shift; reproduce that.
        idx = np.clip(np.floor(np.arange(dst) * scale).astype(np.int64), 0, src - 1)
        mat[np.arange(dst), idx] = 1.0
        return mat
    else:
        raise ValueError(f"unknown resize method: {method}")
    for t, w in zip(taps, weights):
        idx = np.clip(base + t, 0, src - 1)  # BORDER_REPLICATE
        np.add.at(mat, (np.arange(dst), idx), w.astype(np.float32))
    return mat


def resize(img: jnp.ndarray, out_hw, method: str = "cubic") -> jnp.ndarray:
    """Resize (H, W, C) or (H, W) image to ``out_hw`` = (H', W').

    Pure-JAX, static-shaped; the interpolation matrices are compile-time
    constants. f32 math regardless of input dtype; caller clips/casts.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    src_h, src_w, _ = img.shape
    if (out_h, out_w) == (src_h, src_w) and method in ("cubic", "linear"):
        # Scale 1 under the half-pixel mapping lands exactly on source
        # pixels (frac = 0 -> identity interpolation matrices), so the
        # matmuls are identity: skip them (the native full-res path
        # otherwise paid ~5 ms/frame multiplying by identity matrices).
        out = img.astype(jnp.float32)
        return out[:, :, 0] if squeeze else out
    wr = jnp.asarray(_interp_matrix(src_h, out_h, method))
    wc = jnp.asarray(_interp_matrix(src_w, out_w, method))
    x = img.astype(jnp.float32)
    c = x.shape[2]
    # HIGHEST precision: default matmul precision is bf16-grade, which costs
    # ~0.5 intensity levels of noise on 0..255 images.
    hi = jax.lax.Precision.HIGHEST
    # Both passes as clean (M, K) @ (K, N) matmuls — keeping the size-C
    # channel axis out of the contraction minor dims (a trailing dim of 3
    # forces 128-lane tile padding and ~40x wasted MXU work).
    # rows: (out_h, src_h) @ (src_h, src_w * C)
    x = jnp.dot(wr, x.reshape(src_h, src_w * c), precision=hi,
                preferred_element_type=jnp.float32)
    # cols: (out_h * C, src_w) @ (src_w, out_w)
    x = x.reshape(out_h, src_w, c).transpose(0, 2, 1).reshape(out_h * c, src_w)
    x = jnp.dot(x, wc.T, precision=hi, preferred_element_type=jnp.float32)
    x = x.reshape(out_h, c, out_w).transpose(0, 2, 1)
    if squeeze:
        x = x[:, :, 0]
    return x


def resize_clip_u8(img: jnp.ndarray, out_hw, method: str = "cubic") -> jnp.ndarray:
    """Resize and round/clip back to uint8 range (kept as f32), matching what
    cv2.resize does to uint8 frames."""
    out = resize(img, out_hw, method)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def resize_np(img: np.ndarray, out_hw, method: str = "cubic") -> np.ndarray:
    """Host-side numpy twin of ``resize``: the same interpolation matrices
    applied with f32 tensordots on the CPU.

    Data loaders must use this (or ``resize_clip_u8_np``): calling the jitted
    ``resize`` under a TPU-default backend round-trips every single image
    through the device — measured at ~0.9 s/step on the dev relay, 10x the
    actual train step."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze = img.ndim == 2
    x = img.astype(np.float32)
    if squeeze:
        x = x[:, :, None]
    src_h, src_w, _ = x.shape
    if (out_h, out_w) == (src_h, src_w):
        out = x
    else:
        wr = _interp_matrix(src_h, out_h, method)
        wc = _interp_matrix(src_w, out_w, method)
        out = np.tensordot(wr, x, axes=([1], [0]))  # (out_h, src_w, C)
        out = np.tensordot(out, wc, axes=([1], [1]))  # (out_h, C, out_w)
        out = np.moveaxis(out, 2, 1)
    return out[:, :, 0] if squeeze else out


def resize_clip_u8_np(img: np.ndarray, out_hw, method: str = "cubic") -> np.ndarray:
    """Host twin of ``resize_clip_u8`` (f32 values on the uint8 grid)."""
    return np.clip(np.round(resize_np(img, out_hw, method)), 0.0, 255.0)
