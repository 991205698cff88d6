"""Space-to-depth convolution transforms for low-channel high-resolution
layers — the TPU MXU wants >=128 channels, but camera-resolution stems and
decoder tails run 3..32 channels over millions of pixels, wasting 4-40x of
the systolic array on lane padding (profiled: monodepth's 7x7 stem 45 ms and
its last two decoder levels 72 ms of a 140 ms batch-4 forward at 1024x2048).

The fix is an EXACT re-expression, not an approximation: a stride-1 kxk
convolution on the fine grid equals a stride-1 SxS convolution on the 2x2
space-to-depth grid whose kernel is a phase-indexed rearrangement of the
original (every product term is preserved; only the accumulation order
changes). Three variants cover the patterns in this codebase:

* fine-to-fine  (``s2d_conv``): fine k x k stride 1 -> coarse S x S whose
  input AND output are phase-major s2d tensors (S = 5 for k=7, 3 for k=3);
* fine-to-coarse (``s2d_conv`` with ``phase_out=False``): fine kxk stride 2
  -> coarse S x S stride 1 with a plain output — the second stem conv;
* coarse-to-fine (``upconv_s2d``): nearest-neighbor x2 upsample + fine kxk
  conv -> coarse S x S over the un-upsampled input, taps hitting the same
  source pixel summed (up(2i+d) reads x(floor((2i+d+t-o)/2))), s2d output.

Layout convention: ``space_to_depth`` packs channel (di*2+dj)*C + c =
fine[2i+di, 2j+dj, c] (phase-major). Kernel transforms are built with
einsums over 0/1 selection tensors — one tiny gather per step when weights
are jit arguments, constant-folded when they are literals. Borders: the
fine grid's zero padding maps exactly onto coarse zero padding
(out-of-support kernel entries are zeroed), so results equal the plain path
up to f32 summation order.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _one_hot_pack_kernel(c: int, r: int, dtype) -> jnp.ndarray:
    """(r, r, C, r*r*C) kernel with k[di, dj, ci, (di*r+dj)*C + ci] = 1 —
    a stride-r conv with it IS phase-major space_to_depth."""
    k = np.zeros((r, r, c, r * r * c), np.float32)
    for di in range(r):
        for dj in range(r):
            for ci in range(c):
                k[di, dj, ci, (di * r + dj) * c + ci] = 1.0
    return jnp.asarray(k, dtype)


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C), phase-major channels.

    On TPU this runs as a stride-r convolution with a one-hot kernel (exact:
    each output is one product by 1.0): XLA's conv unit extracts strided
    patches at memory speed, while the naive 6D reshape+transpose lowers to
    a sub-lane shuffle measured at ~12 GB/s effective on v5e (8.6 ms for a
    50 MB frame — 30x off memory bound)."""
    b, h, w, c = x.shape
    if h % r or w % r:
        # the TPU conv path (VALID stride-r) would silently TRUNCATE the
        # trailing rows/cols while the reshape path raises — fail the same
        # way on every backend
        raise ValueError(f"space_to_depth needs H, W % {r} == 0, got {h}x{w}")
    if jax.default_backend() == "tpu" and jnp.issubdtype(x.dtype, jnp.floating):
        return _space_to_depth_conv(x, r)
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def _space_to_depth_conv(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, _one_hot_pack_kernel(x.shape[-1], r, x.dtype), (r, r), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of space_to_depth (phase-major channels).

    On TPU this runs as the transposed one-hot convolution (lhs-dilated
    conv) for the same reason as ``space_to_depth``: the 6D transpose
    lowering is ~30x off memory bound."""
    b, hc, wc, cc = x.shape
    c = cc // (r * r)
    if cc % (r * r):
        raise ValueError(f"depth_to_space needs channels % {r * r} == 0, got {cc}")
    if jax.default_backend() == "tpu" and jnp.issubdtype(x.dtype, jnp.floating):
        return _depth_to_space_conv(x, r)
    x = x.reshape(b, hc, wc, r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hc * r, wc * r, c)


def _depth_to_space_conv(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    # out[b, r*i+di, r*j+dj, ci] = x[b, i, j, (di*r+dj)*C + ci]: the
    # gradient/transpose of the pack conv — lhs-dilate x by r and convolve
    # with the spatially-flipped pack kernel transposed on the channel axes.
    c = x.shape[-1] // (r * r)
    k = _one_hot_pack_kernel(c, r, x.dtype)  # (r, r, C, r2C)
    kt = k[::-1, ::-1].transpose(0, 1, 3, 2)  # (r, r, r2C, C)
    return jax.lax.conv_general_dilated(
        x, kt, (1, 1), [(r - 1, r - 1), (r - 1, r - 1)],
        lhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _sel_fine(k: int):
    """M[s, p, d, t] = 1 iff fine tap t of output phase d reads coarse
    offset smin+s at input phase p: fine index 2i+d+(t-o) = 2(i+smin+s)+p."""
    o = (k - 1) // 2
    taps = [(d, t) for d in range(2) for t in range(k)]
    lo = min((d + t - o - p) // 2 for d, t in taps for p in range(2)
             if (d + t - o - p) % 2 == 0)
    hi = max((d + t - o - p) // 2 for d, t in taps for p in range(2)
             if (d + t - o - p) % 2 == 0)
    S = hi - lo + 1
    M = np.zeros((S, 2, 2, k), np.float32)
    for d in range(2):
        for t in range(k):
            tau = d + t - o
            p = tau % 2
            s = (tau - p) // 2
            M[s - lo, p, d, t] = 1.0
    return M, lo, hi


def _sel_fine_s2(k: int):
    """Selection for a fine STRIDE-2 conv whose output is itself s2d-packed:
    output phase D at coarse-out index I reads fine index 4I + 2D + (t - o) =
    2(2I + sigma) + p, i.e. input-s2d offset sigma = (2D + t - o - p)/2 with
    the conv applied at stride 2 over the input s2d grid.
    M[sigma_idx, p, D, t]."""
    o = (k - 1) // 2
    entries = []
    for d in range(2):
        for t in range(k):
            tau = 2 * d + t - o
            p = tau % 2
            entries.append((d, t, p, (tau - p) // 2))
    lo = min(s for *_, s in entries)
    hi = max(s for *_, s in entries)
    S = hi - lo + 1
    M = np.zeros((S, 2, 2, k), np.float32)
    for d, t, p, s in entries:
        M[s - lo, p, d, t] = 1.0
    return M, lo, hi


def _sel_up(k: int):
    """M[s, d, t] = 1-count: fine tap t of output phase d reads coarse pixel
    i + floor((d + t - o)/2) of the un-upsampled input (NN x2 upsample)."""
    o = (k - 1) // 2
    idx = [(d, t, int(np.floor((d + t - o) / 2))) for d in range(2) for t in range(k)]
    lo = min(s for _, _, s in idx)
    hi = max(s for _, _, s in idx)
    S = hi - lo + 1
    M = np.zeros((S, 2, k), np.float32)
    for d, t, s in idx:
        M[s - lo, d, t] += 1.0
    return M, lo, hi


def _conv(x, kern, bias, pad_lr, stride=1):
    pad = pad_lr if isinstance(pad_lr, tuple) else (pad_lr, pad_lr)
    y = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (stride, stride), (pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def s2d_conv(segments, kernel, bias, k: int, phase_out: bool = True,
             stride: int = 1):
    """Fine-grid kxk conv evaluated on the s2d grid.

    segments: list of (tensor, fine_channels) — phase-major s2d tensors that
      concatenate into the conv input (fine conv sees sum(fine_channels)).
    kernel: (k, k, C_total, N) fine kernel; bias: (N,).
    phase_out=True,  stride=1: stride-1 fine conv, s2d output (..., 4N).
    phase_out=False, stride=1: stride-2 fine conv; the output grid IS the
      coarse grid (plain (..., N) channels).
    phase_out=True,  stride=2: stride-2 fine conv whose output is ITSELF
      s2d-packed — (coarse/2 grid, 4N channels). Keeps narrow-N stride-2
      layers (encoder downsamplers) at full MXU lanes; the consumer either
      continues in s2d space or depth_to_space's once.
    """
    if stride == 1:
        M, lo, hi = _sel_fine(k)
        conv_stride = 1
    elif stride == 2:
        if not phase_out:
            raise ValueError("stride=2 requires phase_out (else use the "
                             "phase_out=False stride-2-fine form)")
        M, lo, hi = _sel_fine_s2(k)
        conv_stride = 2
    else:
        raise ValueError(f"unsupported stride {stride}")
    Mj = jnp.asarray(M)
    c_sizes = [c for _, c in segments]
    kparts = jnp.split(kernel, np.cumsum(c_sizes)[:-1].tolist(), axis=2)
    transformed = []
    for kp in kparts:
        # axes: i(s_row) j(s_col) p q c x(d_row) y(d_col) n
        t = jnp.einsum("abcn,ipxa,jqyb->ijpqcxyn", kp, Mj, Mj)
        if not phase_out:
            t = t[:, :, :, :, :, :1, :1, :]
        S = t.shape[0]
        cseg, n = kp.shape[2], kp.shape[3]
        phases_out = t.shape[5] * t.shape[6]
        transformed.append(t.reshape(S, S, 4 * cseg, phases_out * n))
    kern = jnp.concatenate(transformed, axis=2)
    nphase = 4 if phase_out else 1
    x = segments[0][0] if len(segments) == 1 else jnp.concatenate(
        [s for s, _ in segments], axis=-1
    )
    if conv_stride == 1:
        assert -lo == hi, (k, lo, hi)  # symmetric for odd k at stride 1
    return _conv(x, kern, jnp.tile(bias, nphase), (-lo, hi), stride=conv_stride)


def upconv_s2d(x_coarse, kernel, bias, k: int = 3):
    """Nearest-neighbor x2 upsample + fine kxk conv as one coarse SxS conv
    over the un-upsampled input; phase-major s2d output (..., 4N)."""
    M, lo, hi = _sel_up(k)
    Mj = jnp.asarray(M)
    t = jnp.einsum("abcn,ixa,jyb->ijcxyn", kernel, Mj, Mj)
    S = t.shape[0]
    c, n = kernel.shape[2], kernel.shape[3]
    kern = t.reshape(S, S, c, 4 * n)
    assert -lo == hi, (k, lo, hi)
    return _conv(x_coarse, kern, jnp.tile(bias, 4), (hi, hi))


def replicate_phases(x_coarse: jnp.ndarray) -> jnp.ndarray:
    """NN x2 upsample expressed in s2d space: each coarse pixel's channels
    repeated across the 4 phases — space_to_depth(upsample_nn(x)) exactly."""
    return jnp.tile(x_coarse, (1, 1, 1, 4))
