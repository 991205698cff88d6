"""Pallas TPU kernel: 3x3 stride-1 SAME convolution for NARROW channel
counts (C, N <= 128) at camera resolutions — the FCN-8s blocks 1-2 regime.

Why: XLA lowers a 64->64 3x3 conv as 9 (or 3) accumulated matmuls whose
contraction is only C=64 — half the MXU's 128-deep contraction idle, and
N=64 output channels leave half the lanes idle too; measured ~23 TF/s on
v5e against a ~107 TF/s sustained matmul ceiling (DESIGN.md / profile
notes). This kernel rebuilds the conv as an IM2COL matmul per kernel-row:
each row tile gathers its 3 column shifts into a (tile_h*W, 3C) VMEM
operand and runs 3 accumulated (tile_h*W, 3C) x (3C, N) dots — contraction
3C=192 fills the MXU depth (75% vs 50%), M is thousands of pixels, and the
elementwise tail (bias + ReLU + cast) fuses into the same kernel instead of
round-tripping HBM.

Layout: NHWC bf16 in/out, f32 accumulation (preferred_element_type).
The caller pre-pads H and W by 1 (SAME halo) in XLA; each grid program
DMAs its (tile_h + 2)-row slab from HBM into VMEM scratch (the whole padded
image does not fit VMEM at 1024x2048; same streaming idiom as
pallas_knn._knn_kernel_hbm).

Exactness: identical math to the XLA conv up to f32 accumulation order
(tests pin bf16 outputs to the XLA path's within ~1e-2 relative, and f32
inputs exactly on CPU interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_ref, k_ref, b_ref, out_ref, x_vmem, sem, *, tile_h: int,
                    w: int, c: int, n: int, relu: bool, slab_rows: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    row0 = ti * tile_h  # top of this tile in padded coordinates

    cp = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(row0, slab_rows), :, :], x_vmem, sem
    )
    cp.start()
    cp.wait()

    acc = jnp.zeros((tile_h * w, n), jnp.float32)
    for r in range(3):  # kernel row
        # column shifts dx = 0..2 concatenated on the channel axis ->
        # (tile_h, w, 3C); collapse leading dims for the matmul
        shifts = [x_vmem[r : r + tile_h, dx : dx + w, :] for dx in range(3)]
        patch = jnp.concatenate(shifts, axis=-1).reshape(tile_h * w, 3 * c)
        acc = acc + jax.lax.dot_general(
            patch, k_ref[r],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(tile_h, w, n).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "tile_h"))
def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                 relu: bool = True, tile_h: int = 8) -> jnp.ndarray:
    """y = conv2d(x, kernel, SAME, stride 1) + bias [, ReLU].

    x: (B, H, W, C) bf16/f32; kernel: (3, 3, C, N); bias: (N,).
    H must be a multiple of tile_h. Returns (B, H, W, N) in x.dtype.
    """
    b, h, w, c = x.shape
    kh, kw, kc, n = kernel.shape
    assert (kh, kw) == (3, 3) and kc == c, (kernel.shape, x.shape)
    if h % tile_h:
        raise ValueError(f"H={h} must be a multiple of tile_h={tile_h}")

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (3, 3C, N): kernel[r, dx, c, n] -> K_r[dx*C + c, n] matches the
    # concat-over-dx im2col channel order
    kmat = kernel.reshape(3, 3 * c, n).astype(x.dtype)
    bias2d = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (1, n))

    slab_rows = tile_h + 2
    grid = (b, h // tile_h)
    kernel_fn = functools.partial(
        _conv3x3_kernel, tile_h=tile_h, w=w, c=c, n=n, relu=relu,
        slab_rows=slab_rows,
    )
    return pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input, streamed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (3, 3C, N) kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (1, N) bias
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, n), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, w + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(xp, kmat, bias2d)
