"""Pallas TPU kernel: the full MAD outlier filter (median -> MAD -> penalty
mask, pcl.mad_filter semantics) in ONE kernel with VMEM-resident values.

The XLA radix-median path makes ~70 masked counting passes over the (N,)
value/validity planes per filter (median + MAD). Keeping the planes
VMEM-resident for every pass measures 2.2 vs 2.4 ms/batch-8 at 131072
points on v5e — XLA already pipelines its passes well, so the win is
modest (~10%); the kernel is kept because it is bit-exact, fused, and
removes the filter's HBM traffic entirely (which matters when the chain
runs alongside bandwidth-hungry stages in the fused program).

Bit-parity: the kernel replicates pcl._masked_median_radix EXACTLY (the
MSB drill-down visits the same thresholds as the binary search, same
duplicate-count + next-larger recovery of the second order statistic, same
nan semantics for the penalty compare) — verified bit-equal against the
XLA path on chip.

Capacity note: values stay fully VMEM-resident, so the kernel is used for
clouds up to ~256k points (1 MB value + 1 MB validity planes); larger clouds
(the 2M-point full-res grid) fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAD_SCALE = 0.6745  # pcl.py:63


def _to_ordered(bits):
    """IEEE-754 total-order mapping on raw uint32 bits."""
    neg = bits >= jnp.uint32(0x80000000)
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _from_ordered(u):
    neg = u < jnp.uint32(0x80000000)
    return jnp.where(neg, ~u, u & jnp.uint32(0x7FFFFFFF))


def _masked_median_inreg(x, valid, n):
    """Exact pcl._masked_median_radix on VMEM-resident (R, 128) registers.

    The binary search over [0, 2^32) with power-of-two bounds visits exactly
    the thresholds mid_j = prefix | (bit_j - 1), so it is re-expressed as an
    MSB-first bit drill-down — OR/shift scalar arithmetic only (Mosaic lacks
    unsigned scalar division) — producing bit-identical counts/selections.
    The next-larger-value reduction runs in order-preserving int32 (Mosaic
    has no unsigned reductions). Returns the median as a scalar f32."""
    u = _to_ordered(pltpu.bitcast(x, jnp.uint32))
    k1 = jnp.maximum((n - 1) // 2, 0)

    def body(i, p):
        bit = jnp.uint32(1) << (jnp.uint32(31) - i.astype(jnp.uint32))
        mid = p | (bit - jnp.uint32(1))
        c = jnp.sum(jnp.where((u <= mid) & valid, 1, 0))
        return jnp.where(c >= k1 + 1, p, p | bit)

    u_lo = jax.lax.fori_loop(0, 32, body, jnp.uint32(0))
    c_le = jnp.sum(jnp.where((u <= u_lo) & valid, 1, 0))
    need_hi = (n % 2 == 0) & (c_le < n // 2 + 1) & (n > 0)
    # next larger valid value, reduced in order-preserving i32
    ui = pltpu.bitcast(u ^ jnp.uint32(0x80000000), jnp.int32)
    sel = jnp.where(valid & (u > u_lo), ui, jnp.int32(0x7FFFFFFF))
    nxt = jnp.min(sel, axis=(0, 1), keepdims=True)  # (1, 1) i32
    u_next = pltpu.bitcast(nxt, jnp.uint32)[0, 0] ^ jnp.uint32(0x80000000)
    u_hi = jnp.where(need_hi, u_next, u_lo)
    pair = jnp.stack([u_lo, u_hi]).reshape(1, 2)  # 2D for the bitcast
    stats = pltpu.bitcast(_from_ordered(pair), jnp.float32)
    med = 0.5 * (stats[0, 0] + stats[0, 1])
    return jnp.where(n > 0, med, jnp.float32(jnp.nan))


def _mad_kernel(x_ref, v_ref, out_ref, *, threshold: float):
    x = x_ref[:]  # (R, 128) f32 values of the filtered axis
    valid = v_ref[:] > 0
    n = jnp.sum(jnp.where(valid, 1, 0))
    med = _masked_median_inreg(x, valid, n)
    diffs = jnp.abs(x - med)
    mad = _masked_median_inreg(diffs, valid, n)
    penalty = jnp.float32(_MAD_SCALE) * diffs / mad
    # nan/inf penalties compare False, matching np.where(penalty < thr)
    keep = penalty < jnp.float32(threshold)
    out_ref[:] = jnp.where(valid & keep, jnp.float32(1.0), jnp.float32(0.0))


# Above this many points the VMEM-resident planes stop fitting comfortably;
# callers fall back to the XLA radix path.
MAX_RESIDENT_POINTS = 1 << 18


@functools.partial(jax.jit, static_argnames=("threshold",))
def mad_keep_mask_pallas(
    values: jnp.ndarray, valid: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """pcl.mad_filter's keep decision for a (N,) value plane: returns the
    new (N,) bool validity. N must be a multiple of 1024."""
    n = values.shape[0]
    if n % 1024:
        raise ValueError(f"N={n} must be a multiple of 1024")
    rows = n // 128
    x = values.astype(jnp.float32).reshape(rows, 128)
    v = valid.astype(jnp.float32).reshape(rows, 128)
    kernel = functools.partial(_mad_kernel, threshold=float(threshold))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x, v)
    return out.reshape(n) > 0
