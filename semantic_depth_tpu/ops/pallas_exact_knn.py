"""Pallas TPU kernel: exact k-nearest-neighbor mean distances over an
arbitrary (non-grid) point cloud — the fast path for the O(N^2) statistical
outlier filter (Open3D semantics, semantic_depth.py:227-245) used on
arbitrary PLYs by utils/outlier_removal.py.

The XLA fallback (ops.neighbors.knn_mean_distances) merges per-block
top_k results, and XLA's top_k lowers to a full variadic sort
(~log^2(block) compare passes). This kernel instead keeps a running k-best
per query in VMEM and, per candidate block, extracts the block's k smallest
with k min-extraction passes (k=10 vs ~121 sort passes) — the Gram-matrix
cross term rides the MXU, the extraction rides the VPU at full lane width.

Layout (see pallas_guide.md):
* queries: (C, 3) blocked (TQ, 3) per program — auto-pipelined into VMEM;
* candidates: (8, C) coordinate planes (3 used rows + sublane padding) +
  (8, C) validity plane, fully VMEM-resident (C=16k -> 0.5 MB each);
* running k-best: k (TQ, 1) registers, bubble-insert per extracted minimum;
* ties are masked one-at-a-time (lane cumsum) so duplicate distances are
  kept exactly like the sort-based reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _exact_knn_kernel(q_ref, c_ref, v_ref, out_ref, *, k: int, cb: int, c_total: int):
    q = q_ref[:]  # (TQ, 3)
    tq = q.shape[0]
    sq_q = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)

    inf = jnp.float32(jnp.inf)
    n_blocks = c_total // cb

    def block_step(j, buf):
        c = c_ref[0:3, pl.ds(j * cb, cb)]  # (3, CB)
        v = v_ref[0:1, pl.ds(j * cb, cb)]  # (1, CB)
        sq_c = jnp.sum(c * c, axis=0, keepdims=True)  # (1, CB)
        cross = jax.lax.dot_general(
            q, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TQ, CB)
        d2 = jnp.maximum(sq_q + sq_c - 2.0 * cross, 0.0)
        d2 = jnp.where(v > 0, d2, inf)

        # extract the block's k smallest per row, maintaining duplicates:
        # mask exactly ONE occurrence of each extracted minimum per pass
        # (the first by column, via an iota argmin — Mosaic has no cumsum).
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

        def extract(_, carry):
            d2_cur, buf = carry
            m = jnp.min(d2_cur, axis=1, keepdims=True)  # (TQ, 1)
            is_min = d2_cur == m
            min_col = jnp.min(jnp.where(is_min, col, cb), axis=1, keepdims=True)
            d2_cur = jnp.where(is_min & (col == min_col), inf, d2_cur)
            # bubble-insert m into the sorted running buffer
            cand = m
            new_buf = []
            for bj in range(k):
                lo = jnp.minimum(buf[bj], cand)
                hi = jnp.maximum(buf[bj], cand)
                new_buf.append(lo)
                cand = hi
            return d2_cur, tuple(new_buf)

        _, buf = jax.lax.fori_loop(0, k, extract, (d2, buf))
        return buf

    buf0 = tuple(jnp.full((tq, 1), inf, jnp.float32) for _ in range(k))
    buf = jax.lax.fori_loop(0, n_blocks, block_step, buf0)

    # ascending-order sum -> same accumulation order as mean over the sorted
    # row of the XLA path. Average over the FINITE entries only (min(k, n)
    # neighbors — SearchKNN returns fewer than k on clouds smaller than k and
    # the upstream mean divides by what was returned; infs pad the tail of
    # the ascending buffer, so skipping them preserves the sum order).
    acc = jnp.zeros((tq, 1), jnp.float32)
    cnt = jnp.zeros((tq, 1), jnp.float32)
    for bj in range(k):
        fin = buf[bj] < inf
        acc = acc + jnp.where(fin, jnp.sqrt(buf[bj]), 0.0)
        cnt = cnt + fin.astype(jnp.float32)
    out_ref[:] = acc / jnp.maximum(cnt, 1.0)


def _radius_kernel(q_ref, c_ref, v_ref, bz_ref, out_ref, *, cb: int, c_total: int,
                   r2: float):
    """v_ref row 0 carries per-candidate WEIGHTS (1.0 for plain validity);
    a candidate within the radius contributes its weight — the
    density-compensated count of neighbors.radius_outlier_filter.

    bz_ref (SMEM, (2, n_blocks)) holds each candidate block's valid-z
    min/max: compacted clouds keep image row-major order, so z is
    near-monotone and most blocks lie further than ``radius`` from a query
    tile's z-range — those blocks are skipped entirely (exact: a skipped
    block provably contains no point within ``radius`` of any query).
    Invalid query rows are pre-filled with a real point by the wrapper so
    the tile z-range stays tight."""
    q = q_ref[:]  # (TQ, 3)
    tq = q.shape[0]
    sq_q = jnp.sum(q * q, axis=1, keepdims=True)
    qz_min = jnp.min(q[:, 2])
    qz_max = jnp.max(q[:, 2])
    n_blocks = c_total // cb

    def block_step(j, counts):
        # bz rows are pre-widened by radius + a Gram-identity f32 error
        # margin in the wrapper, so this compare is directly against the
        # query tile's raw z-range.
        overlap = (bz_ref[0, j] <= qz_max) & (bz_ref[1, j] >= qz_min)

        def compute(acc):
            c = c_ref[0:3, pl.ds(j * cb, cb)]
            v = v_ref[0:1, pl.ds(j * cb, cb)]
            sq_c = jnp.sum(c * c, axis=0, keepdims=True)
            cross = jax.lax.dot_general(
                q, c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = jnp.maximum(sq_q + sq_c - 2.0 * cross, 0.0)
            # STRICT <: FLANN's RadiusResultSet admits dist < radius^2 only
            contrib = jnp.where(d2 < r2, v, 0.0)
            return acc + jnp.sum(contrib, axis=1, keepdims=True)

        return jax.lax.cond(overlap, compute, lambda acc: acc, counts)

    counts = jax.lax.fori_loop(0, n_blocks, block_step, jnp.zeros((tq, 1), jnp.float32))
    out_ref[:] = counts


@functools.partial(jax.jit, static_argnames=("radius", "tq", "cb", "skip"))
def radius_counts_pallas(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    tq: int = 256,
    cb: int = 2048,
    weights: jnp.ndarray = None,
    skip: bool = True,
) -> jnp.ndarray:
    """Exact within-radius neighbor counts (self included), 0 on invalid rows
    — identical semantics to ops.neighbors.radius_counts, but the (C, C)
    distance matrix never leaves VMEM (the XLA scan writes each
    (C, block) cross tile through HBM — the profiled hot spot of the road
    chain at 45 ms/batch-8).

    weights: optional per-candidate f32 contributions replacing the 0/1
    validity count (density compensation, neighbors.radius_outlier_filter);
    when given the return is the weighted f32 sum, else int32 counts."""
    c_total = xyz.shape[0]
    if c_total % tq or c_total % cb:
        raise ValueError(f"capacity {c_total} must be a multiple of tq={tq}, cb={cb}")

    # Weights on INVALID rows must not count: invalid candidates are zeroed
    # to the origin in the coordinate planes, so an unmasked nonzero weight
    # there would be added for every query within ``radius`` of (0,0,0).
    w = (
        valid.astype(jnp.float32)
        if weights is None
        else jnp.where(valid, weights.astype(jnp.float32), 0.0)
    )
    planes = jnp.zeros((8, c_total), jnp.float32)
    planes = planes.at[0:3].set(jnp.where(valid[None, :], xyz.T, 0.0))
    vplane = jnp.broadcast_to(w[None, :], (8, c_total))

    # Per-block valid-z ranges for the kernel's block-skip test, pre-widened
    # by the radius PLUS a Gram-identity f32 error bound: d2 is computed as
    # sq_q + sq_c - 2 cross, whose rounding error scales with the largest
    # |coord|^2, so a pair geometrically just outside the radius can still
    # satisfy d2 <= r2. Widening by sqrt(r^2 + 4e-6 * max|p|^2) - ... keeps
    # skipped blocks provably uncountable under BOTH paths — the kernel
    # stays bit-identical to the unskipped XLA counts. An all-invalid block
    # gets (+inf, -inf) and is always skipped.
    n_blocks = c_total // cb
    maxsq = jnp.max(jnp.where(valid, jnp.sum(xyz * xyz, axis=1), 0.0))
    zthr = jnp.sqrt(jnp.float32(radius) ** 2 + 4e-6 * maxsq)
    if not skip:  # debug/validation: disable block skipping entirely
        zthr = jnp.float32(jnp.inf)
    zc = xyz[:, 2].reshape(n_blocks, cb)
    vb = valid.reshape(n_blocks, cb)
    bz = jnp.stack([
        jnp.min(jnp.where(vb, zc, jnp.inf), axis=1) - zthr,
        jnp.max(jnp.where(vb, zc, -jnp.inf), axis=1) + zthr,
    ])  # (2, n_blocks)

    # Queries: invalid rows take the first VALID point's coords (not zeros,
    # which would inflate a partially-valid tile's z-range toward 0; not
    # xyz[0], whose row may be invalid garbage — a NaN there would poison
    # the tile z-min/max and silently skip every candidate block for the
    # whole tile, zeroing counts for VALID queries too). Any fill from a
    # real valid point keeps the skip test conservative-exact. With zero
    # valid rows argmax gives row 0; every output is masked then anyway.
    fill = xyz[jnp.argmax(valid)]
    q_xyz = jnp.where(valid[:, None], xyz, fill).astype(jnp.float32)

    kernel = functools.partial(
        _radius_kernel, cb=cb, c_total=c_total, r2=float(radius) ** 2
    )
    out = pl.pallas_call(
        kernel,
        grid=(c_total // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_total, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(q_xyz, planes, vplane, bz)
    if weights is None:
        return jnp.where(valid, out[:, 0].astype(jnp.int32), 0)
    return jnp.where(valid, out[:, 0], 0.0)


@functools.partial(jax.jit, static_argnames=("k", "tq", "cb"))
def knn_mean_distances_exact_pallas(
    xyz: jnp.ndarray, valid: jnp.ndarray, k: int, tq: int = 256, cb: int = 2048
) -> jnp.ndarray:
    """Exact mean distance from every point to its k nearest valid points
    (self included, distance 0), +inf on invalid rows — identical semantics
    to ops.neighbors.knn_mean_distances.

    xyz: (C, 3) f32; valid: (C,) bool. C must be a multiple of tq and cb.
    """
    c_total = xyz.shape[0]
    if c_total % tq or c_total % cb:
        raise ValueError(f"capacity {c_total} must be a multiple of tq={tq}, cb={cb}")

    planes = jnp.zeros((8, c_total), jnp.float32)
    planes = planes.at[0:3].set(jnp.where(valid[None, :], xyz.T, 0.0))
    vplane = jnp.broadcast_to(valid.astype(jnp.float32)[None, :], (8, c_total))

    kernel = functools.partial(_exact_knn_kernel, k=k, cb=cb, c_total=c_total)
    out = pl.pallas_call(
        kernel,
        grid=(c_total // tq,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coordinate planes, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # validity plane, resident
        ],
        out_specs=pl.BlockSpec((tq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_total, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(jnp.where(valid[:, None], xyz, 0.0).astype(jnp.float32), planes, vplane)
    return jnp.where(valid, out[:, 0], jnp.inf)
