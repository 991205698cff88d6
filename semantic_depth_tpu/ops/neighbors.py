"""Statistical and radius outlier removal — the Open3D replacement.

The reference's only spatial-search stage is Open3D's C++ KD-tree outlier
removal on the road cloud (semantic_depth.py:227-245):

    statistical_outlier_removal(nb_neighbors=10, std_ratio=0.5)
    radius_outlier_removal(nb_points=80, radius=0.5)

KD-trees are a pointer-chasing CPU structure; on TPU the fast path is the MXU.
For a compacted cloud of capacity C we compute pairwise squared distances in
column blocks using the Gram-matrix identity

    d2[i, j] = |x_i|^2 + |x_j|^2 - 2 <x_i, x_j>

where the inner-product term is a (C,3)x(3,B) matmul — systolic-array work —
and reduce each block on the fly (running k-smallest merge for the
statistical pass, running radius counts for the radius pass). Nothing
materializes the full C x C matrix.

Semantics are a transcription of Open3D's legacy (0.x) implementation — the
era API the reference calls (``statistical_outlier_removal`` /
``radius_outlier_removal``, semantic_depth.py:227-245; upstream C++:
src/Geometry/DownSample.cpp RemoveStatisticalOutliers / RemoveRadiusOutliers
over KDTreeFlann). Line-by-line notes live in tests/oracles.py; the binding
rules are:

* statistical: KDTreeFlann.SearchKNN on the cloud itself returns the query
  point among its k neighbors (distance 0) and min(k, n) neighbors when the
  cloud is smaller than k; avg_distance = mean of the sqrt'd distances over
  however many were returned. The global threshold is
  cloud_mean + std_ratio * std where both moments divide by the FULL valid
  count (n, resp. n-1 — Bessel) while their sums skip avg_distance == 0
  entries; a point survives iff avg_distance > 0 AND avg_distance <
  threshold (strict) — so a point lying on >= k-1 exact duplicates of
  itself is removed.
* radius: a point survives if the number of cloud points with squared
  distance STRICTLY below radius^2 (FLANN RadiusResultSet::addPoint uses
  ``dist < radius_``; Open3D passes radius*radius), including itself,
  exceeds ``nb_points`` (strict >).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .pcl import MaskedCloud


def _block_d2(xyz: jnp.ndarray, block: jnp.ndarray) -> jnp.ndarray:
    """Squared distances between all rows of xyz (C,3) and block (B,3) via the
    MXU. Clamped at 0 to kill negative round-off."""
    sq_r = jnp.sum(xyz * xyz, axis=1, keepdims=True)  # (C, 1)
    sq_b = jnp.sum(block * block, axis=1)[None, :]  # (1, B)
    # HIGHEST precision: the Gram identity cancels catastrophically if the
    # cross term runs at the default (bf16-grade) matmul precision.
    cross = jnp.dot(
        xyz,
        block.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (C, B)
    return jnp.maximum(sq_r + sq_b - 2.0 * cross, 0.0)


def _column_blocks(cloud: MaskedCloud, block_size: int):
    c = cloud.capacity
    block_size = min(block_size, c)
    if c % block_size != 0:
        raise ValueError(f"capacity {c} must be a multiple of block_size {block_size}")
    nb = c // block_size
    cols = cloud.xyz.reshape(nb, block_size, 3)
    colmask = cloud.valid.reshape(nb, block_size)
    return cols, colmask


@partial(jax.jit, static_argnames=("k", "block_size"))
def knn_mean_distances(cloud: MaskedCloud, k: int, block_size: int = 2048) -> jnp.ndarray:
    """Mean distance from each valid point to its min(k, n) nearest valid
    neighbors (self included, distance 0) — SearchKNN returns fewer than k
    when the cloud is smaller, and the upstream average divides by what was
    returned (module docstring). Invalid rows return +inf. O(C^2) in blocked
    MXU matmuls + per-block top-k merges."""
    cols, colmask = _column_blocks(cloud, block_size)
    init = jnp.full((cloud.capacity, k), jnp.inf, jnp.float32)
    blk_k = min(k, cols.shape[1])  # a block cannot contribute more than its size

    def step(best, blk):
        block, bmask = blk
        d2 = _block_d2(cloud.xyz, block)
        d2 = jnp.where(bmask[None, :], d2, jnp.inf)
        blk_best = -jax.lax.top_k(-d2, blk_k)[0]  # k smallest per row
        merged = jnp.sort(jnp.concatenate([best, blk_best], axis=1), axis=1)[:, :k]
        return merged, None

    best, _ = jax.lax.scan(step, init, (cols, colmask))
    fin = jnp.isfinite(best)  # ascending rows: the finite min(k, n) lead
    cnt = jnp.sum(fin.astype(jnp.float32), axis=1)
    mean_d = jnp.sum(jnp.where(fin, jnp.sqrt(best), 0.0), axis=1) / jnp.maximum(cnt, 1.0)
    return jnp.where(cloud.valid, mean_d, jnp.inf)


@partial(jax.jit, static_argnames=("block_size",))
def radius_counts(cloud: MaskedCloud, radius: float, block_size: int = 2048) -> jnp.ndarray:
    """Number of valid cloud points within ``radius`` of each point (self
    included). Invalid rows return 0."""
    cols, colmask = _column_blocks(cloud, block_size)
    r2 = jnp.float32(radius) ** 2

    def step(counts, blk):
        block, bmask = blk
        d2 = _block_d2(cloud.xyz, block)
        # STRICT <: FLANN's RadiusResultSet admits dist < radius^2 only
        within = (d2 < r2) & bmask[None, :]
        return counts + jnp.sum(within.astype(jnp.int32), axis=1), None

    counts, _ = jax.lax.scan(step, jnp.zeros((cloud.capacity,), jnp.int32), (cols, colmask))
    return jnp.where(cloud.valid, counts, 0)


@partial(jax.jit, static_argnames=("block_size",))
def radius_counts_weighted(
    cloud: MaskedCloud, weights: jnp.ndarray, radius: float, block_size: int = 2048
) -> jnp.ndarray:
    """Sum of per-candidate ``weights`` within ``radius`` of each point —
    density-compensated neighbor counts (a stride-s subsampled candidate
    carries weight s, an in-slab full-density candidate weight 1; see
    pcl.select_slab_priority). With all-ones weights this equals
    radius_counts. Invalid rows (weight 0) contribute nothing and return 0."""
    c = cloud.capacity
    block_size = min(block_size, c)
    cols = cloud.xyz.reshape(c // block_size, block_size, 3)
    wcols = weights.astype(jnp.float32).reshape(c // block_size, block_size)
    r2 = jnp.float32(radius) ** 2

    def step(counts, blk):
        block, w = blk
        d2 = _block_d2(cloud.xyz, block)
        return counts + jnp.sum(jnp.where(d2 < r2, w[None, :], 0.0), axis=1), None

    counts, _ = jax.lax.scan(step, jnp.zeros((c,), jnp.float32), (cols, wcols))
    return jnp.where(cloud.valid, counts, 0.0)


def knn_mean_distances_grid(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    window: Tuple[int, int] = (5, 21),
) -> jnp.ndarray:
    """Mean distance to the k nearest valid neighbors, restricted to an image
    window — the TPU-native fast path for clouds that come from a pixel grid
    (which SemanticDepth's always do: the cloud IS the back-projected image,
    camera.py). For a dense road cloud the true 3D k-NN of a pixel lie within
    a few rows/columns, so a (5, 21) window reproduces the exact-kNN result;
    points too isolated to have k candidates in the window get +inf (and are
    exactly the outliers the statistical filter should drop).

    points: (H, W, 3); valid: (H, W). Returns (H, W) f32, +inf on invalid.
    O(H*W*window) stencil math instead of the O(N^2) distance matrix.
    """
    h, w = valid.shape
    wh, ww = window
    ph, pw = wh // 2, ww // 2
    pts = jnp.where(valid[..., None], points, 0.0).astype(jnp.float32)
    pad_pts = jnp.pad(pts, ((ph, ph), (pw, pw), (0, 0)))
    pad_valid = jnp.pad(valid, ((ph, ph), (pw, pw)))

    cands = []
    for dy in range(wh):
        for dx in range(ww):
            shifted = jax.lax.dynamic_slice(pad_pts, (dy, dx, 0), (h, w, 3))
            svalid = jax.lax.dynamic_slice(pad_valid, (dy, dx), (h, w))
            d2 = jnp.sum((pts - shifted) ** 2, axis=-1)
            cands.append(jnp.where(svalid, d2, jnp.inf))
    cand = jnp.stack(cands, axis=-1)  # (H, W, wh*ww), includes self at 0
    smallest = -jax.lax.top_k(-cand, k)[0]
    mean_d = jnp.mean(jnp.sqrt(smallest), axis=-1)
    return jnp.where(valid, mean_d, jnp.inf)


def _grid_knn_dispatch(points, valid, k, window):
    """Pick the TPU Pallas kernel when compiling for TPU (394x faster than
    the XLA stencil there — the wh*ww pad+slice copies round-trip HBM);
    the jnp stencil elsewhere (the Pallas interpreter is slow on CPU). Both
    are verified bit-identical (tests/test_pallas_knn.py).

    Wrapped in custom_vmap: jax.vmap cannot batch the large-image
    (ANY-memory-space, HBM-streaming) pallas_call, so batching maps to the
    natively-batched kernel (batch axis as a leading grid dimension)."""
    if jax.default_backend() == "tpu":
        from .pallas_knn import (
            _VMEM_RESIDENT_BUDGET,
            knn_mean_distances_grid_pallas,
            knn_mean_distances_grid_pallas_batched,
        )

        h, w_ = valid.shape
        wh, ww = window
        resident = (
            16 * (h + 2 * (wh // 2)) * (w_ + 2 * (ww // 2))
            <= _VMEM_RESIDENT_BUDGET
        )
        # tile 64 is ~6% faster on the VMEM-resident path (tile sweep on
        # v5e); the HBM-streaming path keeps 32 — its per-tile k-buffers at
        # 64 rows press against Mosaic's 16 MB kernel-stack limit.
        tile_h = 64 if resident else 32
        while h % tile_h != 0:
            tile_h //= 2

        @jax.custom_batching.custom_vmap
        def run(p, v):
            return knn_mean_distances_grid_pallas(p, v, k, window, tile_h=tile_h)

        @run.def_vmap
        def _run_vmap(axis_size, in_batched, p, v):
            if not in_batched[0]:
                p = jnp.broadcast_to(p[None], (axis_size,) + p.shape)
            if not in_batched[1]:
                v = jnp.broadcast_to(v[None], (axis_size,) + v.shape)
            out = knn_mean_distances_grid_pallas_batched(
                p, v, k, window, tile_h=tile_h
            )
            return out, True

        return run(points, valid)
    return knn_mean_distances_grid(points, valid, k, window)


def statistical_outlier_filter_grid(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    nb_neighbors: int,
    std_ratio: float,
    window: Tuple[int, int] = (5, 21),
) -> jnp.ndarray:
    """Grid-windowed statistical outlier removal: same global
    mean + std_ratio * sample-std threshold as the exact filter, with
    windowed kNN. Pixels too isolated to have k candidates in the window get
    +inf and are excluded from the moments (the upstream full-cloud search
    would have produced a large finite value instead; such pixels are
    outliers under either reading — the documented grid-path approximation).
    Returns the updated (H, W) validity mask."""
    mean_d = _grid_knn_dispatch(points, valid, nb_neighbors, window)
    finite = valid & jnp.isfinite(mean_d)
    pos = finite & (mean_d > 0)  # upstream skips avg == 0 rows in the sums
    n = jnp.sum(finite.astype(jnp.float32))
    vals = jnp.where(pos, mean_d, 0.0)
    mu = jnp.sum(vals) / n
    var = jnp.sum(jnp.where(pos, (mean_d - mu) ** 2, 0.0)) / (n - 1.0)
    threshold = mu + std_ratio * jnp.sqrt(var)
    return pos & (mean_d < threshold)


def _exact_knn_dispatch(cloud: MaskedCloud, k: int, block_size: int) -> jnp.ndarray:
    """Pallas kernel on TPU (running k-best in VMEM — the XLA scan's top_k
    sorts and its (C, block) cross tiles round-trip HBM); XLA elsewhere."""
    c = cloud.capacity
    if jax.default_backend() == "tpu" and c % 256 == 0:
        from .pallas_exact_knn import knn_mean_distances_exact_pallas

        cb = 2048 if c % 2048 == 0 else 256
        return knn_mean_distances_exact_pallas(cloud.xyz, cloud.valid, k, cb=cb)
    return knn_mean_distances(cloud, k, block_size)


def statistical_outlier_filter(
    cloud: MaskedCloud, nb_neighbors: int, std_ratio: float, block_size: int = 2048
) -> MaskedCloud:
    """Open3D statistical_outlier_removal semantics (semantic_depth.py:234;
    upstream transcription in the module docstring / tests/oracles.py):
    moments divide by the full valid count (every point finds at least
    itself) while their sums skip avg_distance == 0 rows; survivors need
    avg_distance > 0 AND avg_distance < mean + std_ratio * sample_std."""
    mean_d = _exact_knn_dispatch(cloud, nb_neighbors, block_size)
    n = jnp.sum(cloud.valid.astype(jnp.float32))
    pos = cloud.valid & (mean_d > 0)
    vals = jnp.where(pos, mean_d, 0.0)
    mu = jnp.sum(vals) / n
    var = jnp.sum(jnp.where(pos, (mean_d - mu) ** 2, 0.0)) / (n - 1.0)
    threshold = mu + std_ratio * jnp.sqrt(var)
    return cloud.with_mask(pos & (mean_d < threshold))


def radius_outlier_filter(
    cloud: MaskedCloud,
    nb_points: int,
    radius: float,
    block_size: int = 2048,
    weights=None,
) -> MaskedCloud:
    """Open3D radius_outlier_removal semantics (semantic_depth.py:238).

    weights: optional per-candidate density compensation — each candidate
    within ``radius`` contributes its weight instead of 1 and the weighted
    sum is compared against ``nb_points``. Pass stride/px_ratio weights when
    the cloud mixes full-density (endpoint slab) and stride-subsampled
    points (pcl.select_slab_priority + compact on overflow) or was sampled
    at a different grid resolution than the reference's 256x512, so the
    threshold keeps its reference-density meaning. With all-ones weights the
    cut is bit-identical to the unweighted one (small int counts are exact
    in f32)."""
    c = cloud.capacity
    if weights is None:
        if jax.default_backend() == "tpu" and c % 256 == 0:
            from .pallas_exact_knn import radius_counts_pallas

            cb = 2048 if c % 2048 == 0 else 256
            counts = radius_counts_pallas(cloud.xyz, cloud.valid, float(radius), cb=cb)
        else:
            counts = radius_counts(cloud, radius, block_size)
        return cloud.with_mask(cloud.valid & (counts > nb_points))

    weights = jnp.where(cloud.valid, weights.astype(jnp.float32), 0.0)
    if jax.default_backend() == "tpu" and c % 256 == 0:
        from .pallas_exact_knn import radius_counts_pallas

        cb = 2048 if c % 2048 == 0 else 256
        est = radius_counts_pallas(
            cloud.xyz, cloud.valid, float(radius), cb=cb, weights=weights
        )
    else:
        est = radius_counts_weighted(cloud, weights, radius, block_size)
    return cloud.with_mask(cloud.valid & (est > nb_points))
