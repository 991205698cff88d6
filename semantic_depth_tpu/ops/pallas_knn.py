"""Pallas TPU kernel: windowed k-nearest-neighbor mean distance on an image
grid — the hot op of the road denoise chain (statistical outlier removal,
semantic_depth.py:227-245).

Semantics match ops.neighbors.knn_mean_distances_grid exactly: for each valid
pixel, the mean Euclidean distance to the k nearest valid points within a
(wh, ww) image window (self included at distance 0); +inf for invalid pixels
or windows with fewer than k valid candidates.

Kernel design (see pallas_guide.md):
* the point planes live in VMEM once (at network resolution the padded slabs
  are ~2 MB, far under the ~16 MB budget); the grid tiles rows, and every
  window offset inside a tile is a pure VMEM shift — the XLA stencil version
  instead materializes wh*ww shifted copies through HBM;
* the k smallest distances are kept per pixel with an online sorted-insert:
  k ascending (tile_h, W) registers where each candidate bubble-inserts via
  k compare-exchanges — no sort, no top_k, pure VPU min/max;
* f32 throughout (distances need the precision; the VPU is not the
  bottleneck at ~1k flops/pixel).

The pallas_call runs compiled on TPU and in interpreter mode elsewhere
(tests exercise it against the jnp stencil reference on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_tile_body(px, py, pz, vv, *, k: int, wh: int, ww: int, tile_h: int,
                   w: int):
    """Shared stencil + bubble-insert body. Given one halo slab —
    (tile_h + wh - 1) rows of x/y/z planes and the validity plane — returns
    the (tile_h, w) mean kNN distance tile (+inf where the center pixel is
    invalid). The three kernels below share this exactly and differ ONLY in
    how the slab reaches VMEM (resident slice / per-tile DMA / batched
    per-tile DMA); any algorithm change lands in all of them at once."""
    ph, pw = wh // 2, ww // 2
    cx = px[ph : ph + tile_h, pw : pw + w]
    cy = py[ph : ph + tile_h, pw : pw + w]
    cz = pz[ph : ph + tile_h, pw : pw + w]
    cv = vv[ph : ph + tile_h, pw : pw + w]

    inf = jnp.float32(jnp.inf)
    buf = [jnp.full((tile_h, w), inf, jnp.float32) for _ in range(k)]

    for dy in range(wh):
        for dx in range(ww):
            sx = px[dy : dy + tile_h, dx : dx + w]
            sy = py[dy : dy + tile_h, dx : dx + w]
            sz = pz[dy : dy + tile_h, dx : dx + w]
            sv = vv[dy : dy + tile_h, dx : dx + w]
            d2 = (cx - sx) ** 2 + (cy - sy) ** 2 + (cz - sz) ** 2
            cand = jnp.where(sv > 0, d2, inf)
            # bubble-insert: keeps buf sorted ascending, drops the largest
            for j in range(k):
                lo = jnp.minimum(buf[j], cand)
                hi = jnp.maximum(buf[j], cand)
                buf[j] = lo
                cand = hi

    acc = jnp.zeros((tile_h, w), jnp.float32)
    for j in range(k):
        acc = acc + jnp.sqrt(buf[j])
    return jnp.where(cv > 0, acc / jnp.float32(k), inf)


def _knn_kernel(points_ref, valid_ref, out_ref, *, k: int, wh: int, ww: int,
                tile_h: int, w: int):
    i = pl.program_id(0)
    row0 = i * tile_h  # top of this tile in padded coordinates

    # Halo slab for this tile: (tile_h + wh - 1) rows, full padded width.
    slab_h = tile_h + wh - 1
    px = points_ref[0, pl.ds(row0, slab_h), :]
    py = points_ref[1, pl.ds(row0, slab_h), :]
    pz = points_ref[2, pl.ds(row0, slab_h), :]
    vv = valid_ref[pl.ds(row0, slab_h), :]
    out_ref[:] = _knn_tile_body(px, py, pz, vv, k=k, wh=wh, ww=ww,
                                tile_h=tile_h, w=w)


def _knn_kernel_hbm(points_ref, valid_ref, out_ref, pts_vmem, val_vmem, sems, *,
                    k: int, wh: int, ww: int, tile_h: int, w: int, slab8: int):
    """Large-image variant: inputs stay in HBM; each program DMAs its halo
    slab into VMEM scratch (double the slab would enable prefetch overlap;
    the compute per tile already dwarfs the copy). The copied slab height is
    rounded up to 8 rows (Mosaic HBM-slice tiling constraint); the surplus
    rows are padding the kernel never reads."""
    i = pl.program_id(0)
    row0 = i * tile_h  # 8-aligned since tile_h % 8 == 0
    cp_pts = pltpu.make_async_copy(
        points_ref.at[:, pl.ds(row0, slab8), :], pts_vmem, sems.at[0]
    )
    cp_val = pltpu.make_async_copy(
        valid_ref.at[pl.ds(row0, slab8), :], val_vmem, sems.at[1]
    )
    cp_pts.start()
    cp_val.start()
    cp_pts.wait()
    cp_val.wait()

    out_ref[:] = _knn_tile_body(
        pts_vmem[0], pts_vmem[1], pts_vmem[2], val_vmem[:],
        k=k, wh=wh, ww=ww, tile_h=tile_h, w=w,
    )


def _knn_kernel_hbm_batched(points_ref, valid_ref, out_ref, pts_vmem, val_vmem,
                            sems, *, k: int, wh: int, ww: int, tile_h: int,
                            w: int, slab8: int):
    """Batched large-image variant: grid (B, n_tiles); each program DMAs its
    frame's halo slab from HBM. Same body as _knn_kernel_hbm with a leading
    batch coordinate (jax.vmap cannot batch ANY-memory-space pallas_calls, so
    the batch axis is a native grid dimension here)."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * tile_h
    cp_pts = pltpu.make_async_copy(
        points_ref.at[bi, :, pl.ds(row0, slab8), :], pts_vmem, sems.at[0]
    )
    cp_val = pltpu.make_async_copy(
        valid_ref.at[bi, pl.ds(row0, slab8), :], val_vmem, sems.at[1]
    )
    cp_pts.start()
    cp_val.start()
    cp_pts.wait()
    cp_val.wait()

    out_ref[0] = _knn_tile_body(
        pts_vmem[0], pts_vmem[1], pts_vmem[2], val_vmem[:],
        k=k, wh=wh, ww=ww, tile_h=tile_h, w=w,
    )


# Budget for keeping the padded planes fully VMEM-resident (bytes). Above
# this the HBM + per-tile-DMA variant is used.
_VMEM_RESIDENT_BUDGET = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("k", "window", "tile_h"))
def knn_mean_distances_grid_pallas(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    window: Tuple[int, int] = (5, 21),
    tile_h: int = 32,
) -> jnp.ndarray:
    """Pallas TPU path of ops.neighbors.knn_mean_distances_grid.

    points: (H, W, 3) f32; valid: (H, W) bool. H must be a multiple of
    tile_h. Returns (H, W) f32 mean kNN distance (+inf where invalid).
    Small images keep all planes VMEM-resident; large ones (full-res
    1024x2048) stream halo slabs from HBM per row tile.
    """
    h, w = valid.shape
    wh, ww = window
    ph, pw = wh // 2, ww // 2
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be a multiple of tile_h={tile_h}")

    # channels-major planes with halo padding; halo candidates are invalid
    pts = jnp.where(valid[..., None], points, 0.0).astype(jnp.float32)
    planes = jnp.moveaxis(pts, -1, 0)  # (3, H, W)
    planes = jnp.pad(planes, ((0, 0), (ph, ph), (pw, pw)))
    vmask = jnp.pad(valid.astype(jnp.float32), ((ph, ph), (pw, pw)))

    n_tiles = h // tile_h
    interpret = jax.default_backend() != "tpu"
    resident_bytes = 4 * planes.size + 4 * vmask.size

    if resident_bytes <= _VMEM_RESIDENT_BUDGET:
        kernel = functools.partial(_knn_kernel, k=k, wh=wh, ww=ww, tile_h=tile_h, w=w)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full planes resident
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            interpret=interpret,
        )(planes, vmask)

    if tile_h % 8 != 0:
        raise ValueError(f"HBM-streaming path needs tile_h % 8 == 0, got {tile_h}")
    slab_h = tile_h + wh - 1
    slab8 = -(-slab_h // 8) * 8  # Mosaic: HBM row slices must be 8-aligned
    wp = -(-(w + ww - 1) // 128) * 128  # ... and widths 128-lane-aligned
    # grow padding so the last tile's aligned slab stays in range and the
    # width hits the lane boundary
    need_rows = (n_tiles - 1) * tile_h + slab8
    extra_rows = max(0, need_rows - planes.shape[1])
    extra_cols = wp - planes.shape[2]
    if extra_rows or extra_cols:
        planes = jnp.pad(planes, ((0, 0), (0, extra_rows), (0, extra_cols)))
        vmask = jnp.pad(vmask, ((0, extra_rows), (0, extra_cols)))
    kernel = functools.partial(
        _knn_kernel_hbm, k=k, wh=wh, ww=ww, tile_h=tile_h, w=w, slab8=slab8
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, slab8, wp), jnp.float32),
            pltpu.VMEM((slab8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(planes, vmask)


@functools.partial(jax.jit, static_argnames=("k", "window", "tile_h"))
def knn_mean_distances_grid_pallas_batched(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    window: Tuple[int, int] = (5, 21),
    tile_h: int = 32,
) -> jnp.ndarray:
    """Batched knn_mean_distances_grid_pallas: points (B, H, W, 3),
    valid (B, H, W) -> (B, H, W). Small frames go through jax.vmap of the
    resident kernel (Pallas batches VMEM-block kernels natively); large
    frames run the HBM-streaming kernel with the batch as a leading grid
    dimension (jax.vmap cannot batch ANY-memory-space blocks)."""
    b, h, w = valid.shape
    wh, ww = window
    ph, pw = wh // 2, ww // 2
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be a multiple of tile_h={tile_h}")

    per_frame_bytes = 4 * 3 * (h + 2 * ph) * (w + 2 * pw) + 4 * (h + 2 * ph) * (w + 2 * pw)
    if per_frame_bytes <= _VMEM_RESIDENT_BUDGET:
        return jax.vmap(
            lambda p, v: knn_mean_distances_grid_pallas(p, v, k, window, tile_h)
        )(points, valid)

    if tile_h % 8 != 0:
        raise ValueError(f"HBM-streaming path needs tile_h % 8 == 0, got {tile_h}")

    pts = jnp.where(valid[..., None], points, 0.0).astype(jnp.float32)
    planes = jnp.moveaxis(pts, -1, 1)  # (B, 3, H, W)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    vmask = jnp.pad(valid.astype(jnp.float32), ((0, 0), (ph, ph), (pw, pw)))

    n_tiles = h // tile_h
    slab_h = tile_h + wh - 1
    slab8 = -(-slab_h // 8) * 8
    wp = -(-(w + ww - 1) // 128) * 128
    need_rows = (n_tiles - 1) * tile_h + slab8
    extra_rows = max(0, need_rows - planes.shape[2])
    extra_cols = wp - planes.shape[3]
    if extra_rows or extra_cols:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, extra_rows), (0, extra_cols)))
        vmask = jnp.pad(vmask, ((0, 0), (0, extra_rows), (0, extra_cols)))
    kernel = functools.partial(
        _knn_kernel_hbm_batched, k=k, wh=wh, ww=ww, tile_h=tile_h, w=w, slab8=slab8
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, slab8, wp), jnp.float32),
            pltpu.VMEM((slab8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(planes, vmask)
