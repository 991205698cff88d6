"""Per-section TPU profiling harness for the fused batch pipeline: times each
batch-level section by running it K times chained inside ONE jitted program
(single dispatch + single host fetch), so the ~5 ms tunnel dispatch and
~30 ms fetch overheads of this dev environment amortize away.

Usage: PYTHONPATH=. python tools/profile_tpu.py [--full_res] [--iters K]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import functools

from tools._profiling import chain, jax_leaf  # noqa: E402
from tools._profiling import timed as _timed  # noqa: E402

timed = functools.partial(_timed, width=56)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--full_res", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--skip_nets", action="store_true")
    args = p.parse_args()
    K = args.iters
    B = args.batch

    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.ops import pcl, neighbors
    from semantic_depth_tpu.ops.resize import resize_clip_u8
    from semantic_depth_tpu import pipeline as pl_mod

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)

    if args.full_res:
        cfg = munich_pipeline_config(
            compute_dtype="bfloat16", input_height=1024, input_width=2048
        )
    else:
        cfg = munich_pipeline_config(compute_dtype="bfloat16")
    h, w = cfg.input_height, cfg.input_width
    cam = cfg.camera
    print(f"network input: {h}x{w}, batch {B}", flush=True)

    rng = np.random.default_rng(0)

    # synthetic per-batch inputs at network scale
    ys = np.arange(h, dtype=np.float32)[:, None]
    d_ground = np.broadcast_to((ys - cam.cy) * cam.baseline / 1.5, (h, w)).copy()
    disp1 = np.maximum(d_ground, 1e-3) * (1 + rng.normal(0, 1e-3, (h, w)))
    disps = jnp.asarray(np.stack([disp1] * B), jnp.float32)
    road_mask_np = np.zeros((h, w), bool)
    road_mask_np[h // 2:, w // 4: 3 * w // 4] = True
    road_masks = jnp.asarray(np.stack([road_mask_np] * B))
    fence_mask_np = np.zeros((h, w), bool)
    fence_mask_np[h // 4: 3 * h // 4, : w // 8] = True
    fence_mask_np[h // 4: 3 * h // 4, -w // 8:] = True
    fence_masks = jnp.asarray(np.stack([fence_mask_np] * B))
    small = jnp.asarray(rng.uniform(0, 255, (B, h, w, 3)), jnp.float32)
    pts = jax.vmap(lambda d: camera_lib.reproject_disparity(d, cam))(disps)

    # ---- resize from 1024x2048 ----
    frames_big = jnp.asarray(rng.integers(0, 256, (B, 1024, 2048, 3)), jnp.uint8)

    def resize_op(fr, carry):
        out = jax.vmap(lambda f: resize_clip_u8(f.astype(jnp.float32) + carry * 0, (h, w)))(fr)
        return jnp.sum(out) * 1e-9

    timed(f"resize {B}x1024x2048 -> {h}x{w}", chain(resize_op, K), frames_big, per=K)

    # ---- vmapped geometry sections ----
    def road_chain_op(p, s, rm, carry):
        def one(p3d, fs, m):
            c = pcl.from_dense(p3d, fs, m)
            c, plane = pl_mod._denoise_road(c, cfg, grid_hw=(h, w))
            l, r, found = pcl.road_endpoints(
                c, cfg.depth - cfg.rw_depth_offset, cfg.rw_slab_halfwidth
            )
            return jnp.where(found, l[0], 0.0)

        return jnp.sum(jax.vmap(one)(p + carry * 0, s, rm))

    timed(f"road chain full (vmap {B})", chain(road_chain_op, K), pts, small,
          road_masks, per=K)

    # denoise without the neighbor stages (medians+plane only)
    import dataclasses as dc

    cfg_nonb = munich_pipeline_config(
        compute_dtype="bfloat16", input_height=h, input_width=w,
        road=dc.replace(munich_pipeline_config().road, stat_nb_neighbors=2,
                        stat_std_ratio=1e9, radius_nb_points=0, radius=1e9,
                        stat_mode="exact", neighbor_capacity=256),
    )

    def med_chain_op(p, s, rm, carry):
        def one(p3d, fs, m):
            c = pcl.from_dense(p3d, fs, m)
            c = pcl.keep_beyond(c, 2, cfg.road.z_keep_beyond)
            c = pcl.mad_filter(c, 1, 15.0)
            c = pcl.mad_filter(c, 0, 2.0)
            c, plane = pcl.plane_inlier_filter(c, 1, 5.0)
            return jnp.sum(plane)

        return jnp.sum(jax.vmap(one)(p + carry * 0, s, rm))

    timed(f"road medians+plane only (vmap {B})", chain(med_chain_op, K), pts,
          small, road_masks, per=K)

    # knn grid stat filter alone (fixed window at every resolution)
    wh, ww = cfg.road.stat_window

    def knn_op(p, rm, carry):
        def one(p3d, m):
            nv = neighbors.statistical_outlier_filter_grid(
                p3d, m, cfg.road.stat_nb_neighbors, cfg.road.stat_std_ratio,
                (wh, ww),
            )
            return jnp.sum(nv.astype(jnp.float32))

        return jnp.sum(jax.vmap(one)(p + carry * 0, rm))

    timed(f"grid stat filter (pallas kNN {wh}x{ww}, vmap {B})",
          chain(knn_op, max(2, K // 2)), pts, road_masks, per=max(2, K // 2))

    # radius filter alone (compacted capacity)
    cap = cfg.road.neighbor_capacity

    def radius_op(p, rm, carry):
        def one(p3d, m):
            c = pcl.from_dense(p3d, jnp.zeros_like(p3d), m)
            c = pcl.compact(c, cap)
            c = neighbors.radius_outlier_filter(c, cfg.road.radius_nb_points,
                                                cfg.road.radius)
            return jnp.sum(c.valid.astype(jnp.float32))

        return jnp.sum(jax.vmap(one)(p + carry * 0, rm))

    timed(f"compact+radius filter (cap {cap}, vmap {B})",
          chain(radius_op, max(2, K // 2)), pts, road_masks, per=max(2, K // 2))

    # fence chain
    def fence_op(p, s, fm, carry):
        def one(p3d, fs, m):
            fence = pcl.from_dense(p3d, fs, m)
            out = pl_mod._fence_f2f(fence, jnp.asarray([0.0, -1.0, 0.0, 1.5]), cfg)
            return jnp.where(jnp.isfinite(out[-1]), out[-1], 0.0)

        return jnp.sum(jax.vmap(one)(p + carry * 0, s, fm))

    timed(f"fence f2f chain (vmap {B})", chain(fence_op, K), pts, small,
          fence_masks, per=K)

    if not args.skip_nets:
        fcn = FCN8s(num_classes=3, compute_dtype=jnp.bfloat16)
        mono = Monodepth(encoder="vgg", compute_dtype=jnp.bfloat16)
        fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
        mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, h, w, 3), jnp.float32))

        def fcn_op(params, x, carry):
            return jnp.sum(fcn.apply(params, x + carry * 0)) * 1e-9

        kk = max(2, K // 2)
        timed(f"FCN-8s fwd (batch {B}, bf16)", chain(fcn_op, kk), fp, small, per=kk)

        xb2 = jnp.concatenate([small, small[:, :, ::-1]], 0) / 255.0

        def mono_op(params, x, carry):
            return jnp.sum(mono.apply(params, x + carry * 0)[0]) * 1e-9

        timed(f"monodepth fwd (batch {2 * B}, bf16)", chain(mono_op, kk), mp, xb2,
              per=kk)

        # full fused program
        pipe = pl_mod.SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)

        def full(fparams, mparams, fr):
            out = pipe._process_batch_impl(
                fparams, mparams, fr, jnp.float32(cam.focal), jnp.float32(2048.0)
            )
            return out.dist_rw

        jfull = jax.jit(full)
        dt = timed(f"fused batch-{B} pipeline (1024x2048 in)", jfull, fp, mp,
                   frames_big)
        print(f"  -> {B / dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
