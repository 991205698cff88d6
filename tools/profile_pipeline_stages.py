"""Per-stage budget of the BATCH pipeline executables (VERDICT r2 #7).

Times each stage of ``process_batch`` as its own jitted program — resize,
FCN forward, mask thresholds, monodepth forward (+flip blend), reprojection,
geometry chain, overlay — at the headline shape (256x512 grid, batch 8) or
the native full-res shape (1024x2048, input_s2d trunks, batch 8). Stage
programs re-run parts the fused program computes once, so the SUM exceeds
the fused time; the value is the RELATIVE split.

Usage:
  python tools/profile_pipeline_stages.py            # headline 256x512 b8
  python tools/profile_pipeline_stages.py --native   # native 1024x2048 b8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--native", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.models import weights as weights_lib
    from semantic_depth_tpu.models.monodepth import flip_average_postprocess
    from semantic_depth_tpu.ops import pcl
    from semantic_depth_tpu.ops.overlay import segmentation_overlay
    from semantic_depth_tpu.ops.resize import resize_clip_u8
    from semantic_depth_tpu.pipeline import (
        SemanticDepthPipeline,
        _denoise_road,
        _scaled_camera,
    )
    from semantic_depth_tpu.utils.bench_scenes import scene_pool

    B = args.batch
    if args.native:
        cfg = munich_pipeline_config(
            compute_dtype="bfloat16", input_height=1024, input_width=2048
        )
        cfg = dataclasses.replace(
            cfg, monodepth=dataclasses.replace(cfg.monodepth, flip_average=False)
        )
        fcn = FCN8s(num_classes=3, compute_dtype=jnp.bfloat16, input_s2d=True)
        mono = Monodepth(encoder="vgg", compute_dtype=jnp.bfloat16, input_s2d=True)
        wf, wm = ".bench_weights/fcn8s_native.msgpack", ".bench_weights/monodepth_native.msgpack"
    else:
        cfg = munich_pipeline_config(compute_dtype="bfloat16")
        fcn = FCN8s(num_classes=3, compute_dtype=jnp.bfloat16)
        mono = Monodepth(encoder="vgg", compute_dtype=jnp.bfloat16)
        wf, wm = ".bench_weights/fcn8s.msgpack", ".bench_weights/monodepth.msgpack"

    h, w = cfg.input_height, cfg.input_width
    fp = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3), jnp.float32))
    mp = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, 256, 512, 3), jnp.float32))
    if os.path.exists(wf) and os.path.exists(wm):
        fp = weights_lib.load_params(fp, wf)
        mp = weights_lib.load_params(mp, wm)

    pool, _, _, _, _ = scene_pool(B, 1024, 2048, seed=0)
    frames = jax.device_put(jnp.asarray(pool))

    def timeit(name, f, *xs, n=8):
        y = f(*xs)
        _ = np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])
        best = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            y = None
            for _j in range(n):
                y = f(*xs)
            _ = np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{name:34s} {best*1e3:8.2f} ms/batch-{B}", flush=True)
        return y

    cam, s_w = _scaled_camera(cfg, jnp.float32(cfg.camera.focal))
    mult = jnp.float32(2048.0) * s_w

    small = timeit(
        "resize",
        jax.jit(lambda fr: jax.vmap(lambda f: resize_clip_u8(f.astype(jnp.float32), (h, w)))(fr)),
        frames,
    )

    logits = timeit("fcn forward", jax.jit(lambda p, x: fcn.apply(p, x)), fp, small)

    def masks_fn(lg):
        pr = jax.nn.softmax(lg, axis=-1)
        return pr[..., 0] > 0.5, pr[..., 1] > 0.5

    road_m, fence_m = timeit("softmax+thresholds", jax.jit(masks_fn), logits)

    if cfg.monodepth.flip_average:
        def mono_fn(p, x):
            norm = x.astype(jnp.float32) / 255.0
            fb = jnp.concatenate([norm, norm[:, :, ::-1, :]], axis=0)
            d = mono.apply(p, fb, method=mono.disp_left)
            prs = jnp.stack([d[:B], d[B:]], axis=1)
            return jax.vmap(flip_average_postprocess)(prs) * mult
    else:
        def mono_fn(p, x):
            return mono.apply(p, x.astype(jnp.float32) / 255.0, method=mono.disp_left) * mult

    disps = timeit("mono forward(+blend)", jax.jit(mono_fn), mp, small)

    pts = timeit(
        "reproject",
        jax.jit(lambda d: jax.vmap(lambda dd: camera_lib.reproject_disparity(dd, cam))(d)),
        disps,
    )

    def geom_fn(points3d, frame_small, road_mask):
        def one(p3, fs, rm):
            road = pcl.from_dense(p3, fs[:, :, ::-1], rm)
            road, road_plane = _denoise_road(road, cfg, grid_hw=(h, w))
            l, r, found = pcl.road_endpoints(
                road, cfg.depth - cfg.rw_depth_offset, cfg.rw_slab_halfwidth
            )
            return jnp.abs(l[0] - r[0])

        return jax.vmap(one)(points3d, frame_small, road_mask)

    timeit("geometry (road+rw)", jax.jit(geom_fn), pts, small, road_m)

    timeit(
        "overlay",
        jax.jit(
            lambda fs, rm, fm: jax.vmap(
                lambda a, b, c: segmentation_overlay(
                    a, b, c, cfg.segmenter.road_rgba, cfg.segmenter.fence_rgba
                )
            )(fs, rm, fm)
        ),
        small, road_m, fence_m,
    )

    pipe = SemanticDepthPipeline(cfg, fp, mp, fcn=fcn, mono=mono)
    timeit("FUSED process_batch", lambda fr: pipe.process_batch(fr), frames)


if __name__ == "__main__":
    main()
