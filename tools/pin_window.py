"""Pin the grid statistical-filter window at NATIVE 1024x2048 on-chip.

The (5, 21) window was tuned at 256x512 and verified converged on TPU at
512x1024 ((5,21) vs (7,31): finite-masks identical, keep-sets within 0.004%
— DESIGN.md). Full-res correctness rested on the shrinking-ball argument
(kNN balls shrink as grids densify, so a fixed window only becomes MORE of a
superset); this script replaces that extrapolation with a measured number at
1024x2048 (VERDICT r2 #6).

Method: a 3D-consistent scene (utils.bench_scenes — analytic disparity +
road mask, plus punched holes to stress sparse regions), keep-set of
statistical_outlier_filter_grid at (5, 21) vs larger windows. Mosaic's 16 MB
kernel stack rejects windows >= (7, 31) at this size (memory notes), so the
step-up candidates are (5, 31) and (7, 21).

Usage: PYTHONPATH=. python tools/pin_window.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.ops import neighbors
    from semantic_depth_tpu.utils.bench_scenes import render_scene, scaled_camera

    h, w = 1024, 2048
    cfg = munich_pipeline_config(input_height=h, input_width=w)
    rng = np.random.default_rng(0)
    _, labels, disp_norm, _, _ = render_scene(rng, h, w)
    cam = scaled_camera(cfg.camera, h, w)
    d_px = jnp.asarray(disp_norm * 2048.0 * (w / 512.0))
    pts = camera_lib.reproject_disparity(d_px, cam)
    road = labels == 7
    # punch holes so sparse neighborhoods exist (the regime where a larger
    # window could matter)
    holes = rng.uniform(size=road.shape) < 0.3
    valid = jnp.asarray(road & ~holes)

    k = cfg.road.stat_nb_neighbors
    ratio = cfg.road.stat_std_ratio
    base_window = tuple(cfg.road.stat_window)

    results = {}
    for window in [base_window, (5, 31), (7, 21), (7, 31)]:
        try:
            f = jax.jit(
                lambda p, v, win=window: neighbors.statistical_outlier_filter_grid(
                    p, v, k, ratio, win
                )
            )
            keep = np.asarray(f(pts, valid))
            results[window] = keep
            print(f"window {window}: keep {keep.sum()} / {int(np.asarray(valid).sum())}",
                  flush=True)
        except Exception as e:
            print(f"window {window}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    base = results.get(base_window)
    for window, keep in results.items():
        if window == base_window or base is None:
            continue
        diff = int((keep != base).sum())
        n = int(base.sum())
        print(
            f"(5,21) vs {window}: {diff} pixels differ "
            f"({100.0 * diff / max(n, 1):.4f}% of kept set)",
            flush=True,
        )


if __name__ == "__main__":
    main()
