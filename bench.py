"""End-to-end throughput benchmark: 1024x2048 frames -> road-width scalars.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference pipeline's 0.6375 s/frame (~1.57 fps) end-to-end on
its single GPU (thesis Tables 19/21; BASELINE.md). vs_baseline = fps / 1.57.

Methodology: full-size FCN-8s + monodepth (bf16 MXU compute, f32 geometry),
streaming-throughput style — each frame is uploaded (real H2D transfer), all
device work for frame N+1 is dispatched while N is in flight, and every
result scalar is fetched. This mirrors the sequence entry point's
double-buffered path; per-frame artifacts are not written (the reference's
timed path also excluded save_data IO).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_FPS = 1.0 / 0.6375  # thesis Table 19


def main():
    import numpy as np

    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline

    cfg = munich_pipeline_config(compute_dtype="bfloat16")
    fcn = FCN8s(num_classes=cfg.segmenter.num_classes, compute_dtype=jnp.bfloat16)
    mono = Monodepth(encoder=cfg.monodepth.encoder, compute_dtype=jnp.bfloat16)
    h, w = cfg.input_height, cfg.input_width
    fcn_params = fcn.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    mono_params = mono.init(jax.random.PRNGKey(1), jnp.zeros((2, h, w, 3), jnp.float32))
    pipe = SemanticDepthPipeline(cfg, fcn_params, mono_params, fcn=fcn, mono=mono)

    rng = np.random.default_rng(0)
    n_buffers = 4
    frames = [
        rng.integers(0, 256, size=(1024, 2048, 3)).astype(np.float32)
        for _ in range(n_buffers)
    ]

    # warmup (compile + cache)
    out = pipe.process_frame(frames[0])
    _ = float(out.dist_rw)

    n_frames = 32
    t0 = time.time()
    results = []
    for i in range(n_frames):
        out = pipe.process_frame(frames[i % n_buffers])
        results.append((out.dist_rw, out.dist_f2f, out.rw_found))
    # fetch every scalar result (forces completion of all dispatched work)
    fetched = [(float(a), float(b), bool(c)) for a, b, c in results]
    dt = time.time() - t0
    fps = n_frames / dt

    print(
        json.dumps(
            {
                "metric": "end-to-end fps/chip, 1024x2048 frame -> road-width scalar",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
