"""Deep native-mode fine-tune with a recorded accuracy-vs-steps curve.

VERDICT r3 item 3: the native (input_s2d, 1024x2048) weight sets shipped at a
time-boxed 2200/3200 steps and landed at rw MAE ~0.07-0.09 m against the
2-3 cm rasterization floor of the analytic scenes (DESIGN.md 4c). This tool
closes that gap offline (NEVER inside bench timing):

1. ensures the dense full-res sets (the native warm start) exist;
2. trains the native FCN-8s set (segmentation converges early; fixed budget);
3. trains the native monodepth set DEEP, pausing every ``--eval_every`` steps
   to run the REAL fused pipeline (bf16 compute, flip_average off — exactly
   the bench's native leg) over a held-out scene pool and record
   ``rw_mae_m`` / ``f2f_mae_m`` / ``finite_frac``;
4. keeps the best-rw-MAE params as ``.bench_weights/monodepth_native.msgpack``
   and writes the whole curve to ``docs/NATIVE_MAE_CURVE.json`` (committed —
   the evidence VERDICT asked for) + a copy next to the weights.

The reference's accuracy protocol being mirrored is the hand-measured Munich
MAE sweep (reference semantic_depth.py:903-937); the held-out pool is the
bench's own seed-0 scene pool so the curve and BENCH_r04's
``full_res_rw_mae_m`` are the same measurement.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_bench_weights import (  # noqa: E402
    FCN_NATIVE_PHASES,
    FULL_HW,
    MONO_PHASES,
    TRAIN_HW,
    bench_weight_paths,
    ensure_bench_weights,
    train_fcn,
    train_mono,
)

CURVE_DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "NATIVE_MAE_CURVE.json",
)
HEADLINE_CURVE_DOC = os.path.join(
    os.path.dirname(CURVE_DOC), "HEADLINE_MAE_CURVE.json"
)
# SWA window: uniform average of the last K eval-point checkpoints
SWA_K = 3


def _native_pipeline(fcn_params, mono_params):
    import jax.numpy as jnp

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline

    cfg = munich_pipeline_config(
        compute_dtype="bfloat16", input_height=1024, input_width=2048
    )
    cfg = dataclasses.replace(
        cfg,
        monodepth=dataclasses.replace(cfg.monodepth, flip_average=False),
        # the estimator bench.py's native leg reports (cfg_fr_native) —
        # selection must optimize the metric the record carries
        rw_estimator="plane_edge",
    )
    fcn = FCN8s(num_classes=cfg.segmenter.num_classes,
                compute_dtype=jnp.bfloat16, input_s2d=True)
    mono = Monodepth(encoder=cfg.monodepth.encoder,
                     compute_dtype=jnp.bfloat16, input_s2d=True)
    return SemanticDepthPipeline(cfg, fcn_params, mono_params, fcn=fcn, mono=mono)


def _eval(pipe, batches, rw_true, f2f_true):
    outs = [pipe.process_batch(b) for b in batches]
    rw = np.concatenate([np.asarray(o.dist_rw) for o in outs])
    f2f = np.concatenate([np.asarray(o.dist_f2f) for o in outs])
    fin = np.isfinite(rw)
    mae = float(np.abs(rw[fin] - rw_true[: rw.size][fin]).mean()) if fin.any() else None
    ff = np.isfinite(f2f)
    fmae = (
        float(np.abs(f2f[ff] - f2f_true[: f2f.size][ff]).mean()) if ff.any() else None
    )
    return float(fin.mean()), mae, fmae


def run_headline(args, log):
    """VERDICT r4 item 3: the knee treatment for the HEADLINE 256x512 sets.

    Retrains the headline monodepth (the exact ``MONO_PHASES`` recipe
    ``ensure_bench_weights`` uses) with an eval hook that runs the REAL
    headline pipeline (dense 256x512 nets, bf16, default estimator — the
    program bench.py's headline ``rw_mae_m`` is measured on) over a held-out
    seed-``--select_seed`` full-res scene pool, records the MAE-vs-steps
    curve, and keeps the best checkpoint as ``.bench_weights/monodepth.msgpack``
    only when it beats the cached set (evaluated as the curve's step-0
    baseline). bench.py reports on its own disjoint seed-0 pool."""
    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.models import weights as weights_lib
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline
    from semantic_depth_tpu.utils.bench_scenes import scene_pool

    t_start = time.time()
    # the cached headline sets are both the FCN we eval with and the
    # step-0 baseline the retrain must beat
    fcn_path, mono_path = ensure_bench_weights(
        args.out_dir, seed=args.seed, log=log
    )

    fcn_m = FCN8s(num_classes=3)
    fcn_t = fcn_m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.float32))
    fcn_params = weights_lib.load_params(fcn_t, fcn_path)
    mono_m = Monodepth(encoder="vgg")
    mono_t = mono_m.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3), jnp.float32)
    )
    mono_cached = weights_lib.load_params(mono_t, mono_path)

    cfg = munich_pipeline_config(compute_dtype="bfloat16")
    fcn = FCN8s(num_classes=cfg.segmenter.num_classes, compute_dtype=jnp.bfloat16)
    mono = Monodepth(encoder=cfg.monodepth.encoder, compute_dtype=jnp.bfloat16)
    pipe = SemanticDepthPipeline(cfg, fcn_params, mono_cached, fcn=fcn, mono=mono)

    log("rendering held-out eval pool ...")
    pool, _, _, rw_true, f2f_true = scene_pool(
        args.eval_scenes, *FULL_HW, seed=args.select_seed
    )
    eval_batches = [
        jax.device_put(jnp.asarray(pool[i : i + 8]))
        for i in range(0, args.eval_scenes, 8)
    ]
    del pool

    curve = []
    fin0, mae0, fmae0 = _eval(pipe, eval_batches, rw_true, f2f_true)
    log(f"  [curve] step 0 (cached set): rw_mae {round(mae0, 4)} m, "
        f"f2f_mae {round(fmae0, 4)} m, finite {fin0:.3f}")
    curve.append({"step": 0, "rw_mae_m": mae0, "f2f_mae_m": fmae0,
                  "finite_frac": fin0, "note": "cached headline set"})
    best = {"mae": mae0 if mae0 is not None else float("inf"), "step": 0}

    def hook(params, step):
        pipe.mono_params = params
        try:
            fin, mae, fmae = _eval(pipe, eval_batches, rw_true, f2f_true)
        except Exception as e:  # eval must never kill the training run
            log(f"  eval at step {step} failed: {type(e).__name__}: {e}")
            return
        log(f"  [curve] step {step}: rw_mae {mae if mae is None else round(mae, 4)} m, "
            f"f2f_mae {fmae if fmae is None else round(fmae, 4)} m, finite {fin:.3f}")
        curve.append({"step": step, "rw_mae_m": mae, "f2f_mae_m": fmae,
                      "finite_frac": fin})
        if mae is not None and mae < best["mae"]:
            best["mae"] = mae
            best["step"] = step
            weights_lib.save_params(params, mono_path)
            log(f"  new best at step {step}; saved {mono_path}")

    hw, n_scenes, t_batch, _ = MONO_PHASES[0]
    assert hw == TRAIN_HW
    log(f"training headline monodepth ({args.mono_steps} steps at "
        f"{hw[0]}x{hw[1]} b{t_batch}, eval every {args.eval_every}) ...")
    train_mono(
        [(hw, n_scenes, t_batch, args.mono_steps)],
        seed=args.seed, lr=args.lr, log=log,
        hook=hook, hook_every=args.eval_every,
    )

    out = {
        "protocol": "fused HEADLINE pipeline (dense 256x512 nets, bf16, "
                    f"default estimator) over {args.eval_scenes} held-out "
                    f"seed-{args.select_seed} scenes at 1024x2048; rw/f2f MAE "
                    "vs analytic widths (reference protocol: "
                    "semantic_depth.py:903-937). Step 0 = the previously "
                    "cached headline set; the best checkpoint replaces "
                    ".bench_weights/monodepth.msgpack only when it beats it. "
                    "Selection pool is disjoint from the bench's seed-0 "
                    "report pool.",
        "select_seed": args.select_seed,
        "mono_steps": args.mono_steps,
        "batch": t_batch,
        "lr": args.lr,
        "best_step": best["step"],
        "best_rw_mae_m": None if best["mae"] == float("inf") else best["mae"],
        "wall_s": round(time.time() - t_start, 1),
        "curve": curve,
    }
    os.makedirs(os.path.dirname(HEADLINE_CURVE_DOC), exist_ok=True)
    with open(HEADLINE_CURVE_DOC, "w") as f:
        json.dump(out, f, indent=1)
    log(f"curve written to {HEADLINE_CURVE_DOC}; best rw MAE "
        f"{out['best_rw_mae_m']} m at step {out['best_step']}")


def main():
    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out_dir", default=".bench_weights")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mono_steps", type=int, default=9600)
    p.add_argument("--fcn_steps", type=int, default=FCN_NATIVE_PHASES[0][3])
    p.add_argument("--eval_every", type=int, default=800)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--eval_scenes", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    # Model selection must not happen on the pool the bench reports on
    # (ADVICE r4: selecting the best checkpoint by seed-0 MAE and then
    # reporting seed-0 MAE is optimistically biased). The curve/selection
    # pool uses --select_seed; bench.py reports on its own seed-0 pool.
    p.add_argument("--select_seed", type=int, default=1)
    p.add_argument("--report_seed0", action="store_true",
                   help="after training, eval the final cached native set on "
                        "the bench's seed-0 pool (report-only; cannot bias "
                        "selection, which uses --select_seed)")
    p.add_argument("--headline", action="store_true",
                   help="curve the HEADLINE 256x512 monodepth set instead "
                        "of the native full-res set (VERDICT r4 item 3)")
    args = p.parse_args()

    def log_(*a):
        print(*a, flush=True)

    if args.headline:
        if args.mono_steps == 9600:  # native default; headline recipe is 8000
            args.mono_steps = MONO_PHASES[0][3]
        run_headline(args, log_)
        return

    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.models import FCN8s, Monodepth
    from semantic_depth_tpu.models import weights as weights_lib
    from semantic_depth_tpu.utils.bench_scenes import scene_pool

    def log(*a):
        print(*a, flush=True)

    t_start = time.time()

    # 1. dense full-res warm starts (trains monodepth_fullres if absent)
    fr_fcn_path, fr_mono_path = ensure_bench_weights(
        args.out_dir, seed=args.seed, full_res=True, log=log
    )
    fcn_path, mono_path = bench_weight_paths(args.out_dir, native=True)

    def load_fcn(path, input_s2d):
        m = FCN8s(num_classes=3, input_s2d=input_s2d)
        t = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.float32))
        return weights_lib.load_params(t, path)

    def load_mono(path, input_s2d):
        m = Monodepth(encoder="vgg", input_s2d=input_s2d)
        hw = (256, 512) if input_s2d else (128, 256)
        t = m.init(jax.random.PRNGKey(1), jnp.zeros((2,) + hw + (3,), jnp.float32))
        return weights_lib.load_params(t, path)

    # 2. native FCN set
    if not os.path.exists(fcn_path):
        log(f"training native FCN-8s ({args.fcn_steps} steps) ...")
        fcn_params, _ = train_fcn(
            [(FULL_HW, 24, args.batch, args.fcn_steps)],
            seed=args.seed, init_params=load_fcn(fr_fcn_path, False),
            input_s2d=True, lr=args.lr, log=log,
        )
        weights_lib.save_params(fcn_params, fcn_path)
        log(f"saved {fcn_path}")
        del fcn_params
        gc.collect()
        jax.clear_caches()

    # 3. deep native monodepth with the accuracy curve
    log("rendering held-out eval pool ...")
    pool, _, _, rw_true, f2f_true = scene_pool(
        args.eval_scenes, *FULL_HW, seed=args.select_seed
    )
    fcn_native = load_fcn(fcn_path, True)
    # mono_params filled in by the hook before the first process_batch call
    pipe = _native_pipeline(fcn_native, None)
    eval_batches = [
        jax.device_put(jnp.asarray(pool[i : i + args.batch]))
        for i in range(0, args.eval_scenes, args.batch)
    ]
    del pool

    curve = []
    best = {"mae": float("inf")}
    # step-0 baseline: the CACHED native set must not regress — a retrain
    # whose every checkpoint evals worse keeps the cache untouched
    if os.path.exists(mono_path):
        pipe.mono_params = load_mono(mono_path, True)
        fin0, mae0, fmae0 = _eval(pipe, eval_batches, rw_true, f2f_true)
        log(f"  [curve] step 0 (cached set): rw_mae "
            f"{mae0 if mae0 is None else round(mae0, 4)} m, finite {fin0:.3f}")
        curve.append({"step": 0, "rw_mae_m": mae0, "f2f_mae_m": fmae0,
                      "finite_frac": fin0, "note": "cached native set"})
        if mae0 is not None:
            best.update(mae=mae0, step=0, kind="cached")

    # SWA window: a single eval-point checkpoint is selected at its
    # selection-pool noise minimum, so its seed-1 number is optimistic and
    # transfers poorly (r4's 0.0226 seed-1 pick scored 0.0365 on the bench's
    # seed-0 pool). A uniform average of the last K eval-point checkpoints
    # (stochastic weight averaging over the 800-step sampling grid) smooths
    # that cherry-pick variance; both the raw and the averaged candidate are
    # evaluated, and whichever wins on the (held-out) selection pool is kept.
    swa_window = []

    def _swa_params():
        n = len(swa_window)
        return jax.tree_util.tree_map(
            lambda *xs: functools.reduce(np.add, xs) / np.float32(n),
            *swa_window,
        )

    def _try_candidate(cand, step, kind, fields):
        # device_put once: a host-numpy SWA tree left as-is would re-upload
        # all ~500 MB of params on EVERY eval dispatch over this relay
        pipe.mono_params = jax.device_put(cand)
        fin, mae, fmae = _eval(pipe, eval_batches, rw_true, f2f_true)
        tag = "" if kind == "raw" else f" [{kind}]"
        log(f"  [curve] step {step}{tag}: rw_mae "
            f"{mae if mae is None else round(mae, 4)} m, "
            f"f2f_mae {fmae if fmae is None else round(fmae, 4)} m, "
            f"finite {fin:.3f}")
        prefix = "" if kind == "raw" else "swa_"
        fields[f"{prefix}rw_mae_m"] = mae
        fields[f"{prefix}f2f_mae_m"] = fmae
        fields[f"{prefix}finite_frac"] = fin
        if mae is not None and mae < best["mae"]:
            best.update(mae=mae, step=step, kind=kind)
            weights_lib.save_params(cand, mono_path)
            log(f"  new best ({kind}) at step {step}; saved {mono_path}")

    def hook(params, step):
        fields = {"step": step}
        try:
            _try_candidate(params, step, "raw", fields)
            swa_window.append(jax.device_get(params))
            if len(swa_window) > SWA_K:
                swa_window.pop(0)
            if len(swa_window) >= 2:
                _try_candidate(_swa_params(), step, f"swa{len(swa_window)}",
                               fields)
        except Exception as e:  # eval must never kill the training run
            log(f"  eval at step {step} failed: {type(e).__name__}: {e}")
        curve.append(fields)

    log(f"training native monodepth ({args.mono_steps} steps, "
        f"eval every {args.eval_every}) ...")
    train_mono(
        [(FULL_HW, 24, args.batch, args.mono_steps)],
        seed=args.seed, init_params=load_mono(fr_mono_path, False),
        input_s2d=True, lr=args.lr, log=log,
        hook=hook, hook_every=args.eval_every,
    )

    out = {
        "protocol": "fused native pipeline (bf16, flip_average=False) over "
                    f"{args.eval_scenes} held-out seed-{args.select_seed} "
                    "scenes at 1024x2048; rw/f2f MAE vs analytic widths "
                    "(reference protocol: semantic_depth.py:903-937 Munich "
                    "MAE sweep). Selection pool is disjoint from the bench's "
                    "seed-0 report pool (no selection bias in the recorded "
                    "full_res_rw_mae_m).",
        "select_seed": args.select_seed,
        "mono_steps": args.mono_steps,
        "fcn_steps": args.fcn_steps,
        "batch": args.batch,
        "lr": args.lr,
        "best_step": best.get("step"),
        "best_kind": best.get("kind"),
        "best_rw_mae_m": None if best["mae"] == float("inf") else best["mae"],
        "wall_s": round(time.time() - t_start, 1),
        "curve": curve,
    }
    # Report-only: the final cached set's MAE on the bench's seed-0 report
    # pool (exactly what BENCH full_res_rw_mae_m will carry). Runs AFTER
    # selection closed, so it cannot bias it — it just says now, not at the
    # next bench run, whether the <=0.03 m clause is met.
    if args.report_seed0 and os.path.exists(mono_path):
        try:
            pool0, _, _, rw0, f2f0 = scene_pool(32, *FULL_HW, seed=0)
            b0 = [
                jax.device_put(jnp.asarray(pool0[i : i + args.batch]))
                for i in range(0, 32, args.batch)
            ]
            del pool0
            pipe.mono_params = load_mono(mono_path, True)
            fin_r, mae_r, fmae_r = _eval(pipe, b0, rw0, f2f0)
            log(f"  [report] seed-0 bench pool: rw_mae "
                f"{mae_r if mae_r is None else round(mae_r, 4)} m, "
                f"finite {fin_r:.3f}")
            out["seed0_report_rw_mae_m"] = mae_r
        except Exception as e:
            log(f"seed-0 report failed: {type(e).__name__}: {e}")

    os.makedirs(os.path.dirname(CURVE_DOC), exist_ok=True)
    for path in (CURVE_DOC, os.path.join(args.out_dir, "native_mae_curve.json")):
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    log(f"curve written to {CURVE_DOC}; best rw MAE "
        f"{out['best_rw_mae_m']} m at step {out['best_step']}")


if __name__ == "__main__":
    main()
