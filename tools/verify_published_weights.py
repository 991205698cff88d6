"""One-command verification of the reference's PUBLISHED weight sets
(VERDICT r3 #8): download -> sha256 record -> convert -> live-TF golden ->
one frame end-to-end. This container has no egress, so the command is built
and mock-tested now (tests/test_verify_weights.py) and closes the remaining
parity unknowns the day a networked run exists:

    PYTHONPATH=.:$PYTHONPATH python tools/verify_published_weights.py \
        --workdir weights/ --model model_cityscapes

Steps (each recorded in <workdir>/VERIFY_REPORT.json):

1. fetch + extract the monodepth checkpoint zip (the reference's
   models/get_monodepth_model.sh path) and the Udacity VGG16 SavedModel
   (fcn8s/helper.py:60-94 path); sha256 every checkpoint file — the digests
   to pin in models/WEIGHTS.md;
2. convert the monodepth checkpoint to flax params (models/weights.py);
3. GOLDEN: execute the downloaded variables through the live-TF twin of the
   published architecture (tools/tf_twins.py) and assert the flax forward
   reproduces the disparity pyramid (atol 1e-4) — the same harness the
   random-weight goldens in tests/test_reference_oracle.py Part D run in CI;
4. graft the VGG16 encoder onto FCN8s (the reference trains its decoder from
   scratch — fcn.py:82-95/159-215 — so only the encoder is published);
5. run ONE synthetic frame through the full fused pipeline with the
   converted weights and record dist_rw (smoke: the end-to-end program
   accepts the published weights).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _digest_prefix(prefix: str) -> dict:
    """sha256 of every file of a TF checkpoint prefix (index + data shards)."""
    d = {}
    folder, base = os.path.split(prefix)
    for name in sorted(os.listdir(folder or ".")):
        if name.startswith(base + "."):
            p = os.path.join(folder, name)
            d[name] = _sha256(p)
    return d


def verify(workdir: str, model_name: str = "model_cityscapes",
           encoder: str | None = None, width_mult: float = 1.0,
           fc_channels: int = 4096, skip_vgg: bool = False,
           fetcher=None, log=print) -> dict:
    """Run the whole verification; returns the report dict (also written to
    <workdir>/VERIFY_REPORT.json). Raises OSError when offline."""
    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.models import FCN8s, Monodepth, get_weights
    from semantic_depth_tpu.models import weights as W

    report = {"model": model_name, "steps": {}, "digests": {}, "ok": True}

    def step(name, ok, **info):
        report["steps"][name] = {"ok": bool(ok), **info}
        report["ok"] = report["ok"] and bool(ok)
        log(f"[{'PASS' if ok else 'FAIL'}] {name}"
            + (f" {info}" if info else ""))

    if encoder is None:
        encoder = "resnet50" if "resnet" in model_name else "vgg"

    # 1. download + digest
    t0 = time.time()
    prefix = get_weights.get_monodepth_model(model_name, workdir, fetcher=fetcher)
    report["digests"]["monodepth"] = _digest_prefix(prefix)
    step("download_monodepth", True, prefix=prefix, s=round(time.time() - t0, 1))

    # 2. convert to flax params
    mono = Monodepth(encoder=encoder, width_mult=width_mult)
    template = mono.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 128, 256, 3), jnp.float32)
    )
    converted = W.convert_monodepth_checkpoint(prefix, encoder=encoder)
    params = W.as_jax_params(template, converted)
    mono_msgpack = os.path.join(workdir, f"{model_name}.msgpack")
    W.save_params(params, mono_msgpack)
    step("convert_monodepth", True, msgpack=mono_msgpack)

    # 3. live-TF golden on the REAL weights
    try:
        from tools.tf_twins import TFMonodepth

        tf_vars = W._read_tf_checkpoint(prefix)
        twin = TFMonodepth(width_mult=width_mult, variables=tf_vars)
        rng = np.random.default_rng(7)
        x = rng.uniform(0.0, 1.0, size=(2, 256, 512, 3)).astype(np.float32)
        tf_disps = twin.forward(x, encoder)
        jx_disps = mono.apply(params, jnp.asarray(x))
        max_err = max(
            float(np.abs(np.asarray(j) - t).max())
            for j, t in zip(jx_disps, tf_disps)
        )
        step("tf_golden_monodepth", max_err <= 1e-4, max_abs_err=max_err)
    except ImportError as e:
        step("tf_golden_monodepth", False, skipped=f"tensorflow unavailable: {e}")

    # 4. VGG16 encoder graft (the FCN decoder is not published by URL —
    # reference distributes trained sem-seg models by email/GDrive only,
    # models/get_sem_seg_models.md)
    fcn = FCN8s(num_classes=3, width_mult=width_mult, fc_channels=fc_channels)
    fcn_template = fcn.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.float32)
    )
    if skip_vgg:
        fcn_params = fcn_template
        step("vgg_encoder_graft", True, skipped="--skip_vgg (random encoder)")
    else:
        vgg_dir = get_weights.maybe_download_pretrained_vgg(workdir, fetcher=fetcher)
        ckpt = os.path.join(vgg_dir, "variables", "variables")
        report["digests"]["vgg"] = _digest_prefix(ckpt)
        fcn_params, loaded = W.graft_partial(
            fcn_template, W.convert_vgg_checkpoint(ckpt)
        )
        step("vgg_encoder_graft", len(loaded) >= 15, loaded_layers=len(loaded))

    # 5. one frame end-to-end through the fused pipeline
    from semantic_depth_tpu.config import munich_pipeline_config
    from semantic_depth_tpu.pipeline import SemanticDepthPipeline
    from semantic_depth_tpu.utils.bench_scenes import render_scene

    cfg = munich_pipeline_config()
    pipe = SemanticDepthPipeline(cfg, fcn_params, params, fcn=fcn, mono=mono)
    frame, _, _, rw_true, _ = render_scene(
        np.random.default_rng(3), cfg.input_height * 2, cfg.input_width * 2,
        camera=cfg.camera, disparity_mult=cfg.disparity_multiplier or 2048.0,
    )
    out = pipe.process_frame(jnp.asarray(frame))
    rw = float(np.asarray(out.dist_rw))
    # smoke only: the program must RUN with published weights; rw accuracy
    # additionally needs the trained FCN decoder (email-distributed upstream,
    # models/get_sem_seg_models.md), so a nan here is reported, not failed
    step("frame_e2e", True, dist_rw=rw, analytic_rw=float(rw_true),
         note="smoke: program accepts published weights; accuracy needs the "
              "trained FCN decoder (email-distributed upstream)")

    os.makedirs(workdir, exist_ok=True)
    out_path = os.path.join(workdir, "VERIFY_REPORT.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    log(f"report: {out_path}  ok={report['ok']}")
    return report


def main(argv=None, fetcher=None) -> int:
    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workdir", default="weights")
    p.add_argument("--model", default="model_cityscapes")
    p.add_argument("--encoder", default=None, choices=(None, "vgg", "resnet50"))
    p.add_argument("--skip_vgg", action="store_true",
                   help="skip the Udacity VGG16 download/graft")
    # dev knobs: let the offline mocked test drive the full orchestration
    # with a width-scaled twin checkpoint
    p.add_argument("--width_mult", type=float, default=1.0, help=argparse.SUPPRESS)
    p.add_argument("--fc_channels", type=int, default=4096, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    try:
        report = verify(
            args.workdir, args.model, encoder=args.encoder,
            width_mult=args.width_mult, fc_channels=args.fc_channels,
            skip_vgg=args.skip_vgg, fetcher=fetcher,
        )
    except OSError as e:
        print(f"Download failed ({e}). This environment may be offline — run "
              "this command from a connected machine; every other step is "
              "automatic.")
        return 2
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
