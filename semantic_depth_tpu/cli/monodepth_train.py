"""Monodepth stereo-training entry point.

The reference vendors the monodepth trainer without shipping it (the
monodepth_parameters surface at semantic_depth.py:609-622 exposes its loss
weights); this CLI trains our rebuild on a directory of stereo pairs:

    left/<name>.png   right/<name>.png   (matched by filename)

Writes orbax step checkpoints plus a final monodepth.msgpack the pipeline
CLIs consume.
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob

import numpy as np


def main(argv=None):
    from ..runtime import setup_cache

    setup_cache()

    p = argparse.ArgumentParser(description="Train monodepth on stereo pairs.")
    p.add_argument("--data_dir", required=True,
                   help="directory containing left/ and right/ image folders")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--encoder", default="vgg")
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=512)
    p.add_argument("--alpha_image_loss", type=float, default=0.85)
    p.add_argument("--disp_gradient_loss_weight", type=float, default=0.1)
    p.add_argument("--lr_loss_weight", type=float, default=1.0)
    p.add_argument("--model_dir", default="models/monodepth_tpu")
    p.add_argument("--checkpoint_every", type=int, default=1000)
    p.add_argument("--dev_tiny", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..models import Monodepth
    from ..ops.resize import resize_clip_u8
    from ..train.monodepth_trainer import MonodepthTrainConfig, MonodepthTrainer
    from .common import imread_bgr

    lefts = sorted(glob(os.path.join(args.data_dir, "left", "*")))
    rights = sorted(glob(os.path.join(args.data_dir, "right", "*")))
    if not lefts or len(lefts) != len(rights):
        raise SystemExit(
            f"need matched left/right images under {args.data_dir} "
            f"(found {len(lefts)} / {len(rights)})"
        )

    hw = (args.input_height, args.input_width)
    model = Monodepth(encoder=args.encoder, width_mult=0.0625 if args.dev_tiny else 1.0)
    cfg = MonodepthTrainConfig(
        learning_rate=args.learning_rate,
        alpha_image_loss=args.alpha_image_loss,
        disp_gradient_loss_weight=args.disp_gradient_loss_weight,
        lr_loss_weight=args.lr_loss_weight,
    )
    trainer = MonodepthTrainer(cfg, model=model, input_hw=hw)

    def load(path):
        img = imread_bgr(path)[:, :, ::-1].astype(np.float32)  # RGB
        return np.asarray(resize_clip_u8(jnp.asarray(img), hw)) / 255.0

    os.makedirs(args.model_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for epoch in range(1, args.epochs + 1):
        order = rng.permutation(len(lefts))
        t0, losses = time.time(), []
        for i in range(0, len(order), args.batch_size):
            idx = order[i : i + args.batch_size]
            left = np.stack([load(lefts[j]) for j in idx])
            right = np.stack([load(rights[j]) for j in idx])
            m = trainer.train_batch(jnp.asarray(left), jnp.asarray(right))
            losses.append(m["loss"])
            if trainer.step % args.checkpoint_every == 0:
                trainer.save_checkpoint(os.path.join(args.model_dir, "orbax"))
        print(
            f"Epoch {epoch}/{args.epochs}: loss {np.mean(losses):.4f} "
            f"({time.time() - t0:.1f}s, step {trainer.step})"
        )
    trainer.save_checkpoint(os.path.join(args.model_dir, "orbax"))
    out = trainer.save_msgpack(os.path.join(args.model_dir, "monodepth.msgpack"))
    print(f"saved {out}")


if __name__ == "__main__":
    main()
