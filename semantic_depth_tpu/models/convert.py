"""Weight-conversion CLI: TF1 checkpoints -> native .msgpack weights.

Usage:
  python -m semantic_depth_tpu.models.convert fcn \
      --checkpoint models/sem_seg/100-Epochs-roborace750/variables \
      --out models/sem_seg/100-Epochs-roborace750/fcn8s.msgpack

  python -m semantic_depth_tpu.models.convert monodepth \
      --checkpoint models/monodepth/model_cityscapes/model_cityscapes \
      --encoder vgg --out models/monodepth/monodepth.msgpack

Covers the reference's three published weight sets (SURVEY.md §5): the
trained FCN SavedModel checkpoints (fcn.py:136-154), the monodepth ckpts
(models/get_monodepth_model.sh), and — via the FCN path — the Udacity VGG16
initialization weights (helper.py:60-94). See models/WEIGHTS.md.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from . import FCN8s, Monodepth
from . import weights as W


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert TF1 checkpoints to native weights.")
    p.add_argument("model", choices=["fcn", "monodepth"])
    p.add_argument("--checkpoint", required=True,
                   help="TF checkpoint prefix or directory (tf.train.latest_checkpoint)")
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--encoder", default="vgg", help="monodepth encoder: vgg | resnet50")
    p.add_argument("--use_deconv", action="store_true",
                   help="checkpoint was trained with the transposed-conv decoder")
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=512)
    args = p.parse_args(argv)

    import os

    import tensorflow as tf

    ckpt = args.checkpoint
    if os.path.isdir(ckpt):
        latest = tf.train.latest_checkpoint(ckpt)
        if latest is not None:
            ckpt = latest

    h, w = args.input_height, args.input_width
    if args.model == "fcn":
        model = FCN8s(num_classes=args.num_classes)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
        converted = W.convert_fcn_checkpoint(ckpt)
    else:
        model = Monodepth(encoder=args.encoder, use_deconv=args.use_deconv)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3), jnp.float32))
        converted = W.convert_monodepth_checkpoint(
            ckpt, encoder=args.encoder, use_deconv=args.use_deconv
        )

    params = W.as_jax_params(template, converted)
    W.save_params(params, args.out)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.out} ({n/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
