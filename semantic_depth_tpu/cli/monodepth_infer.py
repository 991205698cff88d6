"""Monodepth-only disparity inference (BASELINE.json config:
"monodepth-only disparity inference, Cityscapes-pretrained 512x256 resize
path").

Runs the flip-averaged disparity forward (the exact consumed surface of the
reference's DepthFrame, semantic_depth.py:656-678) over one image or a glob,
saving ``<name>_disp.png`` visualizations and optionally raw ``.npy``
disparities. Frames are batched per device dispatch.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np


def main(argv=None):
    from ..runtime import setup_cache

    setup_cache()

    p = argparse.ArgumentParser(description="Monodepth disparity inference.")
    p.add_argument("--input", required=True, help="image path or glob")
    p.add_argument("--monodepth_checkpoint", default="random",
                   help=".msgpack, TF ckpt prefix, or 'random'")
    p.add_argument("--monodepth_encoder", default="vgg")
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=512)
    p.add_argument("--out_dir", default="results/disparity")
    p.add_argument("--save_npy", action="store_true",
                   help="also save the raw post-processed disparity array")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dev_tiny", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models import Monodepth
    from ..models.monodepth import flip_average_postprocess
    from ..ops.resize import resize_clip_u8
    from . import common

    hw = (args.input_height, args.input_width)
    mono = Monodepth(
        encoder=args.monodepth_encoder, width_mult=0.0625 if args.dev_tiny else 1.0
    )
    params = common.load_mono_params(mono, args.monodepth_checkpoint, hw)

    @jax.jit
    def infer(mono_params, frames):  # (B, H0, W0, 3) BGR uint8/f32
        small = jax.vmap(lambda f: resize_clip_u8(f.astype(jnp.float32), hw))(frames)
        norm = small / 255.0
        b = norm.shape[0]
        flip = jnp.concatenate([norm, norm[:, :, ::-1, :]], axis=0)
        disp = mono.apply(mono_params, flip, method=mono.disp_left)
        pairs = jnp.stack([disp[:b], disp[b:]], axis=1)
        return jax.vmap(flip_average_postprocess)(pairs)

    paths = sorted(glob(args.input)) if any(c in args.input for c in "*?[") else [args.input]
    if not paths:
        raise SystemExit(f"no inputs match {args.input}")
    os.makedirs(args.out_dir, exist_ok=True)

    for i in range(0, len(paths), args.batch):
        chunk = paths[i : i + args.batch]
        frames = [common.imread_bgr(p_) for p_ in chunk]  # uint8 payloads
        if len({f.shape for f in frames}) != 1:
            # mixed resolutions: fall back to singles
            groups = [[f] for f in frames]
            names = [[p_] for p_ in chunk]
        else:
            groups, names = [frames], [chunk]
        for grp, nms in zip(groups, names):
            disps = np.asarray(infer(params, jnp.asarray(np.stack(grp))))
            for disp, src, frame in zip(disps, nms, grp):
                name = os.path.splitext(os.path.basename(src))[0]
                oh, ow = frame.shape[:2]  # already decoded — don't re-read
                common.save_disparity_png(disp, os.path.join(args.out_dir, name), oh, ow)
                if args.save_npy:
                    np.save(os.path.join(args.out_dir, f"{name}_disp.npy"), disp)
                print(f"{src} -> {args.out_dir}/{name}_disp.png")


if __name__ == "__main__":
    main()
