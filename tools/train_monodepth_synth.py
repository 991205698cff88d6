"""Monodepth training convergence proof on synthetic stereo with KNOWN
disparity: generates textured stereo pairs whose left view is the right view
warped by an analytic ground-plane disparity field, trains the full-size
network from random init with the published objective
(train/monodepth_trainer.py), and reports the correlation + pixel error
between the predicted and true disparity on a held-out pair.

The reference never shipped training code (monodepth_lib/README.md vendors
it by name); this demonstrates the rebuilt objective actually learns metric
structure, not just that the loss decreases.

Usage: PYTHONPATH=. python tools/train_monodepth_synth.py [--steps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def smooth_texture(rng, h, w, octaves=6):
    """Multi-octave smooth noise: enough gradient structure for SSIM/L1."""
    img = np.zeros((h, w, 3), np.float32)
    for o in range(octaves):
        hs, ws = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        base = rng.uniform(0, 1, (hs, ws, 3)).astype(np.float32)
        ys = np.linspace(0, hs - 1, h)
        xs = np.linspace(0, ws - 1, w)
        yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
        yf, xf = (ys - yi)[:, None, None], (xs - xi)[None, :, None]
        yi2, xi2 = np.minimum(yi + 1, hs - 1), np.minimum(xi + 1, ws - 1)
        up = (
            base[yi][:, xi] * (1 - yf) * (1 - xf)
            + base[yi][:, xi2] * (1 - yf) * xf
            + base[yi2][:, xi] * yf * (1 - xf)
            + base[yi2][:, xi2] * yf * xf
        )
        img += up / (2 ** (octaves - o))
    img /= img.max()
    return img


def disparity_field(h, w, slope):
    """Ground-plane-like normalized disparity: 0 above the horizon, ramping
    to ``slope`` at the bottom (values inside the net's (0, 0.3) range)."""
    horizon = int(h * 0.4)
    ys = np.arange(h, dtype=np.float32)
    ramp = np.clip((ys - horizon) / (h - horizon), 0, 1) * slope + 0.01
    return np.broadcast_to(ramp[:, None], (h, w)).astype(np.float32)


def make_pair(rng, h, w, slope):
    """right = texture; left(y, x) = right(y, x - d_px(y, x)) (bilinear)."""
    right = smooth_texture(rng, h, w)
    d_norm = disparity_field(h, w, slope)
    d_px = d_norm * w
    xs = np.arange(w, dtype=np.float32)[None, :]
    src = xs - d_px  # sample position in the right image
    x0 = np.clip(np.floor(src).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    f = (src - x0)[..., None]
    rows = np.arange(h)[:, None]
    left = right[rows, x0] * (1 - f) + right[rows, x1] * f
    return left.astype(np.float32), right, d_norm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--width_mult", type=float, default=1.0,
                   help="channel width multiplier (tiny smoke runs)")
    p.add_argument("--mesh", action="store_true",
                   help="dp-shard the stereo batch over all local devices "
                        "(the average_gradients.py tower analog)")
    args = p.parse_args()

    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()
    import jax.numpy as jnp

    from semantic_depth_tpu.train.monodepth_trainer import (
        MonodepthTrainConfig,
        MonodepthTrainer,
    )

    h, w = args.height, args.width
    rng = np.random.default_rng(0)
    pairs = [make_pair(rng, h, w, slope=rng.uniform(0.08, 0.2)) for _ in range(24)]
    held_l, held_r, held_d = make_pair(rng, h, w, slope=0.15)

    mesh = None
    if args.mesh:
        from semantic_depth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    model = None
    if args.width_mult != 1.0:
        from semantic_depth_tpu.models import Monodepth

        model = Monodepth(encoder="vgg", width_mult=args.width_mult)
    trainer = MonodepthTrainer(
        MonodepthTrainConfig(learning_rate=1e-4), model=model, input_hw=(h, w),
        mesh=mesh,
    )
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, len(pairs), size=args.batch)
        left = jnp.asarray(np.stack([pairs[i][0] for i in idx]))
        right = jnp.asarray(np.stack([pairs[i][1] for i in idx]))
        m = trainer.train_batch(left, right)
        if step % 25 == 0 or step == args.steps - 1:
            print(
                f"step {step:4d}: loss {m['loss']:.4f} "
                f"(im {m['image_loss']:.4f} lr {m['lr_loss']:.4f}) "
                f"[{time.time() - t0:.0f}s]",
                flush=True,
            )

    # held-out evaluation: predicted left disparity vs ground truth
    disps = trainer.model.apply(trainer.params, jnp.asarray(held_l[None]))
    pred = np.asarray(disps[0][0, :, :, 0])
    mask = held_d > 0.02  # below the horizon, where disparity is informative
    corr = np.corrcoef(pred[mask], held_d[mask])[0, 1]
    mae_px = float(np.abs(pred[mask] - held_d[mask]).mean() * w)
    print(
        f"held-out: corr(pred, true)={corr:.3f}, MAE {mae_px:.2f} px "
        f"(true range {held_d[mask].min() * w:.1f}..{held_d[mask].max() * w:.1f} px)"
    )


if __name__ == "__main__":
    main()
