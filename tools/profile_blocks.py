"""Per-block timing of the two networks at native resolution — the full-res
fps budget planner (VERDICT r2 #1: find where the 1024x2048 milliseconds go).

Each block is cloned into a throwaway flax module (calling another module's
helper methods raises AssignSubModuleError, see memory notes) and timed as a
K-chained fori_loop inside one jit — single dispatch, single fetch, relay
overheads amortized.

Usage: PYTHONPATH=. python tools/profile_blocks.py [--h 1024 --w 2048 --batch 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import functools

from tools._profiling import chain  # noqa: E402
from tools._profiling import timed as _timed  # noqa: E402

timed = functools.partial(_timed, width=48)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=1024)
    p.add_argument("--w", type=int, default=2048)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--net", choices=["fcn", "mono", "both"], default="both")
    args = p.parse_args()

    from semantic_depth_tpu.runtime import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    H, W, B, K = args.h, args.w, args.batch, args.iters
    print(f"backend {jax.default_backend()}  {B}x{H}x{W} bf16, chained x{K}", flush=True)
    rng = np.random.default_rng(0)

    def conv_stack(cin, spec, x0_shape, name, relu=True):
        """spec: list of (k, cout, stride). Returns timed ms with TF/s."""

        class Probe(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i, (kk, cout, s) in enumerate(spec):
                    pp = (kk - 1) // 2
                    x = nn.Conv(cout, (kk, kk), strides=(s, s),
                                padding=((pp, pp), (pp, pp)),
                                dtype=jnp.bfloat16, name=f"c{i}")(x)
                    if relu:
                        x = nn.relu(x)
                return x

        m = Probe()
        x = jnp.asarray(rng.normal(size=x0_shape), jnp.bfloat16)
        params = m.init(jax.random.PRNGKey(0), x)

        flops = 0
        hh, ww, ci = x0_shape[1], x0_shape[2], x0_shape[3]
        for kk, cout, s in spec:
            hh, ww = hh // s, ww // s
            flops += 2 * kk * kk * ci * cout * hh * ww * x0_shape[0]
            ci = cout

        def op(p, xx, carry):
            return jnp.sum(m.apply(p, xx + carry * 0).astype(jnp.float32)) * 1e-9

        timed(name, chain(op, K), params, x, per=K, flops=flops)

    if args.net in ("fcn", "both"):
        print("--- FCN-8s encoder blocks ---", flush=True)
        conv_stack(3, [(3, 64, 1), (3, 64, 1)], (B, H, W, 3), "fcn block1 (3->64->64 @H)")
        conv_stack(64, [(3, 128, 1), (3, 128, 1)], (B, H // 2, W // 2, 64),
                   "fcn block2 (64->128x2 @H/2)")
        conv_stack(128, [(3, 256, 1), (3, 256, 1), (3, 256, 1)],
                   (B, H // 4, W // 4, 128), "fcn block3 (128->256x3 @H/4)")
        conv_stack(256, [(3, 512, 1), (3, 512, 1), (3, 512, 1)],
                   (B, H // 8, W // 8, 256), "fcn block4 (256->512x3 @H/8)")
        conv_stack(512, [(3, 512, 1), (3, 512, 1), (3, 512, 1)],
                   (B, H // 16, W // 16, 512), "fcn block5 (512x3 @H/16)")
        conv_stack(512, [(7, 4096, 1)], (B, H // 32, W // 32, 512), "fcn fc6 (7x7x512->4096)")
        conv_stack(4096, [(1, 4096, 1)], (B, H // 32, W // 32, 4096), "fcn fc7 (1x1x4096)")
        # single convs of block1 to separate the 3->64 stem from 64->64
        conv_stack(3, [(3, 64, 1)], (B, H, W, 3), "  conv1_1 alone (3->64)")
        conv_stack(64, [(3, 64, 1)], (B, H, W, 64), "  conv1_2 alone (64->64)")
        conv_stack(64, [(3, 128, 1)], (B, H // 2, W // 2, 64), "  conv2_1 alone (64->128)")
        conv_stack(128, [(3, 128, 1)], (B, H // 2, W // 2, 128), "  conv2_2 alone (128->128)")

    if args.net in ("mono", "both"):
        print("--- monodepth (vgg, s2d path) segments ---", flush=True)
        import jax as _jax

        from semantic_depth_tpu.models import Monodepth

        mono = Monodepth(encoder="vgg", compute_dtype=jnp.bfloat16)
        x2 = jnp.asarray(rng.uniform(0, 1, (2 * B, H, W, 3)), jnp.float32)
        mp = mono.init(_jax.random.PRNGKey(1), jnp.zeros((2, H, W, 3), jnp.float32))

        def mono_op(p, xx, carry):
            return jnp.sum(mono.apply(p, xx + carry * 0)[0]) * 1e-9

        kk = max(2, K // 2)
        timed(f"mono full fwd (batch {2*B})", chain(mono_op, kk), mp, x2, per=kk)

        mono_plain = Monodepth(encoder="vgg", compute_dtype=jnp.bfloat16, s2d_opt=False)

        def mono_plain_op(p, xx, carry):
            return jnp.sum(mono_plain.apply(p, xx + carry * 0)[0]) * 1e-9

        timed(f"mono full fwd PLAIN (batch {2*B})", chain(mono_plain_op, kk), mp,
              x2, per=kk)

        # encoder levels 3..7 (the non-s2d part) as a probe stack
        conv_stack(64, [(3, 128, 1), (3, 128, 2)], (2 * B, H // 4, W // 4, 64),
                   "mono enc3 (64->128 @H/4)")
        conv_stack(128, [(3, 256, 1), (3, 256, 2)], (2 * B, H // 8, W // 8, 128),
                   "mono enc4 (128->256 @H/8)")
        conv_stack(256, [(3, 512, 1), (3, 512, 2)], (2 * B, H // 16, W // 16, 256),
                   "mono enc5")
        conv_stack(512, [(3, 512, 1), (3, 512, 2)], (2 * B, H // 32, W // 32, 512),
                   "mono enc6")


if __name__ == "__main__":
    main()
