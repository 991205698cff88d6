"""Shared timing helpers for the tools/ profilers.

One definition of the dev-relay-aware methodology (see tools/profile_tpu.py
docstring): warm up once, then best-of-N wall times with completion forced
by a tiny host fetch (block_until_ready is unreliable on the remote
backend), and a fori_loop ``chain`` that amortizes the ~5 ms dispatch /
~30 ms fetch overheads across K chained calls inside ONE jitted program.
"""

from __future__ import annotations

import time


def jax_leaf(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0].ravel()[:1]


def timed(name, fn, *args, iters_outer=3, per=1, flops=None, width=52):
    """Best-of-``iters_outer`` wall time of fn(*args), printed as ms/call
    (divided by ``per``); with ``flops`` also prints sustained TF/s."""
    import numpy as np

    r = fn(*args)  # warmup/compile
    np.asarray(jax_leaf(r))
    best = float("inf")
    for _ in range(iters_outer):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax_leaf(r))
        best = min(best, time.time() - t0)
    ms = best * 1e3 / per
    tf = f"  {flops / (best / per) / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:{width}s} {ms:9.3f} ms{tf}", flush=True)
    return best / per


def chain(fn, k):
    """Run fn k times with a data-dependence carry, inside one jit:
    fn(*args, carry) -> carry."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(_, carry):
            return fn(*args, carry)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    return run
