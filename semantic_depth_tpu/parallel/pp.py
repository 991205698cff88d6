"""Pipeline parallelism ('pp'): GPipe-style staged serving over ICI.

The fused frame program factors into three sequential stages with a uniform
activation boundary (pipeline.py `_batch_segment` -> `_batch_disparity` ->
`_batch_geometry`). 'pp' assigns one stage to each mesh column and STREAMS
microbatches through them: while the geometry stage finishes microbatch t,
the monodepth stage is on t+1 and the FCN stage on t+2 — after an S-1-step
fill, every stage runs concurrently, and the boundary activations (resized
frame + class masks + disparity, ~1.8 MB/frame at 256x512) hop one ICI
neighbor per step via `lax.ppermute`.

Unlike 'dp'/'sp'/'tp' (parallel/inference.py, train_step.py) this cannot be
GSPMD-from-shardings: pipelining is a *schedule*, not a sharding, so it is
written as a `shard_map` whose per-device program scans the microbatch clock
and `lax.switch`es on `axis_index('pp')` to run its stage. The ring permute
also returns the last stage's (discarded) carry to stage 0, keeping the
collective a uniform neighbor-shift on the ICI torus.

What pp buys on this workload is stage *concurrency* on a single stream —
each chip keeps one network hot in VMEM/caches instead of alternating both
— plus near-ideal scaling of steady-state throughput with pipeline depth
for equal-cost stages. Params are replicated (both nets fit one chip with
room; the binding resource here is compute, not HBM — DESIGN.md §7), so
this is compute staging, not memory staging. Composes with 'dp' on the
microbatch axis over a (dp, pp) mesh.

The reference is strictly single-GPU (SURVEY.md §2 parallelism inventory:
none of dp/tp/pp/sp exists upstream); this subsystem is new capability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..pipeline import SemanticDepthPipeline, _scaled_camera, resolve_frame_scalars

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs, check_rep):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_rep)


def make_pp_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, pp: Optional[int] = None
) -> Mesh:
    """Build a (dp, pp) mesh. Defaults: pp=2 (FCN stage / monodepth+geometry
    stage), dp = n / pp. pp=3 splits monodepth and geometry apart too."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if pp is None:
        if dp is not None:
            pp = n // dp
        elif n % 2 == 0 and n > 1:
            pp = 2
        else:
            # don't default to pp=1 and let PipelinedPipeline emit a
            # confusing "pp=1 unsupported" error: the real problem is the
            # device count (ADVICE r3)
            raise ValueError(
                f"pipeline parallelism needs an even device count to default "
                f"to pp=2 stages; got {n} device(s) — pass dp/pp explicitly "
                f"with pp in (2, 3)"
            )
    if dp is None:
        dp = n // pp
    if dp * pp != n:
        raise ValueError(f"dp*pp = {dp}*{pp} != n_devices {n}")
    arr = np.asarray(devices).reshape(dp, pp)
    return Mesh(arr, axis_names=("dp", "pp"))


class PipelinedPipeline:
    """Streams microbatches of frames through per-device pipeline stages.

    mesh must have a 'pp' axis of size 2 (stage 0: resize+FCN; stage 1:
    monodepth+geometry) or 3 (monodepth and geometry split), optionally a
    'dp' axis sharding each microbatch. ``process_stream`` takes (N, H0, W0,
    3) frames, N a multiple of ``microbatch`` and ``microbatch`` a multiple
    of mesh dp, and returns FrameOutputs with leading axis N — bitwise the
    same program as ``SemanticDepthPipeline.process_batch`` per microbatch,
    just scheduled across chips. One compile per distinct (N/microbatch,
    microbatch, H0, W0).

    DO stream long sequences in fixed-size chunks (the cli's ``--batch`` is
    exactly that), not as one giant call, for two compounding reasons:

    * Output HBM: finished FrameOutputs are dealt round-robin across the
      stage devices (clock step t's output is ppermute'd from the final
      stage to device t mod S), so each device stacks ~(T+S-1)/S
      microbatch outputs — per-device output memory is ~(T+S-1)/T of the
      useful result and does NOT scale with stage count (VERDICT r4 #6;
      previously every device stacked all T+S-1 steps, non-final stages
      stacking zeros, for ~S*(T+S-1)/T). What remains is fill/drain only:
      chunks bound T, and at 256x512 a microbatch-8 FrameOutputs is
      ~100 MB, so keep (T+S-1)/S of them within the HBM you can spare.
    * Fill/drain overhead: each call spends S-1 of its T+S-1 clock steps
      filling/draining, so efficiency is T/(T+S-1) — 89% at T=8, S=2;
      97% at T=32. Pick the chunk so T = chunk/microbatch lands in the
      8..32 range: big enough to amortize fill, small enough to bound the
      stacked-output memory above.
    """

    def __init__(self, pipeline: SemanticDepthPipeline, mesh: Mesh):
        if "pp" not in mesh.axis_names:
            raise ValueError("mesh needs a 'pp' axis (make_pp_mesh)")
        self.pipeline = pipeline
        self.mesh = mesh
        self.n_stages = mesh.shape["pp"]
        if self.n_stages not in (2, 3):
            raise ValueError(
                f"pp={self.n_stages} unsupported: the frame program factors "
                "into 2 or 3 stages (FCN / monodepth / geometry)"
            )
        frames_spec = P(None, "dp" if "dp" in mesh.axis_names else None)
        self._fn = jax.jit(
            shard_map(
                self._device_program,
                mesh=mesh,
                in_specs=(P(), P(), frames_spec, P(), P()),
                # leading axis = the round-robin output slots, sharded over
                # 'pp': device d holds the outputs of clock steps t with
                # t mod S == d (see _device_program's dealing ppermute).
                out_specs=P("pp", "dp"),
                check_rep=False,  # ppermute: per-device values diverge
            )
        )

    # --- the per-device SPMD program --------------------------------------
    def _device_program(self, fcn_p, mono_p, frames_stack, focal, dmult):
        """frames_stack: (T, mb_local, H0, W0, 3); runs T + S - 1 clock steps.
        At step t, stage s works on microbatch t - s; boundaries rotate one
        'pp' neighbor per step."""
        pipe = self.pipeline
        cfg = pipe.config
        S = self.n_stages
        sidx = jax.lax.axis_index("pp")
        cam, s_w = _scaled_camera(cfg, focal)
        dm = dmult * s_w
        T, mb = frames_stack.shape[0], frames_stack.shape[1]
        h, w = cfg.input_height, cfg.input_width

        zero_bnd = dict(
            small=jnp.zeros((mb, h, w, 3), jnp.float32),
            road=jnp.zeros((mb, h, w), bool),
            fence=jnp.zeros((mb, h, w), bool),
            disp=jnp.zeros((mb, h, w), jnp.float32),
        )

        def geom(bnd):
            return pipe._batch_geometry(bnd["small"], bnd["road"], bnd["fence"],
                                        bnd["disp"], cam)

        out_shapes = jax.eval_shape(geom, zero_bnd)
        zero_out = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), out_shapes)

        def fcn_stage(bnd, t):
            # t is clamped: the drain steps (t >= T) compute a throwaway
            # microbatch that never reaches the geometry stage.
            frames = jax.lax.dynamic_index_in_dim(
                frames_stack, jnp.clip(t, 0, T - 1), 0, keepdims=False
            )
            small, road, fence = pipe._batch_segment(fcn_p, frames)
            return dict(small=small, road=road, fence=fence,
                        disp=zero_bnd["disp"]), zero_out

        def mono_stage(bnd, t):
            disp = pipe._batch_disparity(mono_p, bnd["small"], dm)
            return dict(bnd, disp=disp), zero_out

        def fused_tail_stage(bnd, t):  # S == 2: monodepth + geometry together
            disp = pipe._batch_disparity(mono_p, bnd["small"], dm)
            return zero_bnd, geom(dict(bnd, disp=disp))

        def geom_stage(bnd, t):
            return zero_bnd, geom(bnd)

        branches = (
            [fcn_stage, fused_tail_stage]
            if S == 2
            else [fcn_stage, mono_stage, geom_stage]
        )
        ring = [(i, (i + 1) % S) for i in range(S)]

        # Round-robin output dealing (VERDICT r4 #6): each scan iteration
        # runs S clock steps; the output finished at clock step t = k*S + j
        # is ppermute'd from the final stage to device j (= t mod S, STATIC
        # because the inner loop over j is unrolled), and only that device
        # keeps it. Every device thus stacks ONE microbatch output per
        # iteration — per-device output HBM no longer scales with S. The
        # cost is one extra FrameOutputs hop per step on the ICI ring
        # (identity for j == S-1), bandwidth the boundary permute already
        # rides.
        n_iter = -(-(T + S - 1) // S)  # ceil

        def outer(bnd, k):
            acc = zero_out
            for j in range(S):
                t = k * S + j
                new_bnd, outs = jax.lax.switch(sidx, branches, bnd, t)
                bnd = jax.lax.ppermute(new_bnd, "pp", ring)
                outs = jax.lax.ppermute(outs, "pp", [(S - 1, j)])
                # fill (t < S-1) and overrun (t >= T+S-1) steps produce
                # throwaway values; only the dealt device keeps a real one
                keep = (t >= S - 1) & (t < T + S - 1) & (sidx == j)
                acc = jax.tree.map(
                    lambda a, o: jnp.where(keep, o, a), acc, outs
                )
            return bnd, acc

        _, ys = jax.lax.scan(outer, zero_bnd, jnp.arange(n_iter))
        return ys  # (n_iter, mb, ...) per device; global (S*n_iter, mb, ...)

    # --- host API ----------------------------------------------------------
    def process_stream(self, frames, microbatch: int,
                       focal: Optional[float] = None,
                       disparity_mult: Optional[float] = None):
        frames = jnp.asarray(frames)
        n = frames.shape[0]
        if n % microbatch != 0:
            raise ValueError(f"stream length {n} not divisible by microbatch {microbatch}")
        dp = self.mesh.shape.get("dp", 1)
        if microbatch % dp != 0:
            raise ValueError(f"microbatch {microbatch} not divisible by dp={dp}")
        focal, dmult = resolve_frame_scalars(
            self.pipeline.config, frames.shape[2], focal, disparity_mult
        )
        stack = frames.reshape((n // microbatch, microbatch) + frames.shape[1:])
        with self.mesh:
            out = self._fn(
                self.pipeline.fcn_params, self.pipeline.mono_params, stack,
                jnp.float32(focal), jnp.float32(dmult),
            )
        S = self.n_stages
        T = n // microbatch
        # Undo the round-robin dealing: clock step t's output sits at global
        # slot (t mod S) * n_iter + t // S (out_specs concatenates the per-
        # device stacks along axis 0 in pp order); microbatch i finished at
        # clock step t = i + S - 1. Gather + flatten (T, mb) -> N.
        n_iter = -(-(T + S - 1) // S)
        t = np.arange(S - 1, T + S - 1)
        slots = jnp.asarray((t % S) * n_iter + t // S)
        return jax.tree.map(
            lambda x: x[slots].reshape((n,) + x.shape[2:]), out
        )

    def process_batch(self, frames, focal: Optional[float] = None,
                      disparity_mult: Optional[float] = None):
        """ShardedPipeline-compatible adapter (cli/sequence.py --mesh pp):
        streams the batch through the stages in the largest dp-divisible
        microbatch that still yields >= n_stages microbatches, so every
        stage is busy in steady state."""
        frames = jnp.asarray(frames)
        n = frames.shape[0]
        dp = self.mesh.shape.get("dp", 1)
        if n % dp != 0:
            raise ValueError(f"batch {n} not divisible by dp={dp}")
        mb = max(dp, (n // (self.n_stages * dp)) * dp)
        while n % mb:
            mb -= dp
        return self.process_stream(frames, mb, focal, disparity_mult)
