"""Data-parallel batched inference over a device mesh.

Shards the fused ``process_batch`` program over the 'dp' mesh axis: each
device runs the complete per-frame pipeline on its shard of the frame batch
(the geometry chain is embarrassingly frame-parallel), params replicated.
XLA partitions the whole program from the input shardings alone — no
collectives are needed until results are gathered.

This is a new capability over the strictly single-GPU reference
(SURVEY.md §2 parallelism inventory): frame throughput scales with chips on
one ICI domain.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import SemanticDepthPipeline


class ShardedPipeline:
    """Wraps a SemanticDepthPipeline for dp-sharded batch processing.

    batch size must be a multiple of mesh.shape['dp']; every leaf of the
    returned FrameOutputs keeps its leading batch axis sharded over 'dp'.
    """

    def __init__(self, pipeline: SemanticDepthPipeline, mesh: Mesh):
        self.pipeline = pipeline
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        batched = NamedSharding(mesh, P("dp"))
        self._params = (
            jax.tree.map(lambda x: jax.device_put(x, repl), pipeline.fcn_params),
            jax.tree.map(lambda x: jax.device_put(x, repl), pipeline.mono_params),
        )
        self._fn = jax.jit(
            pipeline._process_batch_impl,
            in_shardings=(
                jax.tree.map(lambda _: repl, pipeline.fcn_params),
                jax.tree.map(lambda _: repl, pipeline.mono_params),
                batched,
                repl,
                repl,
            ),
        )

    def process_batch(self, frames, focal: Optional[float] = None,
                      disparity_mult: Optional[float] = None):
        from ..pipeline import resolve_frame_scalars

        focal, disparity_mult = resolve_frame_scalars(
            self.pipeline.config, frames.shape[2], focal, disparity_mult
        )
        dp = self.mesh.shape["dp"]
        if frames.shape[0] % dp != 0:
            raise ValueError(f"batch {frames.shape[0]} not divisible by dp={dp}")
        frames = jax.device_put(
            jnp.asarray(frames), NamedSharding(self.mesh, P("dp"))
        )
        fcn_p, mono_p = self._params
        with self.mesh:
            return self._fn(
                fcn_p, mono_p, frames, jnp.float32(focal), jnp.float32(disparity_mult)
            )
