"""Data- and spatially-parallel batched inference over a device mesh.

Shards the fused ``process_batch`` program from its input shardings alone —
GSPMD partitions the whole traced program, no hand-written collectives:

* 'dp' (throughput): each device runs the complete per-frame pipeline on its
  shard of the frame batch (the geometry chain is embarrassingly
  frame-parallel), params replicated. Zero collectives until results gather.
* 'sp' (latency, ``make_spatial_mesh``): the image ROW axis is sharded, so
  the convolution trunks — 83%+ of frame time (DESIGN.md 4d) — run
  spatially partitioned with GSPMD-inserted halo exchanges riding ICI.
  Global stages (the resize contraction, cloud compaction, medians) gather
  as needed; they are a small slice of the program. This is the workload's
  sequence-parallelism analog (image rows ~ sequence length, SURVEY.md §5).

Both are new capabilities over the strictly single-GPU reference
(SURVEY.md §2 parallelism inventory).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import SemanticDepthPipeline


class ShardedPipeline:
    """Wraps a SemanticDepthPipeline for mesh-sharded batch processing.

    The frame batch axis is sharded over the mesh's 'dp' axis and (when the
    mesh has one — ``make_spatial_mesh``) the image row axis over 'sp'.
    batch size must be a multiple of mesh.shape['dp'] and the input frame
    height a multiple of mesh.shape['sp']; every leaf of the returned
    FrameOutputs keeps its leading batch axis sharded over 'dp'.
    """

    def __init__(self, pipeline: SemanticDepthPipeline, mesh: Mesh):
        self.pipeline = pipeline
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        self._frame_spec = P(
            "dp" if "dp" in mesh.axis_names else None,
            "sp" if "sp" in mesh.axis_names else None,
        )
        batched = NamedSharding(mesh, self._frame_spec)
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
        dp = self.mesh.shape.get("dp", 1)
        if frames.shape[0] % dp != 0:
            raise ValueError(f"batch {frames.shape[0]} not divisible by dp={dp}")
        sp = self.mesh.shape.get("sp", 1)
        if frames.shape[1] % sp != 0:
            raise ValueError(
                f"frame height {frames.shape[1]} not divisible by sp={sp}"
            )
        frames = jax.device_put(
            jnp.asarray(frames), NamedSharding(self.mesh, self._frame_spec)
        )
        fcn_p, mono_p = self._params
        with self.mesh:
            return self._fn(
                fcn_p, mono_p, frames, jnp.float32(focal), jnp.float32(disparity_mult)
            )

    def process_frame(self, frame, focal: Optional[float] = None,
                      disparity_mult: Optional[float] = None):
        """Single-frame latency mode: the batch-1 program with image rows
        sharded over 'sp' (use ``make_spatial_mesh`` — a dp>1 mesh cannot
        split one frame). Returns unbatched FrameOutputs like
        ``SemanticDepthPipeline.process_frame``."""
        out = self.process_batch(jnp.asarray(frame)[None], focal, disparity_mult)
        return jax.tree.map(lambda x: x[0], out)
