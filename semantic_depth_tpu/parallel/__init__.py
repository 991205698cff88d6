"""Multi-device scaling: mesh construction, sharded inference batching, and
the dp x tp sharded FCN-8s training step.

The reference is strictly single-GPU (SURVEY.md §2: no distributed code
exists upstream); this subsystem is a new TPU-native capability. Design:

* **data parallelism** over frames/batches (`dp` mesh axis) — the natural
  scale-out for both training and the streamed sequence path;
* **tensor parallelism** over the fat fc6/fc7 channels of the FCN-8s encoder
  (`tp` mesh axis) — the only layers big enough to be worth sharding;
* **spatial parallelism** over image rows (`sp` mesh axis,
  `make_spatial_mesh`) — single-frame latency scaling for the full-res
  path: the conv trunks partition with GSPMD halo exchanges (the workload's
  sequence-parallel analog; image rows play the sequence-length role);
* **pipeline parallelism** over the program's stages (`pp` mesh axis,
  `make_pp_mesh` + `PipelinedPipeline`) — GPipe-style microbatch streaming
  with `shard_map` + `lax.ppermute` ring shifts (a schedule, not a
  sharding, so it cannot be GSPMD'd from annotations alone — pp.py);
* XLA inserts the all-reduce/all-gather collectives from sharding
  annotations (GSPMD) everywhere else; no hand-written NCCL-style code, per
  the scaling-book recipe: pick a mesh, annotate, let the compiler place
  collectives on ICI.

(Expert parallelism is n/a: nothing in this model family is a routed
mixture — there is no 'ep' analog to build.)
"""

from .inference import ShardedPipeline
from .mesh import make_mesh, make_spatial_mesh, shard_batch
from .pp import PipelinedPipeline, make_pp_mesh
from .train_step import make_sharded_train_step, shard_fcn_params

__all__ = [
    "ShardedPipeline",
    "PipelinedPipeline",
    "make_mesh",
    "make_spatial_mesh",
    "make_pp_mesh",
    "shard_batch",
    "make_sharded_train_step",
    "shard_fcn_params",
]
