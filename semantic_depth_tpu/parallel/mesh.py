"""Mesh construction + sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = 2 when device count is even and
    > 1 else 1; dp = n / tp. Axis names: 'dp', 'tp'."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != n_devices {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_spatial_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, sp: Optional[int] = None
) -> Mesh:
    """Build a (dp, sp) mesh for latency-oriented inference: 'sp' shards the
    image ROW axis of a frame across chips (GSPMD inserts conv halo
    exchanges), 'dp' shards the frame batch. Defaults to all devices spatial
    (dp=1) — the single-frame-latency configuration. This is the workload's
    sequence-parallelism analog (SURVEY.md §5: resolution is the "sequence
    length" here); the reference is strictly single-GPU."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if sp is None:
        sp = n if dp is None else n // dp
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != n_devices {n}")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree with the leading axis split over 'dp' (replicated
    over 'tp')."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
