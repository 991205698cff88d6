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


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree with the leading axis split over 'dp' (replicated
    over 'tp')."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
