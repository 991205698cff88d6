"""Sharded FCN-8s training step: dp over the batch, tp over the fc6/fc7
channel dimensions, GSPMD-inserted collectives.

Sharding layout:
* batch (B, H, W, 3) and labels: P('dp') on axis 0;
* fc6 kernel (7, 7, 512, 4096): P(None, None, None, 'tp') — output channels
  split, so the big matmul runs as a per-shard contraction and the following
  dropout/relu stay local;
* fc7 kernel (1, 1, 4096, 4096): P(None, None, 'tp', None) — input channels
  split; XLA all-reduces the partial sums over 'tp' (one psum on ICI per
  step), the classic Megatron column->row pairing;
* everything else replicated.

Gradients arrive with the same shardings (reverse-mode transposes them); the
optimizer update is elementwise so parameter shards update locally. The
cross-'dp' gradient all-reduce is inserted by XLA from the annotations.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fcn8s import decoder_l2_loss
from ..train.metrics import confusion_matrix
from ..train.trainer import softmax_xent


def _param_spec(path: Tuple, leaf) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    if "fc6" in names and "kernel" in names:
        return P(None, None, None, "tp")
    if "fc7" in names and "kernel" in names:
        return P(None, None, "tp", None)
    if "fc6" in names and "bias" in names:
        return P("tp")
    return P()


def shard_fcn_params(mesh: Mesh, params):
    """Place FCN-8s params with the tp layout above."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params
    )


def make_sharded_train_step(mesh: Mesh, model, tx, num_classes: int, l2_scale: float = 1e-3):
    """Returns jitted (params, opt_state, images, labels, rng) ->
    (params, opt_state, loss, cm) with explicit in/out shardings."""

    def loss_fn(params, images, labels, dropout_rng):
        logits = model.apply(params, images, train=True, rngs={"dropout": dropout_rng})
        return softmax_xent(logits, labels) + decoder_l2_loss(params, l2_scale)

    def step(params, opt_state, images, labels, dropout_rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels, dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        eval_logits = model.apply(params, images)
        preds = jnp.argmax(eval_logits, axis=-1)
        cm = confusion_matrix(jnp.argmax(labels, axis=-1), preds, num_classes)
        return params, opt_state, loss, cm

    batch_sharding = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def compile_for(params, opt_state):
        p_shard = param_shardings(mesh, params)
        # optimizer moments mirror the param shardings where shapes match
        o_shard = _opt_state_shardings(mesh, opt_state, params)
        return jax.jit(
            step,
            in_shardings=(p_shard, o_shard, batch_sharding, batch_sharding, repl),
            out_shardings=(p_shard, o_shard, repl, repl),
        )

    return compile_for


def _opt_state_shardings(mesh: Mesh, opt_state, params):
    """Adam moments mirror the param shardings; scalars replicated.

    The moments live at paths like (0, 'mu', 'params', 'fc6', 'kernel') —
    the param path is a suffix, so _param_spec applies directly. (A
    shape-based lookup is NOT safe here: a tp-sharded fc6 bias and a
    replicated conv bias can share (C,) shapes.)"""
    del params

    def pick(path, leaf):
        if jnp.ndim(leaf) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _param_spec(path, leaf))

    return jax.tree_util.tree_map_with_path(pick, opt_state)
