"""Streaming mean-IoU metric with tf.metrics.mean_iou semantics.

The reference evaluates segmentation quality with TF1's streaming mean IoU
(fcn8s/fcn.py:227-233, 429-431): a running confusion matrix accumulated
across batches; mean IoU = average of per-class IoU over classes whose
denominator is non-zero.

TPU-native: the per-batch confusion-matrix update is a one-hot matmul
(MXU-friendly) inside jit; accumulation is a pytree add, so the metric can be
`jax.lax.psum`-reduced across data-parallel devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(labels: jnp.ndarray, predictions: jnp.ndarray, num_classes: int):
    """(num_classes, num_classes) counts; rows = labels, cols = predictions
    (tf.math.confusion_matrix convention used by tf.metrics.mean_iou)."""
    labels = labels.reshape(-1)
    predictions = predictions.reshape(-1)
    # one-hot matmul instead of scatter: (C, N) @ (N, C) on the MXU
    lab_oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    pred_oh = jax.nn.one_hot(predictions, num_classes, dtype=jnp.float32)
    return jnp.dot(lab_oh.T, pred_oh, preferred_element_type=jnp.float32)


def mean_iou_from_cm(cm: jnp.ndarray) -> jnp.ndarray:
    """tf.metrics.mean_iou reduction: per-class IoU = diag / (row + col -
    diag); classes with zero denominator are excluded from the mean."""
    diag = jnp.diagonal(cm)
    denom = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - diag
    valid = denom > 0
    iou = jnp.where(valid, diag / jnp.where(valid, denom, 1.0), 0.0)
    n_valid = jnp.sum(valid.astype(jnp.float32))
    return jnp.where(n_valid > 0, jnp.sum(iou) / n_valid, 0.0)


class MeanIoU:
    """Host-side accumulator wrapping the jitted pieces (mirrors the TF1
    iou_op/iou pair: ``update`` then ``result``)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.cm = jnp.zeros((num_classes, num_classes), jnp.float32)

    def update(self, labels, predictions) -> None:
        self.cm = self.cm + confusion_matrix(labels, predictions, self.num_classes)

    def result(self) -> float:
        return float(mean_iou_from_cm(self.cm))

    def reset(self) -> None:
        self.cm = jnp.zeros((self.num_classes, self.num_classes), jnp.float32)
