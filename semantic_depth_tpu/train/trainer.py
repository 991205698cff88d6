"""FCN-8s trainer: optax Adam, jitted train/eval steps, streaming IoU,
CSV/PNG metric curves, orbax checkpoints.

Reference counterparts: FCN.optimize_cross_entropy/train_nn/inference/logging
(fcn8s/fcn.py:238-535). Hyperparameters preserved: Adam lr 1e-5, batch 1,
keep_prob 0.5, trunc-normal init 1e-2, decoder L2 1e-3 (thesis Table 5).

TPU-first differences from the reference:
* one jitted train step computes loss+grads+IoU stats in a single program
  (the reference ran THREE session.run calls per batch — train, iou_op, iou —
  re-executing the forward pass each time, fcn.py:306-308);
* data parallelism: pass a Mesh and batches are sharded over it, with
  gradients/metrics psum-reduced over ICI (`parallel.mesh`);
* checkpoints are orbax (step-addressed, resumable) + a final msgpack export
  the inference CLIs consume.
"""

from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..models import FCN8s
from ..models.fcn8s import decoder_l2_loss
from ..models import weights as weights_lib
from .data import SegmentationDataset
from .metrics import confusion_matrix, mean_iou_from_cm


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def softmax_xent(logits: jnp.ndarray, labels_onehot: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross entropy over all pixels (fcn.py:248-249)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels_onehot * logp, axis=-1))


class FCNTrainer:
    def __init__(
        self,
        config: TrainConfig,
        model: Optional[FCN8s] = None,
        init_params: Any = None,
        rng: Optional[jax.Array] = None,
        mesh: Any = None,
    ):
        """mesh: optional jax.sharding.Mesh with ('dp', 'tp') axes
        (parallel.mesh.make_mesh). When given, the train step runs sharded —
        batches split over 'dp', fc6/fc7 Megatron-split over 'tp'
        (parallel.train_step). Each TRAIN batch must divide by the dp size
        (train_batch raises otherwise; fit() drops the ragged final batch);
        eval and test paths are unaffected."""
        self.config = config
        self.model = model or FCN8s(
            num_classes=config.num_classes, dropout_keep_prob=config.dropout
        )
        self.tx = optax.adam(config.learning_rate)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.rng = rng
        self.mesh = mesh
        if init_params is None:
            h, w = config.image_shape
            init_params = self.model.init(rng, jnp.zeros((1, h, w, 3), jnp.float32))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._install_params(init_params)

    def _install_params(self, params, step: int = 0) -> None:
        """(Re)build state + the jitted train step for ``params`` — sharded
        over self.mesh when one was given, single-device otherwise."""
        if self.mesh is not None:
            from ..parallel.train_step import (
                make_sharded_train_step,
                shard_fcn_params,
            )

            params = shard_fcn_params(self.mesh, params)
            opt_state = self.tx.init(params)  # moments inherit param shardings
            self._train_step = make_sharded_train_step(
                self.mesh, self.model, self.tx, self.config.num_classes,
                self.config.l2_scale,
            )(params, opt_state)
        else:
            opt_state = self.tx.init(params)
            self._train_step = jax.jit(self._train_step_impl)
        self.state = TrainState(params=params, opt_state=opt_state, step=step)

    # -- jitted steps ------------------------------------------------------
    def _loss_fn(self, params, images, labels, dropout_rng):
        logits = self.model.apply(
            params, images, train=True, rngs={"dropout": dropout_rng}
        )
        loss = softmax_xent(logits, labels) + decoder_l2_loss(
            params, self.config.l2_scale
        )
        return loss, logits

    def _train_step_impl(self, state_params, opt_state, images, labels, dropout_rng):
        (loss, logits), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state_params, images, labels, dropout_rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        # IoU on the clean (no-dropout) forward, like the second
        # feed_dict_train_iou pass of the reference (fcn.py:298-308) — but
        # fused into the same program.
        eval_logits = self.model.apply(params, images)
        preds = jnp.argmax(eval_logits, axis=-1)
        cm = confusion_matrix(
            jnp.argmax(labels, axis=-1), preds, self.config.num_classes
        )
        return params, opt_state, loss, cm

    def _eval_step_impl(self, params, images, labels):
        logits = self.model.apply(params, images)
        loss = softmax_xent(logits, labels) + decoder_l2_loss(
            params, self.config.l2_scale
        )
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(jnp.argmax(labels, axis=-1), preds, self.config.num_classes)
        return loss, cm, jax.nn.softmax(logits, axis=-1)

    # -- public API --------------------------------------------------------
    def train_batch(self, images, labels) -> Dict[str, float]:
        if self.mesh is not None and images.shape[0] % self.mesh.shape["dp"]:
            # The sharded step's in_shardings pin the batch axis to P('dp');
            # a non-divisible batch would die inside jit with a shape error.
            raise ValueError(
                f"batch of {images.shape[0]} cannot be split over dp="
                f"{self.mesh.shape['dp']}; feed batches divisible by dp "
                f"(fit() drops the ragged final batch in mesh mode)"
            )
        self.rng, dropout_rng = jax.random.split(self.rng)
        params, opt_state, loss, cm = self._train_step(
            self.state.params, self.state.opt_state, images, labels, dropout_rng
        )
        self.state = TrainState(params=params, opt_state=opt_state, step=self.state.step + 1)
        return {"loss": float(loss), "iou": float(mean_iou_from_cm(cm)), "cm": np.asarray(cm)}

    def eval_batch(self, images, labels) -> Dict[str, Any]:
        loss, cm, probs = self._eval_step(self.state.params, images, labels)
        return {"loss": float(loss), "cm": np.asarray(cm), "probs": np.asarray(probs)}

    def fit(
        self,
        dataset: SegmentationDataset,
        log_dir: Optional[str] = None,
        model_name: str = "model",
        verbose: bool = True,
    ) -> Dict[str, list]:
        """Epoch loop with per-epoch train/val loss + IoU curves
        (train_nn equivalent, fcn.py:260-378)."""
        cfg = self.config
        try:  # progress bars like the reference's tqdm loops (fcn.py:285,339)
            from tqdm import tqdm
        except ImportError:  # pragma: no cover
            tqdm = lambda it, **kw: it  # noqa: E731
        history = {"train_loss": [], "train_iou": [], "val_loss": [], "val_iou": []}
        for epoch in range(1, cfg.epochs + 1):
            t0 = time.time()
            losses, cms = [], []
            n_train = -(-dataset.num_images("train") // cfg.batch_size)
            dropped_ragged = False
            for images, labels in tqdm(
                dataset.batches(cfg.batch_size, mode="train"),
                desc=f"Epoch {epoch}: Train Batch", total=n_train, disable=not verbose,
            ):
                if (
                    self.mesh is not None
                    and images.shape[0] % self.mesh.shape["dp"]
                ):
                    # dataset size isn't a multiple of batch_size: the short
                    # final batch can't split over dp — drop it (standard
                    # drop-remainder semantics for data-parallel training)
                    dropped_ragged = True
                    continue
                m = self.train_batch(images, labels)
                losses.append(m["loss"])
                cms.append(m["cm"])
            if dropped_ragged and verbose and epoch == 1:
                print(
                    "mesh mode: dropping the ragged final batch each epoch "
                    f"(dataset size not a multiple of batch_size={cfg.batch_size})"
                )
            train_loss = float(np.mean(losses)) if losses else float("nan")
            train_iou = float(mean_iou_from_cm(jnp.asarray(np.sum(cms, axis=0)))) if cms else 0.0

            vlosses, vcms = [], []
            for images, labels in dataset.batches(cfg.batch_size, mode="val"):
                m = self.eval_batch(images, labels)
                vlosses.append(m["loss"])
                vcms.append(m["cm"])
            val_loss = float(np.mean(vlosses)) if vlosses else float("nan")
            val_iou = float(mean_iou_from_cm(jnp.asarray(np.sum(vcms, axis=0)))) if vcms else 0.0

            history["train_loss"].append(train_loss)
            history["train_iou"].append(train_iou)
            history["val_loss"].append(val_loss)
            history["val_iou"].append(val_iou)
            if verbose:
                print(
                    f"Epoch {epoch}/{cfg.epochs}: train loss {train_loss:.4f} "
                    f"iou {train_iou:.4f} | val loss {val_loss:.4f} iou {val_iou:.4f} "
                    f"({time.time() - t0:.1f}s)"
                )
        if log_dir:
            epochs = list(range(1, cfg.epochs + 1))
            write_metric_logs(log_dir, model_name, "loss", history["train_loss"],
                              history["val_loss"], epochs)
            write_metric_logs(log_dir, model_name, "iou", history["train_iou"],
                              history["val_iou"], epochs)
        return history

    def evaluate_test(self, dataset: SegmentationDataset) -> Dict[str, Any]:
        """Test-set IoU with per-image values (inference equivalent,
        fcn.py:384-492)."""
        per_image = []
        running = np.zeros((self.config.num_classes,) * 2, np.float32)
        for images, labels in dataset.batches(1, mode="test"):
            m = self.eval_batch(images, labels)
            # the reference logs the RUNNING mean IoU after each image; the
            # final mean is the same accumulator fully summed
            running = running + m["cm"]
            per_image.append(float(mean_iou_from_cm(jnp.asarray(running))))
        return {
            "per_image_iou": per_image,
            "mean_iou": per_image[-1] if per_image else 0.0,
        }

    def set_params(self, params: Any) -> None:
        """Replace the model parameters (warm start / restore), resetting the
        optimizer state and step counter (re-sharding over the mesh when one
        was given)."""
        self._install_params(params)

    # -- persistence -------------------------------------------------------
    def save_msgpack(self, path: str) -> str:
        return weights_lib.save_params(self.state.params, path)

    def save_checkpoint(self, ckpt_dir: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{self.state.step}"))
        ckptr = ocp.StandardCheckpointer()
        # Optimizer state IS part of a resumable checkpoint: restoring params
        # alone silently zeroes Adam's moments + bias-correction count, and
        # the resumed run steps differently from an uninterrupted one.
        ckptr.save(
            path,
            {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            },
        )
        ckptr.wait_until_finished()

    def restore_checkpoint(self, ckpt_dir: str, step: int) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": 0,
        }
        try:
            restored = ckptr.restore(path, template)
            opt_state = restored["opt_state"]
        except BaseException:
            # pre-r3 checkpoints carry no optimizer state: restore params
            # only and warn that moments restart
            import warnings

            restored = ckptr.restore(path, {"params": self.state.params, "step": 0})
            opt_state = None
            warnings.warn(
                f"{path} has no optimizer state (old checkpoint format); "
                "Adam moments restart from zero"
            )
        self._install_params(restored["params"], step=int(restored["step"]))
        if opt_state is not None:
            if self.mesh is not None:
                from ..parallel.train_step import _opt_state_shardings

                opt_state = jax.tree.map(
                    jax.device_put, opt_state,
                    _opt_state_shardings(self.mesh, opt_state, self.state.params),
                )
            self.state = TrainState(
                params=self.state.params, opt_state=opt_state,
                step=self.state.step,
            )


def write_metric_logs(log_dir, model_name, metric_type, train_vals, val_vals, epochs):
    """CSV + matplotlib curve PNGs under log/<model>/<metric>/
    (fcn.py:497-535)."""
    metric_path = os.path.join(log_dir, model_name, metric_type)
    os.makedirs(metric_path, exist_ok=True)
    stamp = time.strftime("%Y_%m_%d %H-%M")
    csv_path = os.path.join(metric_path, f"{metric_type}_vs_epochs_{stamp}.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t", quotechar="|", quoting=csv.QUOTE_MINIMAL)
        w.writerow(["Epoch", f"TRAIN_{metric_type}", f"VAL_{metric_type}"])
        w.writerows(zip(epochs, train_vals, val_vals))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.ticker import MaxNLocator

        ax = plt.figure().gca()
        ax.xaxis.set_major_locator(MaxNLocator(integer=True))
        ax.plot(epochs, train_vals, label="train", linestyle="--")
        ax.plot(epochs, val_vals, label="val", linestyle="--")
        ax.legend()
        plt.xlabel("epochs")
        plt.ylabel(metric_type)
        plt.savefig(os.path.join(metric_path, f"{metric_type}_vs_epochs_{stamp}.png"))
        plt.close()
    except Exception:
        pass
