"""Monodepth self-supervised stereo training (Godard et al., CVPR'17).

The reference consumes a pretrained monodepth checkpoint and vendors the
upstream trainer without shipping it (monodepth_lib/README.md); this module
rebuilds the published training objective TPU-first so the framework can
(re)train its own disparity weights:

* image pyramids (4 scales);
* appearance-matching loss: alpha * SSIM + (1-alpha) * L1 between each image
  and its warp-reconstruction from the other view (alpha 0.85 upstream);
* disparity smoothness loss, edge-weighted by image gradients;
* left-right disparity-consistency loss.

The reference's monodepth_parameters exposes the loss weights
(alpha_image_loss, disp_gradient_loss_weight, lr_loss_weight,
semantic_depth.py:609-622); the upstream training defaults are alpha=0.85,
smoothness 0.1, lr 1.0.

Everything — pyramid construction, 8 warps, SSIM windows, gradients — is one
jitted XLA program per step; Adam via optax.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import Monodepth
from ..ops.sampler import bilinear_sample_x


@dataclass(frozen=True)
class MonodepthTrainConfig:
    learning_rate: float = 1e-4
    alpha_image_loss: float = 0.85
    disp_gradient_loss_weight: float = 0.1
    lr_loss_weight: float = 1.0
    num_scales: int = 4


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x area downsample (upstream uses tf.image.resize_area)."""
    b, h, w, c = img.shape
    return img.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def image_pyramid(img: jnp.ndarray, num_scales: int) -> List[jnp.ndarray]:
    out = [img]
    for _ in range(num_scales - 1):
        out.append(_downsample2(out[-1]))
    return out


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Simplified SSIM with 3x3 average pooling, as in upstream monodepth."""
    c1, c2 = 0.01**2, 0.03**2

    def pool(v):
        return jax.lax.reduce_window(
            v, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x * x) - mu_x**2
    sigma_y = pool(y * y) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0, 1)


def _gradient_x(img):
    return img[:, :, :-1, :] - img[:, :, 1:, :]


def _gradient_y(img):
    return img[:, :-1, :, :] - img[:, 1:, :, :]


def disparity_smoothness(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware smoothness: |d disp| * exp(-|d I|)."""
    disp = disp[..., None]
    dx = _gradient_x(disp)
    dy = _gradient_y(disp)
    wx = jnp.exp(-jnp.mean(jnp.abs(_gradient_x(img)), axis=3, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(_gradient_y(img)), axis=3, keepdims=True))
    return jnp.mean(jnp.abs(dx * wx)) + jnp.mean(jnp.abs(dy * wy))


def monodepth_loss(
    disps: List[jnp.ndarray],
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: MonodepthTrainConfig,
) -> Tuple[jnp.ndarray, dict]:
    """Total loss over the 4-scale pyramid. disps[i]: (B, H/2^i, W/2^i, 2)."""
    left_pyr = image_pyramid(left, cfg.num_scales)
    right_pyr = image_pyramid(right, cfg.num_scales)
    total_im, total_sm, total_lr = 0.0, 0.0, 0.0
    for i in range(cfg.num_scales):
        dl = disps[i][..., 0]
        dr = disps[i][..., 1]
        l_img, r_img = left_pyr[i], right_pyr[i]

        # reconstructions
        left_est = bilinear_sample_x(r_img, -dl)
        right_est = bilinear_sample_x(l_img, dr)

        # appearance matching
        l1_l = jnp.mean(jnp.abs(left_est - l_img))
        l1_r = jnp.mean(jnp.abs(right_est - r_img))
        ssim_l = jnp.mean(ssim(left_est, l_img))
        ssim_r = jnp.mean(ssim(right_est, r_img))
        a = cfg.alpha_image_loss
        total_im = total_im + a * (ssim_l + ssim_r) + (1 - a) * (l1_l + l1_r)

        # smoothness (upstream scales by 1/2^i)
        total_sm = total_sm + (
            disparity_smoothness(dl, l_img) + disparity_smoothness(dr, r_img)
        ) / (2**i)

        # left-right consistency: project the other view's disparity
        right_to_left_disp = bilinear_sample_x(dr[..., None], -dl)[..., 0]
        left_to_right_disp = bilinear_sample_x(dl[..., None], dr)[..., 0]
        total_lr = total_lr + jnp.mean(jnp.abs(right_to_left_disp - dl)) + jnp.mean(
            jnp.abs(left_to_right_disp - dr)
        )

    loss = (
        total_im
        + cfg.disp_gradient_loss_weight * total_sm
        + cfg.lr_loss_weight * total_lr
    )
    aux = {"image_loss": total_im, "smooth_loss": total_sm, "lr_loss": total_lr}
    return loss, aux


class MonodepthTrainer:
    """Stereo-pair trainer for the Monodepth model."""

    def __init__(
        self,
        config: MonodepthTrainConfig = MonodepthTrainConfig(),
        model: Optional[Monodepth] = None,
        init_params: Any = None,
        input_hw: Tuple[int, int] = (256, 512),
        rng: Optional[jax.Array] = None,
        mesh: Any = None,
    ):
        """mesh: optional jax.sharding.Mesh. When given, stereo batches are
        split over ALL mesh axes and params/optimizer state replicated — the
        TPU-native analog of the multi-GPU tower averaging the upstream
        trainer does with average_gradients.py (vendored but never shipped,
        monodepth_lib/README.md:3; imported at semantic_depth.py:67). GSPMD
        inserts the gradient all-reduce from the shardings; batch size must
        divide by the mesh's device count."""
        self.config = config
        self.model = model or Monodepth()
        self.tx = optax.adam(config.learning_rate)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if init_params is None:
            h, w = input_hw
            init_params = self.model.init(rng, jnp.zeros((1, h, w, 3), jnp.float32))
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            batch_sh = NamedSharding(mesh, P(mesh.axis_names))
            init_params = jax.device_put(init_params, repl)
            self._train_step = jax.jit(
                self._train_step_impl,
                in_shardings=(repl, repl, batch_sh, batch_sh),
                out_shardings=(repl, repl, repl, repl),
            )
        else:
            self._train_step = jax.jit(self._train_step_impl)
        self.params = init_params
        self.opt_state = self.tx.init(init_params)
        self.step = 0

    def _train_step_impl(self, params, opt_state, left, right):
        def loss_fn(p):
            disps = self.model.apply(p, left)
            return monodepth_loss(disps, left, right, self.config)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    def train_batch(self, left, right):
        if self.mesh is not None and left.shape[0] % self.mesh.size:
            raise ValueError(
                f"batch size {left.shape[0]} must be a multiple of the "
                f"mesh's device count {self.mesh.size}"
            )
        self.params, self.opt_state, loss, aux = self._train_step(
            self.params, self.opt_state, left, right
        )
        self.step += 1
        return {"loss": float(loss), **{k: float(v) for k, v in aux.items()}}

    # -- persistence (orbax step checkpoints + msgpack export) -------------
    def save_msgpack(self, path: str) -> str:
        from ..models import weights as weights_lib

        return weights_lib.save_params(self.params, path)

    def save_checkpoint(self, ckpt_dir: str) -> None:
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{self.step}"))
        ckptr = ocp.StandardCheckpointer()
        # opt_state included so a resumed run steps like an uninterrupted one
        ckptr.save(
            path,
            {"params": self.params, "opt_state": self.opt_state,
             "step": self.step},
        )
        ckptr.wait_until_finished()

    def restore_checkpoint(self, ckpt_dir: str, step: int) -> None:
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        template = {"params": self.params, "opt_state": self.opt_state, "step": 0}
        try:
            restored = ckptr.restore(path, template)
            self.opt_state = restored["opt_state"]
        except BaseException:
            import warnings

            restored = ckptr.restore(path, {"params": self.params, "step": 0})
            self.opt_state = self.tx.init(restored["params"])
            warnings.warn(
                f"{path} has no optimizer state (old checkpoint format); "
                "Adam moments restart from zero"
            )
        self.params = restored["params"]
        self.step = int(restored["step"])
