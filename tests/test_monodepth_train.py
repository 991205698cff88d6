"""Monodepth training: sampler oracle, loss sanity, descent on a stereo toy."""

import numpy as np
import pytest

import jax.numpy as jnp

from semantic_depth_tpu.models import Monodepth
from semantic_depth_tpu.ops.sampler import bilinear_sample_x
from semantic_depth_tpu.train.monodepth_trainer import (
    MonodepthTrainConfig,
    MonodepthTrainer,
    image_pyramid,
    monodepth_loss,
    ssim,
)


def test_bilinear_sampler_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 4, 16, 3)).astype(np.float32)
    off = rng.uniform(-0.2, 0.2, size=(2, 4, 16)).astype(np.float32)
    got = np.asarray(bilinear_sample_x(jnp.asarray(img), jnp.asarray(off)))

    b, h, w, c = img.shape
    want = np.zeros_like(img)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                sx = np.clip(x + off[bi, y, x] * w, 0, w - 1)
                x0 = int(np.floor(sx))
                x1 = min(x0 + 1, w - 1)
                f = sx - x0
                want[bi, y, x] = img[bi, y, x0] * (1 - f) + img[bi, y, x1] * f
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sampler_zero_offset_is_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, 8, 32, 3)).astype(np.float32))
    out = bilinear_sample_x(img, jnp.zeros((1, 8, 32)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_ssim_identical_images_zero():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 8, 8, 3)).astype(np.float32))
    assert float(jnp.mean(ssim(x, x))) == pytest.approx(0.0, abs=1e-5)


def test_image_pyramid_shapes():
    img = jnp.zeros((2, 64, 128, 3))
    pyr = image_pyramid(img, 4)
    assert [p.shape for p in pyr] == [
        (2, 64, 128, 3), (2, 32, 64, 3), (2, 16, 32, 3), (2, 8, 16, 3)
    ]


def test_monodepth_training_decreases_loss():
    rng = np.random.default_rng(3)
    # toy stereo pair: right image is the left shifted 4 px (constant disparity)
    base = rng.uniform(0, 1, size=(1, 128, 256, 3)).astype(np.float32)
    # smooth it so the photometric loss has gradients toward alignment
    for _ in range(2):
        base[:, :, 1:-1] = (base[:, :, :-2] + base[:, :, 1:-1] + base[:, :, 2:]) / 3
        base[:, 1:-1] = (base[:, :-2] + base[:, 1:-1] + base[:, 2:]) / 3
    left = base
    right = np.roll(base, -4, axis=2)

    model = Monodepth(encoder="vgg", width_mult=0.0625)
    trainer = MonodepthTrainer(
        MonodepthTrainConfig(learning_rate=1e-3), model=model, input_hw=(128, 256)
    )
    losses = [trainer.train_batch(jnp.asarray(left), jnp.asarray(right))["loss"]
              for _ in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_monodepth_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    model = Monodepth(encoder="vgg", width_mult=0.0625)
    trainer = MonodepthTrainer(
        MonodepthTrainConfig(learning_rate=1e-3), model=model, input_hw=(128, 256)
    )
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 1, (1, 128, 256, 3)).astype(np.float32))
    right = jnp.asarray(np.roll(np.asarray(left), -3, axis=2))
    trainer.train_batch(left, right)
    trainer.save_checkpoint(str(tmp_path))
    step = trainer.step

    t2 = MonodepthTrainer(MonodepthTrainConfig(), model=model, input_hw=(128, 256))
    t2.restore_checkpoint(str(tmp_path), step)
    a = model.apply(trainer.params, left)[0]
    b = model.apply(t2.params, left)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_monodepth_train_cli(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    for side in ("left", "right"):
        (tmp_path / "stereo" / side).mkdir(parents=True)
    for i in range(2):
        base = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        Image.fromarray(base).save(tmp_path / "stereo" / "left" / f"{i}.png")
        Image.fromarray(np.roll(base, -3, axis=1)).save(
            tmp_path / "stereo" / "right" / f"{i}.png"
        )
    from semantic_depth_tpu.cli import monodepth_train

    monodepth_train.main(
        ["--data_dir", str(tmp_path / "stereo"), "--epochs", "1", "--batch_size", "2",
         "--input_height", "128", "--input_width", "256", "--dev_tiny",
         "--model_dir", str(tmp_path / "out")]
    )
    assert (tmp_path / "out" / "monodepth.msgpack").exists()
