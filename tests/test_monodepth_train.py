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

    # published 'border' semantics: 1-pixel ZERO border, coords shifted +1
    # into the padded frame, clipped to [0, w+1] (see ops/sampler.py and the
    # live-TF twin in tests/test_weights.py)
    b, h, w, c = img.shape
    padded = np.zeros((b, h, w + 2, c), np.float32)
    padded[:, :, 1:-1] = img
    want = np.zeros_like(img)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                sx = np.clip(x + off[bi, y, x] * w + 1, 0, w + 1)
                x0 = int(np.floor(sx))
                x1 = min(x0 + 1, w + 1)
                f = sx - x0
                want[bi, y, x] = padded[bi, y, x0] * (1 - f) + padded[bi, y, x1] * f
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


# ---------------------------------------------------------------------------
# stereo_data: filename-list loader + published augmentations (VERDICT item 8)
# ---------------------------------------------------------------------------


def test_photometric_jitter_range_and_determinism():
    from semantic_depth_tpu.train.stereo_data import photometric_jitter

    rng = np.random.default_rng(5)
    left = rng.uniform(0, 1, (16, 32, 3)).astype(np.float32)
    right = rng.uniform(0, 1, (16, 32, 3)).astype(np.float32)
    l1, r1 = photometric_jitter(left, right, np.random.default_rng(42))
    l2, r2 = photometric_jitter(left, right, np.random.default_rng(42))
    np.testing.assert_array_equal(l1, l2)  # deterministic given the rng state
    np.testing.assert_array_equal(r1, r2)
    for out in (l1, r1):
        assert out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0  # clipped
    # same jitter on both views: ratio fields must match where unclipped
    safe = (l1 > 0.01) & (l1 < 0.99) & (left > 0.05)
    ratio_l = np.where(safe, l1 / np.maximum(left, 1e-6), 1.0)
    safe_r = (r1 > 0.01) & (r1 < 0.99) & (right > 0.05)
    ratio_r = np.where(safe_r, r1 / np.maximum(right, 1e-6), 1.0)
    # per-channel medians of the multiplicative factor agree across views
    for c in range(3):
        ml = np.median(ratio_l[..., c][safe[..., c]])
        mr = np.median(ratio_r[..., c][safe_r[..., c]])
        assert abs(ml - mr) < 0.15, (c, ml, mr)


def test_augment_pair_flip_swaps_views():
    from semantic_depth_tpu.train.stereo_data import augment_pair

    left = np.zeros((4, 6, 3), np.float32)
    right = np.ones((4, 6, 3), np.float32)
    flipped = swapped = 0
    for seed in range(40):
        l, r = augment_pair(left, right, np.random.default_rng(seed))
        if l.mean() > 0.5:  # left now derives from the (flipped) right view
            swapped += 1
        flipped += 1
    assert 10 < swapped < 30  # ~p=0.5


def test_filenames_file_loader_and_prefetch(tmp_path):
    from PIL import Image

    from semantic_depth_tpu.train.stereo_data import StereoDataset, read_filenames_file

    rng = np.random.default_rng(2)
    (tmp_path / "seq").mkdir()
    lines = []
    for i in range(4):
        base = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
        Image.fromarray(base).save(tmp_path / "seq" / f"l{i}.png")
        Image.fromarray(np.roll(base, -2, axis=1)).save(tmp_path / "seq" / f"r{i}.png")
        lines.append(f"seq/l{i}.png seq/r{i}.png\n")
    fl = tmp_path / "train_files.txt"
    fl.write_text("".join(lines) + "\n")  # trailing blank line tolerated

    assert read_filenames_file(str(fl)) == [
        (f"seq/l{i}.png", f"seq/r{i}.png") for i in range(4)
    ]

    ds = StereoDataset(
        filenames_file=str(fl), data_path=str(tmp_path),
        image_hw=(32, 64), seed=0, augment=True,
    )
    batches = list(ds.batches(2, prefetch=2))
    assert len(batches) == 2
    for left, right in batches:
        assert left.shape == right.shape == (2, 32, 64, 3)
        assert left.dtype == np.float32
        assert 0.0 <= left.min() and left.max() <= 1.0

    # prefetch path yields identical data to the sync path, same seed
    ds_a = StereoDataset(filenames_file=str(fl), data_path=str(tmp_path),
                         image_hw=(32, 64), seed=3)
    ds_b = StereoDataset(filenames_file=str(fl), data_path=str(tmp_path),
                         image_hw=(32, 64), seed=3)
    for (la, ra), (lb, rb) in zip(ds_a.batches(2, prefetch=2), ds_b.batches(2, prefetch=0)):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(ra, rb)


def test_monodepth_train_cli_with_filenames_file(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    (tmp_path / "seq").mkdir()
    lines = []
    for i in range(2):
        base = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        Image.fromarray(base).save(tmp_path / "seq" / f"l{i}.png")
        Image.fromarray(np.roll(base, -3, axis=1)).save(tmp_path / "seq" / f"r{i}.png")
        lines.append(f"seq/l{i}.png seq/r{i}.png\n")
    (tmp_path / "files.txt").write_text("".join(lines))

    from semantic_depth_tpu.cli import monodepth_train

    monodepth_train.main(
        ["--filenames_file", str(tmp_path / "files.txt"), "--data_path", str(tmp_path),
         "--epochs", "1", "--batch_size", "2",
         "--input_height", "128", "--input_width", "256", "--dev_tiny",
         "--model_dir", str(tmp_path / "out")]
    )
    assert (tmp_path / "out" / "monodepth.msgpack").exists()
