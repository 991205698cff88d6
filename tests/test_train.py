"""Trainer tests: IoU metric oracle, loss descent on a learnable toy task,
checkpoint round trip, data-pipeline semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_depth_tpu.config import TrainConfig
from semantic_depth_tpu.models import FCN8s
from semantic_depth_tpu.train.metrics import MeanIoU, confusion_matrix, mean_iou_from_cm
from semantic_depth_tpu.train.trainer import FCNTrainer
from semantic_depth_tpu.train import data as data_lib


def test_mean_iou_matches_manual():
    labels = np.array([0, 0, 1, 1, 2, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0, 2])
    m = MeanIoU(3)
    m.update(jnp.asarray(labels), jnp.asarray(preds))
    # class IoUs: c0 tp1 fp1 fn1 -> 1/3; c1 tp2 fp1 fn0 -> 2/3; c2 tp2 fp0 fn1 -> 2/3
    want = (1 / 3 + 2 / 3 + 2 / 3) / 3
    assert m.result() == pytest.approx(want, rel=1e-6)


def test_mean_iou_excludes_absent_classes():
    labels = np.array([0, 0, 0])
    preds = np.array([0, 0, 0])
    cm = confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 3)
    # only class 0 has support -> mean over 1 valid class
    assert float(mean_iou_from_cm(cm)) == pytest.approx(1.0)


def _toy_batch(rng, n=2, h=32, w=64):
    """Learnable task: class = vertical thirds, input = class painted in a
    channel + noise."""
    ys = np.arange(h)
    cls = np.digitize(ys, [h // 3, 2 * h // 3])  # (h,)
    labels_idx = np.tile(cls[:, None], (1, w))
    labels = np.zeros((n, h, w, 3), np.float32)
    images = np.zeros((n, h, w, 3), np.float32)
    for i in range(n):
        labels[i] = np.eye(3)[labels_idx]
        images[i] = labels[i] * 200 + rng.normal(0, 8, (h, w, 3))
    return images, labels


def test_train_step_decreases_loss():
    cfg = TrainConfig(learning_rate=1e-3, batch_size=2, epochs=1, image_shape=(32, 64))
    model = FCN8s(num_classes=3, width_mult=0.125, fc_channels=32)
    trainer = FCNTrainer(cfg, model=model)
    rng = np.random.default_rng(0)
    images, labels = _toy_batch(rng)
    losses = []
    for _ in range(12):
        m = trainer.train_batch(jnp.asarray(images), jnp.asarray(labels))
        losses.append(m["loss"])
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_trainer_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(batch_size=1, epochs=1, image_shape=(32, 64))
    model = FCN8s(num_classes=3, width_mult=0.125, fc_channels=32)
    trainer = FCNTrainer(cfg, model=model)
    rng = np.random.default_rng(1)
    images, labels = _toy_batch(rng, n=1)
    trainer.train_batch(jnp.asarray(images), jnp.asarray(labels))
    trainer.save_checkpoint(str(tmp_path))
    step = trainer.state.step

    trainer2 = FCNTrainer(cfg, model=model)
    trainer2.restore_checkpoint(str(tmp_path), step)
    a = trainer.eval_batch(jnp.asarray(images), jnp.asarray(labels))
    b = trainer2.eval_batch(jnp.asarray(images), jnp.asarray(labels))
    assert a["loss"] == pytest.approx(b["loss"], rel=1e-6)

    # a RESUMED run must step like an uninterrupted one: the checkpoint
    # carries the Adam moments, so the next update matches exactly (restoring
    # params alone would zero mu/nu and diverge)
    trainer2.rng = trainer.rng  # align the dropout stream
    ma = trainer.train_batch(jnp.asarray(images), jnp.asarray(labels))
    mb = trainer2.train_batch(jnp.asarray(images), jnp.asarray(labels))
    assert ma["loss"] == pytest.approx(mb["loss"], rel=1e-6)
    la = jnp.concatenate([x.ravel() for x in
                          jax.tree_util.tree_leaves(trainer.state.params)])
    lb = jnp.concatenate([x.ravel() for x in
                          jax.tree_util.tree_leaves(trainer2.state.params)])
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_prepare_ground_truth_label_encoding():
    img = np.zeros((4, 6), np.uint8)
    img[0] = 7  # road
    img[1] = 13  # fence
    img[2] = 11  # fence only for cityscapes-train
    img[3] = 22  # background
    out_city = data_lib.prepare_ground_truth("cityscapes", img, mode="train")
    assert out_city[0, 0, 0] == 1 and out_city[1, 0, 1] == 1
    assert out_city[2, 0, 1] == 1  # id 11 is fence in city-train
    assert out_city[3, 0, 2] == 1
    out_city_test = data_lib.prepare_ground_truth("cityscapes", img, mode="test")
    assert out_city_test[2, 0, 1] == 0 and out_city_test[2, 0, 2] == 1
    out_robo = data_lib.prepare_ground_truth("roborace750", img, mode="train")
    assert out_robo[1, 0, 1] == 1 and out_robo[2, 0, 1] == 0


def test_dataset_over_mockup_layout(tmp_path):
    """Build a minimal Cityscapes-format tree and iterate batches."""
    from PIL import Image

    rng = np.random.default_rng(2)
    for split in ("train", "val", "test"):
        for city in ("cityA",):
            img_dir = tmp_path / "toy" / "leftImg8bit" / split / city
            gt_dir = tmp_path / "toy" / "gtFine" / split / city
            img_dir.mkdir(parents=True)
            gt_dir.mkdir(parents=True)
            for i in range(2):
                base = f"{city}_{i:06d}_000019"
                rgb = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
                Image.fromarray(rgb).save(img_dir / f"{base}_leftImg8bit.png")
                ids = rng.choice([7, 13, 22], size=(64, 128)).astype(np.uint8)
                Image.fromarray(ids, mode="L").save(gt_dir / f"{base}_gtFine_labelIds.png")

    ds = data_lib.SegmentationDataset(str(tmp_path), "toy", image_shape=(32, 64))
    assert ds.num_images("train") == 2
    batches = list(ds.batches(batch_size=1, mode="train"))
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.shape == (1, 32, 64, 3)
    assert labels.shape == (1, 32, 64, 3)
    # one-hot property
    np.testing.assert_allclose(labels.sum(-1), 1.0)
