"""FCN CLI end-to-end: train on a mockup Cityscapes tree, export, test."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def mockup_tree(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in (("train", 2), ("val", 1), ("test", 1)):
        img_dir = tmp_path / "robo_toy" / "leftImg8bit" / split / "c"
        gt_dir = tmp_path / "robo_toy" / "gtFine" / split / "c"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(n):
            base = f"c_{i:06d}_000019"
            rgb = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
            Image.fromarray(rgb).save(img_dir / f"{base}_leftImg8bit.png")
            ids = rng.choice([7, 13, 22], size=(64, 128)).astype(np.uint8)
            Image.fromarray(ids, mode="L").save(gt_dir / f"{base}_gtFine_labelIds.png")
    return tmp_path


def test_fcn_cli_train_then_test(tmp_path, mockup_tree, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from semantic_depth_tpu.cli import fcn as cli

    common_args = [
        "--dataset", "robo_toy",
        "--data_dir", str(mockup_tree),
        "--image_shape", "(32,64)",
        "--model_dir", str(tmp_path / "models"),
        "--logging_dir", str(tmp_path / "log"),
        "--runs_dir", str(tmp_path / "runs"),
        "--dev_tiny",
    ]
    cli.main(["--mode", "train", "--epochs", "2", "--inference_flag"] + common_args)

    model_dir = tmp_path / "models" / "2-Epochs-robo_toy"
    assert (model_dir / "fcn8s.msgpack").exists()
    # loss/iou curves
    loss_dir = tmp_path / "log" / "2-Epochs-robo_toy" / "loss"
    assert any(p.suffix == ".csv" for p in loss_dir.iterdir())
    # inference artifacts
    run_dirs = list((tmp_path / "runs" / "2-Epochs-robo_toy").iterdir())
    assert run_dirs and any(p.suffix == ".png" for p in run_dirs[0].iterdir())
    iou_files = [
        p
        for p in (tmp_path / "log" / "2-Epochs-robo_toy" / "iou").iterdir()
        if p.name.startswith("test_set_iou_")
    ]
    assert iou_files
    content = iou_files[0].read_text()
    assert "IoU metric of Testing set:" in content

    cli.main(["--mode", "test", "--model", "2-Epochs-robo_toy"] + common_args)
