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


def _common_args(mockup_tree, tmp_path):
    return [
        "--dataset", "robo_toy",
        "--data_dir", str(mockup_tree),
        "--image_shape", "(32,64)",
        "--model_dir", str(tmp_path / "models"),
        "--logging_dir", str(tmp_path / "log"),
        "--runs_dir", str(tmp_path / "runs"),
        "--dev_tiny",
    ]


def test_fcn_warm_start_from_encoder_only_vgg_ckpt(tmp_path, mockup_tree):
    """--init_from with a synthetic VGG-named encoder-only TF1 checkpoint:
    encoder layers carry the checkpoint values, decoder keeps trunc-normal
    (the reference's load_vgg warm start, fcn.py:82-95)."""
    tf = pytest.importorskip("tensorflow")
    import jax

    from semantic_depth_tpu.cli import fcn as cli
    from semantic_depth_tpu.models import weights as W

    args = cli.build_arg_parser().parse_args(
        ["--mode", "train", "--epochs", "1"] + _common_args(mockup_tree, tmp_path)
    )
    # template shapes for the dev_tiny model
    probe = cli.make_trainer(args)
    p = probe.state.params["params"]

    rng = np.random.default_rng(7)
    var_specs = {}
    for tf_scope, our in W._FCN_VGG_NAME_MAP.items():
        var_specs[f"{tf_scope}/filter"] = rng.normal(
            size=np.asarray(p[our]["kernel"]).shape
        ).astype(np.float32)
        var_specs[f"{tf_scope}/biases"] = rng.normal(
            size=np.asarray(p[our]["bias"]).shape
        ).astype(np.float32)

    tf1 = tf.compat.v1
    ckpt_prefix = os.path.join(str(tmp_path), "vgg", "model")
    os.makedirs(os.path.dirname(ckpt_prefix))
    with tf1.Graph().as_default():
        for name, arr in var_specs.items():
            tf1.get_variable(name, initializer=tf.constant(arr))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    args = cli.build_arg_parser().parse_args(
        ["--mode", "train", "--epochs", "1", "--init_from", ckpt_prefix]
        + _common_args(mockup_tree, tmp_path)
    )
    trainer = cli.make_trainer(args)
    warm = trainer.state.params["params"]
    # every encoder layer == checkpoint
    for tf_scope, our in W._FCN_VGG_NAME_MAP.items():
        np.testing.assert_array_equal(
            np.asarray(warm[our]["kernel"]), var_specs[f"{tf_scope}/filter"]
        )
    # decoder untouched: same trunc-normal init as the probe trainer
    for name in ("score_fc7", "upscore8"):
        np.testing.assert_array_equal(
            np.asarray(warm[name]["kernel"]), np.asarray(p[name]["kernel"])
        )
        assert float(np.abs(np.asarray(warm[name]["kernel"])).std()) < 0.05


def test_fcn_warm_start_faster_ramp_than_random(tmp_path, mockup_tree, monkeypatch):
    """Warm-starting from a 2-epoch export must beat random init after one
    further epoch (VERDICT r1 item 2 'faster IoU ramp' criterion)."""
    monkeypatch.chdir(tmp_path)
    from semantic_depth_tpu.cli import fcn as cli

    common = _common_args(mockup_tree, tmp_path)

    # pre-train 2 epochs and export
    cli.main(["--mode", "train", "--epochs", "2"] + common)
    msgpack = tmp_path / "models" / "2-Epochs-robo_toy" / "fcn8s.msgpack"
    assert msgpack.exists()

    def one_epoch(init_from=None):
        argv = ["--mode", "train", "--epochs", "1"] + common
        if init_from:
            argv += ["--init_from", str(init_from)]
        args = cli.build_arg_parser().parse_args(argv)
        trainer = cli.make_trainer(args)
        history = trainer.fit(cli.make_dataset(args), verbose=False)
        return history

    cold = one_epoch()
    warm = one_epoch(msgpack)
    assert warm["val_loss"][-1] < cold["val_loss"][-1], (warm, cold)
    assert warm["val_iou"][-1] >= cold["val_iou"][-1], (warm, cold)
