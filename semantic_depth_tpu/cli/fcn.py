"""FCN-8s train/test entry point (reference fcn8s/fcn.py:601-680).

Train mode: epochs over a Cityscapes-layout dataset with the reference
augmentations and hyperparameters, per-epoch loss/IoU curves (CSV + PNG),
model export (orbax step checkpoint + fcn8s.msgpack for the inference CLIs).

Test mode: restores a model, computes test-set mean IoU, writes per-image
overlay PNGs under runs/<model>/<timestamp>/ and the IoU log under
log/<model>/iou/ — mirroring FCN.inference (fcn.py:384-492).

Multi-device: pass --mesh to train data-parallel x tensor-parallel over all
local devices (new capability; the reference is single-GPU).
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

import numpy as np

from ..config import TrainConfig
from ..models import FCN8s
from ..train.data import SegmentationDataset
from ..train.metrics import MeanIoU
from ..train.trainer import FCNTrainer


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FCN-8s implementation (TPU-native).")
    p.add_argument("--mode", type=str, default="train", help="train or test")
    p.add_argument("--epochs", type=int, help="number of training epochs")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--inference_flag", action="store_true")
    p.add_argument("--learning_rate", type=float, default=0.00001)
    p.add_argument("--dropout", type=float, default=0.5,
                   help="keep probability (reference semantics)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--image_shape", default=(256, 512))
    p.add_argument("--runs_dir", type=str, default="runs")
    p.add_argument("--data_dir", type=str, default="../data")
    p.add_argument("--train_gt_subdir", type=str, default="gtFine/train")
    p.add_argument("--train_imgs_subdir", type=str, default="leftImg8bit/train")
    p.add_argument("--val_gt_subdir", type=str, default="gtFine/val")
    p.add_argument("--val_imgs_subdir", type=str, default="leftImg8bit/val")
    p.add_argument("--test_gt_subdir", type=str, default="gtFine/test")
    p.add_argument("--test_imgs_subdir", type=str, default="leftImg8bit/test")
    p.add_argument("--model_dir", type=str, default="../models/sem_seg")
    p.add_argument("--logging_dir", type=str, default="log")
    p.add_argument("--model", type=str, default=None,
                   help="model name for test mode ('<epochs>-Epochs-<dataset>'); "
                        "read interactively if omitted (reference fcn.py:666-668)")
    p.add_argument("--mesh", action="store_true",
                   help="train data/tensor-parallel over all local devices")
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start training from a .msgpack export, a full "
                        "FCN TF1 checkpoint, or an encoder-only VGG16 TF1 "
                        "checkpoint (dir or prefix). Encoder-only checkpoints "
                        "keep the trunc-normal decoder init — the reference "
                        "always warm-starts this way from the Udacity VGG16 "
                        "SavedModel (fcn8s/fcn.py:82-95, helper.py:60-94)")
    p.add_argument("--dev_tiny", action="store_true", help=argparse.SUPPRESS)
    return p


def make_dataset(args) -> SegmentationDataset:
    shape = args.image_shape
    if isinstance(shape, str):
        shape = tuple(int(x) for x in shape.strip("()").split(","))
    return SegmentationDataset(
        args.data_dir,
        args.dataset,
        image_shape=shape,
        train_gt_subdir=args.train_gt_subdir,
        train_imgs_subdir=args.train_imgs_subdir,
        val_gt_subdir=args.val_gt_subdir,
        val_imgs_subdir=args.val_imgs_subdir,
        test_gt_subdir=args.test_gt_subdir,
        test_imgs_subdir=args.test_imgs_subdir,
    )


def make_trainer(args) -> FCNTrainer:
    shape = args.image_shape
    if isinstance(shape, str):
        shape = tuple(int(x) for x in shape.strip("()").split(","))
    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        dropout=args.dropout,
        batch_size=int(args.batch_size),
        num_classes=args.num_classes,
        epochs=args.epochs or 1,
        image_shape=shape,
    )
    if args.dev_tiny:
        model = FCN8s(num_classes=cfg.num_classes, dropout_keep_prob=cfg.dropout,
                      width_mult=0.125, fc_channels=32)
    else:
        model = FCN8s(num_classes=cfg.num_classes, dropout_keep_prob=cfg.dropout)
    mesh = None
    if getattr(args, "mesh", False):
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()  # dp x tp over all local devices
    trainer = FCNTrainer(cfg, model=model, mesh=mesh)
    if getattr(args, "init_from", None):
        trainer.set_params(
            load_warm_start(model, trainer.state.params, args.init_from)
        )
    return trainer


def load_warm_start(model: FCN8s, template, path: str):
    """Resolve --init_from: .msgpack (full params), a full FCN TF1 checkpoint
    (VGG + decoder, fcn.py save_model layout), or an encoder-only VGG16
    checkpoint — in which case the decoder keeps the template's trunc-normal
    1e-2 init, exactly like the reference's load_vgg warm start
    (fcn8s/fcn.py:82-95)."""
    from ..models import weights as weights_lib

    if os.path.isfile(path) and path.endswith(".msgpack"):
        return weights_lib.load_params(template, path)

    import tensorflow as tf

    ckpt = path
    if os.path.isdir(path):
        var_dir = os.path.join(path, "variables")
        ckpt = tf.train.latest_checkpoint(var_dir if os.path.isdir(var_dir) else path)
        if ckpt is None:
            raise FileNotFoundError(f"no TF checkpoint found under {path}")
    try:
        converted = weights_lib.convert_fcn_checkpoint(ckpt)
        return weights_lib.as_jax_params(template, converted)
    except KeyError:
        # no decoder variables -> encoder-only VGG16 checkpoint
        converted = weights_lib.convert_vgg_checkpoint(ckpt)
        params, loaded = weights_lib.graft_partial(template, converted)
        print(f"Warm start: loaded {len(loaded)} encoder layers from {ckpt}; "
              "decoder keeps trunc-normal init")
        return params


def run_inference(trainer: FCNTrainer, dataset: SegmentationDataset, args, model_name: str):
    """Test-set IoU + overlay PNGs + times.txt (fcn.py:384-492)."""
    import jax.numpy as jnp

    from ..ops.overlay import segmentation_overlay
    from . import common

    time_str = datetime.now()
    time_str = "{}_{}_{} {}-{}".format(
        time_str.year, time_str.month, time_str.day, time_str.hour, time_str.minute
    )
    output_dir = os.path.join(args.runs_dir, model_name, time_str)
    os.makedirs(output_dir, exist_ok=True)

    gt_dir, imgs_dir = dataset.dirs["test"]
    from ..train.data import get_files_paths

    _, imgs_paths = get_files_paths(gt_dir, imgs_dir)

    miou = MeanIoU(args.num_classes)
    per_image = []
    times = []
    for (images, labels), image_file in zip(dataset.batches(1, mode="test"), imgs_paths):
        t0 = time.time()
        m = trainer.eval_batch(jnp.asarray(images), jnp.asarray(labels))
        miou.cm = miou.cm + m["cm"]
        per_image.append(miou.result())  # running IoU, like the streaming metric
        t1 = time.time() - t0
        probs = m["probs"][0]
        road = probs[:, :, 0] > 0.5
        fence = probs[:, :, 1] > 0.5
        overlay = np.asarray(
            segmentation_overlay(
                jnp.asarray(images[0]), jnp.asarray(road), jnp.asarray(fence),
                (128, 64, 128, 64), (190, 153, 153, 64),  # fcn.py:450,457
            )
        )
        t2 = time.time() - t0
        times.append(f"{t1} {t2}\n")
        out_path = os.path.join(output_dir, os.path.basename(image_file))
        common.imwrite(out_path, overlay[:, :, ::-1])  # RGB -> BGR for writer

    with open("times.txt", "w") as f:
        for pair in times:
            f.write(pair)

    test_mean_iou = miou.result()
    print("TEST: mean iou of test set: {}".format(test_mean_iou))
    metric_path = os.path.join(args.logging_dir, model_name, "iou")
    os.makedirs(metric_path, exist_ok=True)
    with open(os.path.join(metric_path, f"test_set_iou_{time_str}.txt"), "w") as f:
        for iou in per_image:
            f.write(f"{iou}\n")
        f.write(f"IoU metric of Testing set: {test_mean_iou}")
    return test_mean_iou


def main(argv=None):
    from ..runtime import setup_cache

    setup_cache()
    args = build_arg_parser().parse_args(argv)

    if args.mode == "train":
        if args.epochs is None:
            raise SystemExit("train mode requires --epochs.")
        model_name = f"{args.epochs}-Epochs-{args.dataset}"
    else:
        model_name = args.model
        while not model_name:
            model_name = input(
                "Enter the name of the model you want to use in the format "
                "'<epochs>-Epochs-<dataset>' \n--> "
            )

    dataset = make_dataset(args)
    trainer = make_trainer(args)
    model_var_dir = os.path.join(args.model_dir, model_name)

    if args.mode == "train":
        trainer.fit(dataset, log_dir=args.logging_dir, model_name=model_name)
        if args.inference_flag:
            run_inference(trainer, dataset, args, model_name)
        os.makedirs(model_var_dir, exist_ok=True)
        trainer.save_msgpack(os.path.join(model_var_dir, "fcn8s.msgpack"))
        trainer.save_checkpoint(os.path.join(model_var_dir, "orbax"))
        print(f"Saving model to: {model_var_dir}")
    elif args.mode == "test":
        # native msgpack export OR a reference-layout TF SavedModel dir
        # (<model>/variables/saved_model.*, fcn.py:100-107) — the reference
        # test mode restores its SavedModel directly (fcn.py:583-595).
        from . import common

        trainer.set_params(
            common.load_fcn_params(trainer.model, model_var_dir, dataset.image_shape)
        )
        run_inference(trainer, dataset, args, model_name)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
