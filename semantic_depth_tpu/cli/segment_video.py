"""Video segmentation demo (reference fcn8s/segment_video_robo.py:45-202 —
which is broken as shipped: it imports a nonexistent ``load_graph`` module
and hardcodes model paths; this rebuild is a working equivalent).

Segments every frame of an input video with FCN-8s and writes an overlay
video. Decoding/encoding are host cv2; segmentation + overlay composition run
as one jitted device program per frame batch.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from ..runtime import setup_cache

    setup_cache()

    p = argparse.ArgumentParser(description="Segment a video with FCN-8s.")
    p.add_argument("--input_video", required=True)
    p.add_argument("--output_video", default=None)
    p.add_argument("--semantic_model", default="models/sem_seg/100-Epochs-roborace750")
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=512)
    p.add_argument("--batch", type=int, default=8, help="frames per device dispatch")
    p.add_argument("--dev_tiny", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from ..models import FCN8s
    from ..ops.overlay import segmentation_overlay
    from ..ops.resize import resize_clip_u8
    from . import common

    hw = (args.input_height, args.input_width)
    if args.dev_tiny:
        fcn = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=32)
    else:
        fcn = FCN8s(num_classes=3)
    params = common.load_fcn_params(fcn, args.semantic_model, hw)

    @jax.jit
    def segment_batch(fcn_params, frames):  # (B, H0, W0, 3) BGR uint8/f32
        small = jax.vmap(lambda f: resize_clip_u8(f.astype(jnp.float32), hw))(frames)
        probs = jax.nn.softmax(fcn.apply(fcn_params, small), axis=-1)
        road = probs[..., 0] > 0.5
        fence = probs[..., 1] > 0.5
        return jax.vmap(
            lambda f, r, fe: segmentation_overlay(
                f, r, fe, (128, 64, 128, 64), (160, 10, 10, 64)
            )
        )(small, road, fence)

    cap = cv2.VideoCapture(args.input_video)
    if not cap.isOpened():
        raise SystemExit(f"cannot open {args.input_video}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30
    out_path = args.output_video or (os.path.splitext(args.input_video)[0] + "_seg.mp4")
    writer = None
    batch = []
    n_frames = 0

    def flush(batch):
        nonlocal writer, n_frames
        if not batch:
            return
        frames = np.stack(batch)  # uint8 payload; device-side cast
        overlays = np.asarray(segment_batch(params, jnp.asarray(frames)))
        for src, ov in zip(batch, overlays):
            full = common.host_resize(ov.astype(np.float32), src.shape[0], src.shape[1])
            if writer is None:
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                    (src.shape[1], src.shape[0]),
                )
            writer.write(np.clip(full, 0, 255).astype(np.uint8))
            n_frames += 1

    while True:
        ok, frame = cap.read()
        if not ok:
            break
        batch.append(frame)
        if len(batch) == args.batch:
            flush(batch)
            batch = []
    flush(batch)
    cap.release()
    if writer is not None:
        writer.release()
    print(f"wrote {n_frames} frames to {out_path}")


if __name__ == "__main__":
    main()
