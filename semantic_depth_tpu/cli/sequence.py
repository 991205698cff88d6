"""Cityscapes sequence entry point (reference
semantic_depth_cityscapes_sequence.py:592-705).

Processes a sorted glob of frames with the rw approach by default, writing a
per-frame annotated overlay PNG and a masked-road PLY (with the measurement
line when found), under
``results/<name>/{result_sequence_imgs,result_sequence_ply,rendered_sequence}``.

TPU-native upgrade over the reference's strictly sequential loop: device work
for frame N+1 is dispatched while frame N's outputs are still being fetched
and written (double buffering) — the reference has no such overlap
(seq:689-701).
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

from ..config import sequence_pipeline_config
from ..io import artifacts as art
from ..io.ply import PlyCloud
from . import common


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Apply the semantic-depth pipeline to a sequence of frames."
    )
    p.add_argument("--input_folder", default="data/stuttgart_video/*.png",
                   help="glob of input frames (seq:598-602)")
    p.add_argument("--semantic_model", default="models/sem_seg/30-Epochs-cityscapes")
    p.add_argument("--monodepth_checkpoint",
                   default="models/monodepth/model_cityscapes/model_cityscapes")
    p.add_argument("--monodepth_encoder", type=str, default="vgg")
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=512)
    p.add_argument("--approach", type=str, default="rw")
    p.add_argument("--depth", type=float, default=10)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per fused device dispatch (>1 enables the "
                        "streamed batch path; frames must share a resolution)")
    p.add_argument("--output_name", default="stuttgart_video")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--use_frozen", nargs="?", const=None, default=None,
                   metavar="PATH",
                   help="serve from a StableHLO export (cli.export_pipeline "
                        "--full_outputs; use --batch N there to match this "
                        "entry's --batch). Bare flag: no-op (compat)")
    p.add_argument("--use_xla", action="store_true", help="(compat no-op)")
    p.add_argument("--CUDA_DEVICE_NUMBER", default="0", help="(compat no-op)")
    p.add_argument("--dev_tiny", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--native_s2d", action="store_true",
                   help="use the input_s2d native full-resolution variants "
                        "(space-to-depth packed trunks; needs a matching "
                        "trained weight set, e.g. .bench_weights/*_native)")
    p.add_argument("--mesh", choices=("dp", "sp", "pp"), default=None,
                   help="shard the fused program over all visible chips "
                        "(parallel/inference.py, pp.py): 'dp' = frames over "
                        "the batch axis (throughput; --batch must be a "
                        "multiple of the device count), 'sp' = image rows "
                        "within each frame (latency; frame height must "
                        "divide evenly), 'pp' = GPipe-style staged serving "
                        "(FCN / monodepth+geometry on different chips, "
                        "microbatches streaming over the ICI ring; --batch "
                        "must be a multiple of the device count)")
    return p


def save_sequence_artifacts(out, cfg, output_name, original_hw, result_images_dir, result_ply_dir):
    common.require_dense_outputs(out, "the sequence artifact suite")
    line_found = bool(out.rw_found)
    dist_rw = float(out.dist_rw)
    left = np.asarray(out.left_pt_rw)
    right = np.asarray(out.right_pt_rw)

    # full-res annotated overlay (seq:305-346)
    overlay_small = np.asarray(out.overlay_small)
    oh, ow = original_hw
    overlay_full = common.host_resize(overlay_small.astype(np.float32), oh, ow)
    annotated = common.annotate_sequence(overlay_full, cfg.depth, line_found, dist_rw, left, right)
    common.imwrite(os.path.join(result_images_dir, f"{output_name}.png"), annotated)

    # masked-road PLY + rw line (seq:355-361)
    road_valid = np.asarray(out.road_cloud.valid)
    road_xyz = np.asarray(out.road_cloud.xyz)[road_valid]
    road_rgb = np.asarray(out.road_cloud.rgb)[road_valid]
    ply = PlyCloud(road_xyz, road_rgb, os.path.join(result_ply_dir, f"{output_name}_rw"))
    if line_found:
        line, cols = art.measurement_line(left, right, [250, 0, 0])
        ply.add(line, cols)
    ply.save()
    return dist_rw if line_found else None


def main(argv=None):
    from ..runtime import setup_cache

    setup_cache()
    args = build_arg_parser().parse_args(argv)
    cfg = sequence_pipeline_config(
        input_height=args.input_height,
        input_width=args.input_width,
        approach=args.approach,
        depth=args.depth,
    )
    cfg = common.apply_encoder_override(cfg, args.monodepth_encoder)
    if args.use_frozen:
        if args.mesh and args.mesh != "dp":
            raise SystemExit("--mesh sp/pp cannot serve a frozen export "
                             "(the blob's program is a per-device unit; only "
                             "batch sharding composes with it); use --mesh dp "
                             "over a batched export, or drop --use_frozen")
        if args.mesh == "dp":
            import jax

            from ..parallel import make_mesh

            n = len(jax.devices())
            pipe = common.FrozenPipeline(
                args.use_frozen, cfg, mesh=make_mesh(n, dp=n, tp=1)
            )
            if args.batch != pipe.global_batch:
                raise SystemExit(
                    f"--mesh dp over this frozen export serves batch "
                    f"{pipe.global_batch} (= export batch x {n} devices); "
                    f"pass --batch {pipe.global_batch}"
                )
        else:
            pipe = common.FrozenPipeline(args.use_frozen, cfg)
        # the blob bakes depth/approach/camera — artifacts and annotations
        # must describe what was actually computed
        cfg = pipe.config
    else:
        pipe = common.build_pipeline(
            cfg, args.semantic_model, args.monodepth_checkpoint,
            tiny=args.dev_tiny, native_s2d=args.native_s2d,
        )
    if args.mesh and not args.use_frozen:  # frozen+dp sharded above
        import jax

        from ..parallel import make_mesh, make_spatial_mesh
        from ..parallel.inference import ShardedPipeline

        n = len(jax.devices())
        if args.mesh == "dp":
            if args.batch % n != 0:
                raise SystemExit(
                    f"--mesh dp shards the batch over {n} devices; "
                    f"--batch {args.batch} must be a multiple of {n}"
                )
            mesh = make_mesh(n, dp=n, tp=1)
            pipe = ShardedPipeline(pipe, mesh)
        elif args.mesh == "pp":
            from ..parallel import PipelinedPipeline, make_pp_mesh

            if n < 2 or n % 2 != 0:
                raise SystemExit(
                    f"--mesh pp stages the pipeline across chips; needs an "
                    f"even device count >= 2, got {n}"
                )
            # the real constraint is divisibility by dp = n/2 (each micro-
            # batch shards over the dp axis; process_batch picks the
            # microbatch count) — batch 12 on 8 chips is fine (mb=4, T=3)
            if args.batch % (n // 2) != 0:
                raise SystemExit(
                    f"--mesh pp microbatches over dp={n // 2} devices x 2 "
                    f"stages; --batch {args.batch} must be a multiple of {n // 2}"
                )
            pipe = PipelinedPipeline(pipe, make_pp_mesh(n, dp=n // 2, pp=2))
        else:
            mesh = make_spatial_mesh(n)
            pipe = ShardedPipeline(pipe, mesh)

    out_root = os.path.join(args.results_dir, args.output_name)
    result_images_dir = os.path.join(out_root, "result_sequence_imgs")
    result_ply_dir = os.path.join(out_root, "result_sequence_ply")
    rendered_dir = os.path.join(out_root, "rendered_sequence")
    for d in (result_images_dir, result_ply_dir, rendered_dir):
        os.makedirs(d, exist_ok=True)

    frames = sorted(glob(args.input_folder))
    if not frames:
        raise SystemExit(f"no frames match {args.input_folder}")

    def load(path):
        try:
            return common.imread_bgr(path)
        except Exception as e:  # corrupt/unreadable frame: log and continue
            print(f"WARNING: skipping unreadable frame {path}: {e}")
            return None

    if args.batch > 1 or args.mesh:
        # Streamed batch mode: B frames per fused device dispatch (the
        # process_batch path the bench uses); one dispatch amortizes all
        # per-call overheads. Frames in one batch must share a resolution
        # (sequences do); ragged tails run as smaller batches. --mesh always
        # takes this path (the sharded program is a batch program).
        pending = []  # (names, hws, batched FrameOutputs)
        import jax

        def flush(batch_items):
            if not batch_items:
                return
            names, hws, imgs = zip(*batch_items)
            imgs = list(imgs)
            if (args.use_frozen or args.mesh) and len(imgs) < args.batch:
                # a frozen blob is shape-specialized to --batch N, and a
                # dp-sharded program needs device-count-divisible batches:
                # pad ragged tails by repeating the last frame and drop the
                # padding in drain (names/hws keep only the real frames)
                imgs += [imgs[-1]] * (args.batch - len(imgs))
            # ship uint8 — 4x less host->device traffic; the fused program
            # casts on device (pipeline.py frames.astype)
            outs = pipe.process_batch(np.stack(imgs))
            common.require_dense_outputs(outs, "the sequence artifact suite")
            pending.append((names, hws, outs))
            while len(pending) > 1:
                drain(pending.pop(0))

        def drain(entry):
            names, hws, outs = entry
            for i, (name, hw) in enumerate(zip(names, hws)):
                one = jax.tree.map(lambda x: x[i], outs)
                d = save_sequence_artifacts(one, cfg, name, hw,
                                            result_images_dir, result_ply_dir)
                if args.verbose and d is not None:
                    print("Road width", d)

        batch_items = []
        # threaded decode prefetch: frame N+k decodes while the device is
        # busy with the current batch (VERDICT r4 #4)
        for path, frame in common.prefetch_decoded(frames, load):
            if frame is None:
                continue
            print(f"\n\nPROCESSING NEW FRAME! {path}\n")
            name = os.path.splitext(os.path.basename(path))[0]
            if batch_items and frame.shape[:2] != batch_items[0][2].shape[:2]:
                flush(batch_items)
                batch_items = []
            batch_items.append((name, frame.shape[:2], frame))
            if len(batch_items) == args.batch:
                flush(batch_items)
                batch_items = []
        flush(batch_items)
        for entry in pending:
            drain(entry)
        return

    # Double-buffered streaming: dispatch N+1 before fetching N, with decode
    # prefetched on worker threads (VERDICT r4 #4).
    pending = []  # list of (output_name, original_hw, FrameOutputs)
    for path, frame in common.prefetch_decoded(frames, load):
        if frame is None:
            continue
        print(f"\n\nPROCESSING NEW FRAME! {path}\n")
        out = pipe.process_frame(frame)  # uint8 payload; device-side cast
        output_name = os.path.splitext(os.path.basename(path))[0]
        pending.append((output_name, frame.shape[:2], out))
        if len(pending) > 1:
            name, hw, prev = pending.pop(0)
            d = save_sequence_artifacts(prev, cfg, name, hw, result_images_dir, result_ply_dir)
            if args.verbose and d is not None:
                print("Road width", d)
    for name, hw, prev in pending:
        save_sequence_artifacts(prev, cfg, name, hw, result_images_dir, result_ply_dir)


if __name__ == "__main__":
    main()
