"""AOT export of the fused pipeline — the TPU-native answer to the
reference's frozen-graph path (``optimized_graph.pb`` +
``--use_frozen``/``--use_xla``, semantic_depth.py:472-513).

``jax.export`` serializes the traced pipeline as StableHLO with the weights
baked in; ``load_pipeline`` rehydrates a callable without Python model code,
flax, or retracing — deployment artifacts for serving.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .pipeline import SemanticDepthPipeline


_SERIALIZATION_REGISTERED = False


def _register_output_serialization() -> None:
    """Register FrameOutputs / MaskedCloud (flax struct dataclasses — empty
    static auxdata) with jax.export so full-output artifacts serialize. Safe
    to call repeatedly."""
    global _SERIALIZATION_REGISTERED
    if _SERIALIZATION_REGISTERED:
        return
    from jax import export as jx

    from .ops.pcl import MaskedCloud
    from .pipeline import FrameOutputs

    for cls, name in (
        (MaskedCloud, "semantic_depth_tpu.MaskedCloud"),
        (FrameOutputs, "semantic_depth_tpu.FrameOutputs"),
    ):
        try:
            jx.register_pytree_node_serialization(
                cls,
                serialized_name=name,
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda b: (),
            )
        except ValueError:
            pass  # already registered (e.g. by a parallel test session)
    _SERIALIZATION_REGISTERED = True


def export_pipeline(
    pipe: SemanticDepthPipeline,
    path: str,
    frame_shape: Tuple[int, ...] = (1024, 2048, 3),
    batched: bool = False,
    scalars_only: bool = True,
    frame_dtype=jnp.uint8,
) -> str:
    """Serialize the pipeline for ``frame_shape`` inputs.

    scalars_only=True exports the serving surface (dist_rw, dist_f2f,
    rw_found) — unused stages (overlay composition, dense outputs) are
    dead-code-eliminated by XLA, like the reference's "optimized" graph.

    The frame input is uint8 by default — the program casts on device, and
    uint8 keeps the 4x host->device transfer saving the live path was built
    around (pipeline.py frame handling).

    A ``<path>.meta.json`` sidecar records the export-time config scalars
    (camera focal, depth, approach, disparity multiplier, sizes) so serving
    (cli FrozenPipeline) resolves defaults from the EXPORT config, not from
    whatever config the serving CLI happened to build.
    """
    import json

    from jax import export as jx

    want_rank = 4 if batched else 3
    if len(frame_shape) != want_rank:
        raise ValueError(
            f"batched={batched} needs a rank-{want_rank} frame_shape "
            f"({'B, ' if batched else ''}H, W, 3); got {frame_shape}"
        )
    if not scalars_only:
        _register_output_serialization()
    fcn_p, mono_p = pipe.fcn_params, pipe.mono_params
    impl = pipe._process_batch_impl if batched else pipe._process_impl

    def fn(frame, focal, disparity_mult):
        out = impl(fcn_p, mono_p, frame, focal, disparity_mult)
        if scalars_only:
            return out.dist_rw, out.dist_f2f, out.rw_found
        return out

    exported = jx.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(frame_shape, frame_dtype),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    cfg = pipe.config
    meta = {
        "camera_focal": cfg.camera.focal,
        "disparity_multiplier": cfg.disparity_multiplier,
        "depth": cfg.depth,
        "approach": cfg.approach,
        "input_height": cfg.input_height,
        "input_width": cfg.input_width,
        "frame_shape": list(frame_shape),
        "frame_dtype": str(jnp.dtype(frame_dtype)),
        "batched": batched,
        "scalars_only": scalars_only,
        "flip_average": cfg.monodepth.flip_average,
        "encoder": cfg.monodepth.encoder,
    }
    # (config stays summarized: the blob already bakes the rest)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return path


def load_pipeline(path: str) -> Callable:
    """Load an exported pipeline; returns call(frame, focal, disparity_mult).
    Inputs are cast to the exported dtypes/avals (uint8 frames by default)."""
    from jax import export as jx

    _register_output_serialization()  # full-output blobs need the types back
    with open(path, "rb") as f:
        exported = jx.deserialize(f.read())

    in_avals = exported.in_avals

    def call(frame, focal, disparity_mult):
        frame = jnp.asarray(frame)
        want = in_avals[0].dtype
        if frame.dtype != want:
            # serving feeds float intensities or uint8 camera payloads; the
            # blob pins one — cast to it (values are 0..255 either way)
            frame = frame.astype(want)
        return exported.call(frame, jnp.float32(focal), jnp.float32(disparity_mult))

    return call


def load_pipeline_sharded(path: str, mesh, axis: str = "dp") -> Callable:
    """dp-sharded serving of a BATCHED frozen export (VERDICT r3 #7).

    The blob bakes a single-device program for its export batch B; here each
    device of ``mesh``'s ``axis`` runs that per-shard program on its slice of
    a global batch of B * dp frames, under one ``shard_map`` — the frozen
    analog of ``parallel.inference.ShardedPipeline``. Nothing is retraced
    through model code: the StableHLO module is the unit of distribution
    ("export per-dp-shard program, re-shard on load").

    Returns call(frames, focal, disparity_mult) with ``call.global_batch``
    set; frames must have leading dim exactly ``global_batch``.
    """
    import jax.tree_util as jtu
    from jax import export as jx
    from jax.sharding import PartitionSpec as P

    from .parallel.pp import shard_map

    _register_output_serialization()
    with open(path, "rb") as f:
        exported = jx.deserialize(f.read())
    in_avals = exported.in_avals
    if len(in_avals[0].shape) != 4:
        raise ValueError(
            "sharded frozen serving needs a BATCHED export "
            "(cli.export_pipeline --batch N); this blob takes a single frame"
        )
    blob_b = int(in_avals[0].shape[0])
    dp = mesh.shape[axis]
    global_b = blob_b * dp
    out_specs = jtu.tree_unflatten(exported.out_tree, [P(axis)] * len(exported.out_avals))

    fn = jax.jit(
        shard_map(
            lambda fr, f, m: exported.call(fr, f, m),
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=out_specs,
            check_rep=False,
        )
    )

    def call(frame, focal, disparity_mult):
        frame = jnp.asarray(frame)
        want = in_avals[0].dtype
        if frame.dtype != want:
            frame = frame.astype(want)
        if frame.shape[0] != global_b:
            raise ValueError(
                f"sharded frozen serving takes batch {global_b} "
                f"(= export batch {blob_b} x {axis}={dp}); got {frame.shape[0]}"
            )
        with mesh:
            return fn(frame, jnp.float32(focal), jnp.float32(disparity_mult))

    call.global_batch = global_b
    return call


def load_pipeline_meta(path: str) -> Optional[dict]:
    """The export-time config sidecar for a serving blob, if present."""
    import json
    import os

    meta_path = path + ".meta.json"
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)
