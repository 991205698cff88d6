"""AOT export of the fused pipeline — the TPU-native answer to the
reference's frozen-graph path (``optimized_graph.pb`` +
``--use_frozen``/``--use_xla``, semantic_depth.py:472-513).

``jax.export`` serializes the traced pipeline as StableHLO with the weights
baked in; ``load_pipeline`` rehydrates a callable without Python model code,
flax, or retracing — deployment artifacts for serving.
"""

from __future__ import annotations

from typing import Callable, Tuple

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
    frame_shape: Tuple[int, int, int] = (1024, 2048, 3),
    batched: bool = False,
    scalars_only: bool = True,
) -> str:
    """Serialize the pipeline for ``frame_shape`` inputs.

    scalars_only=True exports the serving surface (dist_rw, dist_f2f,
    rw_found) — unused stages (overlay composition, dense outputs) are
    dead-code-eliminated by XLA, like the reference's "optimized" graph.
    """
    from jax import export as jx

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
        jax.ShapeDtypeStruct(frame_shape, jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_pipeline(path: str) -> Callable:
    """Load an exported pipeline; returns call(frame, focal, disparity_mult)."""
    from jax import export as jx

    _register_output_serialization()  # full-output blobs need the types back
    with open(path, "rb") as f:
        exported = jx.deserialize(f.read())
    return exported.call
