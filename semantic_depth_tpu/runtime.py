"""Runtime/session helpers: persistent compilation cache, device info.

Compiles through the remote-TPU tunnel take tens of seconds; the persistent
XLA compilation cache makes every CLI/bench invocation after the first load
its executables in milliseconds. The cache lives inside the repo (gitignored)
so nothing outside the workspace is touched.
"""

from __future__ import annotations

import os

_CACHE_DIR = os.environ.get(
    "SEMANTIC_DEPTH_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)


def setup_cache() -> None:
    """Enable the persistent compilation cache (idempotent)."""
    import jax

    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached


class trace:
    """Device-level profiling around pipeline sections.

    TPU-native replacement for the reference's wall-clock time.time()
    bracketing (semantic_depth.py:100-123 and friends): wraps
    ``jax.profiler`` so the captured trace shows real device timelines,
    fusions and transfers (viewable with TensorBoard / Perfetto).

        with runtime.trace("/tmp/sd_trace"):
            pipe.process_batch(frames)

    ``runtime.annotate(name)`` adds named spans inside a trace.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False


def annotate(name: str):
    """Named span for profiler traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
