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
