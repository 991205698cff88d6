"""Native (C++) runtime components with build-on-demand + ctypes bindings.

The compute path is JAX/XLA; these are the host-runtime pieces where the
reference leaned on native wheels (OpenCV/Open3D) or burned Python time
(row-formatting PLY text through numpy). Every component has a pure-Python
fallback so the package works without a toolchain.
"""

from .build import get_library

__all__ = ["get_library"]
