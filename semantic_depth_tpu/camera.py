"""Pinhole back-projection: disparity map -> 3D point cloud.

TPU-native replacement for ``cv2.reprojectImageTo3D(disp, Q)`` with the
hand-built Q matrix of the reference (semantic_depth.py:691-697):

    Q = [[1,  0,  0,   -cx ],
         [0, -1,  0,    cy ],   # rotate 180 deg about x: y up, z toward viewer
         [0,  0,  0,   -f  ],
         [0,  0, 1/b,   0  ]]

For pixel (x, y) with disparity d the homogeneous product gives
``[x-cx, cy-y, -f, d/b]``, i.e. after perspective division

    X = (x - cx) * b / d
    Y = (cy - y) * b / d
    Z = -f * b / d            (points in front of the camera have z < 0)

This is a pure elementwise function — XLA fuses it into the surrounding
program; no host OpenCV round trip.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import CameraConfig


def reproject_disparity(disp: jnp.ndarray, camera: CameraConfig) -> jnp.ndarray:
    """Back-project a disparity map into 3D points.

    Args:
      disp: (H, W) float array of disparities in pixels (already multiplied by
        the disparity multiplier, cf. semantic_depth.py:145).
      camera: pinhole intrinsics.

    Returns:
      (H, W, 3) float32 array of (X, Y, Z) camera-frame points matching
      ``cv2.reprojectImageTo3D`` semantics for the reference Q matrix. Where
      d == 0 the result is +-inf exactly as OpenCV leaves it (no
      handleMissingValues in the reference call, semantic_depth.py:696).
    """
    h, w = disp.shape
    disp = disp.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    inv_w = camera.baseline / disp  # b / d
    x3 = (xs - camera.cx) * inv_w
    y3 = (camera.cy - ys) * inv_w
    z3 = (-camera.focal) * inv_w
    return jnp.stack([x3, y3, z3], axis=-1)
