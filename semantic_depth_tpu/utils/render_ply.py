"""Offscreen point-cloud rendering (reference utils/render_ply.py:7-58).

The reference renders result PLYs with Open3D's Visualizer from saved pinhole
parameters. Open3D is absent here, and the TPU-native answer is simpler and
faster anyway: a z-buffer point splatter as a scatter-min program — project
every point with a pinhole camera, keep the nearest point per pixel
(`jnp.ndarray.at[...].min` scatter), then gather colors. Runs jitted on the
accelerator for large clouds, or on CPU, identically.
"""

from __future__ import annotations

import argparse
import functools
from typing import Optional, Tuple

import numpy as np


@functools.lru_cache(maxsize=1)
def _get_render_fn():
    """Module-level jitted splatter, cached per static (h, w, ...) config: a
    closure jitted inside render_points would be a fresh function object per
    call, missing jax.jit's cache and recompiling every render."""
    import jax

    @functools.partial(
        jax.jit,
        static_argnames=("h", "w", "focal", "look_forward_z", "background"),
    )
    def _render(pts, cols, *, h, w, focal, look_forward_z, background):
        import jax.numpy as jnp

        z = pts[:, 2] * look_forward_z  # depth along view direction, >0 in front
        valid = z > 0.1
        zs = jnp.where(valid, z, jnp.inf)
        u = pts[:, 0] / zs * focal + w / 2.0
        v = -pts[:, 1] / zs * focal + h / 2.0
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inside = valid & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        flat = jnp.where(inside, vi * w + ui, h * w)  # dropped slot

        # z-buffer: scatter-min depth, then keep points that won their pixel
        zbuf = jnp.full((h * w + 1,), jnp.inf, jnp.float32).at[flat].min(zs)
        won = inside & (zs <= zbuf[flat])

        img = jnp.full((h * w + 1, 3), background, jnp.float32)
        # splat winners (last-write order within winners is arbitrary but all
        # winners per pixel have ~equal depth)
        img = img.at[jnp.where(won, flat, h * w)].set(cols)
        return img[: h * w].reshape(h, w, 3)

    return _render


def render_points(
    points: np.ndarray,
    colors: np.ndarray,
    image_hw: Tuple[int, int] = (512, 1024),
    focal: float = 500.0,
    camera_pos: Optional[np.ndarray] = None,
    look_forward_z: float = -1.0,
    splat: int = 2,
    background: float = 255.0,
) -> np.ndarray:
    """Render (N, 3) points with (N, 3) 0..255 colors to an (H, W, 3) uint8
    image. The camera looks down +z*look_forward_z from camera_pos (defaults
    to slightly above the origin, matching the semantic-depth world where the
    road recedes toward -z)."""
    import jax.numpy as jnp

    h, w = image_hw
    if camera_pos is None:
        camera_pos = np.array([0.0, 0.5, 1.0])
    pts = jnp.asarray(points, jnp.float32) - jnp.asarray(camera_pos, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)

    render = _get_render_fn()
    out = np.asarray(
        render(
            pts, cols, h=h, w=w, focal=float(focal),
            look_forward_z=float(look_forward_z), background=float(background),
        )
    )
    if splat > 1:
        # simple dilation so sparse clouds remain visible
        import cv2

        mask = np.all(out == background, axis=-1)
        dil = cv2.dilate(out.astype(np.uint8), np.ones((splat, splat), np.uint8))
        out = np.where(mask[..., None], dil, out)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_ply_file(ply_path: str, png_path: str, **kwargs) -> str:
    from ..io.ply import read_ply

    pts, cols = read_ply(ply_path)
    img = render_points(pts, cols, **kwargs)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(png_path, img, dpi=1)
    return png_path


def main(argv=None):
    p = argparse.ArgumentParser(description="Render PLY point clouds to PNG.")
    p.add_argument("plys", nargs="+", help="PLY files to render")
    p.add_argument("--out_dir", default=".")
    p.add_argument("--focal", type=float, default=500.0)
    args = p.parse_args(argv)
    import os

    for ply in args.plys:
        png = os.path.join(
            args.out_dir, os.path.splitext(os.path.basename(ply))[0] + ".png"
        )
        print(render_ply_file(ply, png, focal=args.focal))


if __name__ == "__main__":
    main()
