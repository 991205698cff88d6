"""Outlier-removal demo over a PLY file (reference utils/outlier_removal.py:
1-53, which used Open3D voxel downsample + statistical/radius removal).

TPU-native: loads a PLY, runs the same two filters as MXU distance kernels
(ops/neighbors.py), writes the inlier cloud (and optionally the outliers,
painted red, like display_inlier_outlier seq:74-81)."""

from __future__ import annotations

import argparse

import numpy as np


def filter_ply(
    ply_path: str,
    out_path: str,
    nb_neighbors: int = 10,
    std_ratio: float = 0.5,
    nb_points: int = 80,
    radius: float = 0.5,
    save_outliers: bool = False,
) -> str:
    import jax.numpy as jnp

    from ..io.ply import PlyCloud, read_ply
    from ..ops import neighbors, pcl

    pts, cols = read_ply(ply_path)
    n = pts.shape[0]
    cap = 1 << max(10, (n - 1).bit_length())  # next pow2 capacity
    xyz = np.zeros((cap, 3), np.float32)
    rgb = np.zeros((cap, 3), np.float32)
    xyz[:n] = pts
    rgb[:n] = cols
    cloud = pcl.MaskedCloud(
        xyz=jnp.asarray(xyz), rgb=jnp.asarray(rgb), valid=jnp.arange(cap) < n
    )
    filtered = neighbors.statistical_outlier_filter(cloud, nb_neighbors, std_ratio)
    filtered = neighbors.radius_outlier_filter(filtered, nb_points, radius)
    valid = np.asarray(filtered.valid)
    inliers = PlyCloud(np.asarray(filtered.xyz)[valid], np.asarray(filtered.rgb)[valid],
                       out_path.removesuffix(".ply"))
    if save_outliers:
        out_mask = (~valid) & (np.arange(cap) < n)
        red = np.zeros((out_mask.sum(), 3))
        red[:, 0] = 255.0
        inliers.add(np.asarray(cloud.xyz)[out_mask], red)
    print(f"{ply_path}: kept {int(valid.sum())}/{n} points")
    return inliers.save()


def main(argv=None):
    p = argparse.ArgumentParser(description="Statistical + radius outlier removal demo.")
    p.add_argument("ply", help="input PLY")
    p.add_argument("--out", default="inliers.ply")
    p.add_argument("--nb_neighbors", type=int, default=10)
    p.add_argument("--std_ratio", type=float, default=0.5)
    p.add_argument("--nb_points", type=int, default=80)
    p.add_argument("--radius", type=float, default=0.5)
    p.add_argument("--show_outliers", action="store_true",
                   help="append removed points painted red")
    args = p.parse_args(argv)
    filter_ply(args.ply, args.out, args.nb_neighbors, args.std_ratio,
               args.nb_points, args.radius, args.show_outliers)


if __name__ == "__main__":
    main()
