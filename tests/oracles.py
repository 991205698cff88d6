"""NumPy oracles implementing the reference geometry semantics
(semantic_depth_lib/pcl.py and the Open3D calls at semantic_depth.py:227-245).

Written independently against the documented behavior — these are the ground
truth the masked TPU kernels are tested against.
"""

import numpy as np


def o_keep_beyond(pts, cols, axis, to_meter):
    keep = pts[:, axis] < -to_meter
    return pts[keep], cols[keep]


def o_mad_filter(pts, cols, axis, threshold):
    x = pts[:, axis]
    med = np.median(x)
    abs_diffs = np.abs(x - med)
    mad = np.median(abs_diffs)
    with np.errstate(divide="ignore", invalid="ignore"):
        penalty = 0.6745 * abs_diffs / mad
    keep = penalty < threshold
    return pts[keep], cols[keep]


def o_threshold_abs(pts, cols, axis, threshold):
    keep = np.abs(pts[:, axis]) < threshold
    return pts[keep], cols[keep]


_PLANE_UV = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def o_fit_plane(pts, axis):
    """lstsq fit of coordinate ``axis`` on the other two; returns (Cx,Cy,Cz,C)
    with coefficient of ``axis`` equal to -1."""
    ui, vi = _PLANE_UV[axis]
    A = np.c_[pts[:, ui], pts[:, vi], np.ones(len(pts))]
    b = pts[:, axis]
    C, *_ = np.linalg.lstsq(A, b, rcond=None)
    coeffs = np.zeros(4)
    coeffs[ui] = C[0]
    coeffs[vi] = C[1]
    coeffs[axis] = -1.0
    coeffs[3] = C[2]
    return coeffs


def o_plane_inlier_filter(pts, cols, axis, threshold):
    coeffs = o_fit_plane(pts, axis)
    resid = pts @ coeffs[:3] + coeffs[3]
    keep = np.abs(resid) < threshold
    return pts[keep], cols[keep], coeffs


def o_planes_intersection(ca, cb, depth):
    z = -depth
    A = np.array([[ca[0], ca[1]], [cb[0], cb[1]]])
    B = np.array([-(ca[2] * z + ca[3]), -(cb[2] * z + cb[3])])
    x, y = np.linalg.inv(A) @ B
    return np.array([x, y, z])


def o_split_by_mean(pts, cols, axis=0):
    x = pts[:, axis]
    mean = x.mean()
    l = x < mean
    r = x > mean
    return pts[l], cols[l], pts[r], cols[r]


def o_road_endpoints(pts, depth, halfwidth=0.05):
    z = pts[:, 2]
    slab = (z < -(depth - halfwidth)) & (z > -(depth + halfwidth))
    seg = pts[slab]
    if seg.shape[0] == 0:
        return None, None
    x = seg[:, 0]
    return seg[np.argmin(x)], seg[np.argmax(x)]


def o_knn_mean_distances(pts, k):
    """Brute-force mean distance to the k nearest points (self included)."""
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    d2s = np.sort(d2, axis=1)[:, :k]
    return np.mean(np.sqrt(d2s), axis=1)


def o_statistical_filter(pts, cols, nb_neighbors, std_ratio):
    md = o_knn_mean_distances(pts, nb_neighbors)
    mu = md.mean()
    std = md.std(ddof=1)
    keep = md < mu + std_ratio * std
    return pts[keep], cols[keep]


def o_radius_filter(pts, cols, nb_points, radius):
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    counts = np.sum(d2 <= radius**2, axis=1)
    keep = counts > nb_points
    return pts[keep], cols[keep]


def o_reproject(disp, cx, cy, b, f):
    h, w = disp.shape
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    with np.errstate(divide="ignore"):
        inv_w = b / disp
    return np.stack([(xs - cx) * inv_w, (cy - ys) * inv_w, -f * inv_w], axis=-1)
