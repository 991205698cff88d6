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


# ---------------------------------------------------------------------------
# Open3D legacy (0.x) outlier removal — NumPy TRANSCRIPTION of the upstream
# C++ the reference calls (statistical_outlier_removal /
# radius_outlier_removal, semantic_depth.py:227-245; the era API maps to
# RemoveStatisticalOutliers / RemoveRadiusOutliers in the 0.x sources,
# src/Geometry/DownSample.cpp, later moved onto PointCloud). open3d is not
# installed here and the reference pins no version (requirements.txt omits
# it; `from open3d import *` at semantic_depth.py:73), so each semantic
# choice below is cited to the upstream code it transcribes.
# ---------------------------------------------------------------------------


def o_knn_mean_distances(pts, k):
    """avg_distances of RemoveStatisticalOutliers:

    * KDTreeFlann.SearchKNN is run on the same cloud, so the query point is
      among its own neighbors at distance 0, and it returns min(k, n)
      neighbors when the cloud holds fewer than k points (FLANN knnSearch
      returns count = min(knn, size); Open3D resizes indices/dists to it).
    * FLANN returns SQUARED distances; upstream sqrt's each
      (`std::for_each(dist.begin(), dist.end(), ... std::sqrt(d))`) then
      averages over dist.size() — i.e. over min(k, n), zero self included.
    """
    n = pts.shape[0]
    kk = min(k, n)
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    d2s = np.sort(d2, axis=1)[:, :kk]
    return np.mean(np.sqrt(d2s), axis=1)


def o_statistical_filter(pts, cols, nb_neighbors, std_ratio):
    """RemoveStatisticalOutliers:

    * valid_distances counts points whose SearchKNN returned anything —
      on a self-search that is every point, so the moment DENOMINATORS are
      n and n - 1 (`std_dev = sqrt(sq_sum / (valid_distances - 1))`,
      Bessel's correction — upstream comments it as such);
    * the moment NUMERATORS skip avg_distance <= 0 rows (the accumulate
      lambda `dist > 0 ? sum + dist : sum` and the inner_product guard
      `x > 0 ? (x - mean) * (y - mean) : 0`);
    * a point survives iff `avg_distances[i] > 0 && avg_distances[i] <
      distance_threshold` — BOTH strict, so a point coincident with >= k-1
      duplicates of itself (avg == 0) is removed.
    """
    md = o_knn_mean_distances(pts, nb_neighbors)
    pos = md > 0
    n = md.size
    mu = md[pos].sum() / n
    sq_sum = ((md[pos] - mu) ** 2).sum()
    std = np.sqrt(sq_sum / (n - 1))
    keep = pos & (md < mu + std_ratio * std)
    return pts[keep], cols[keep]


def o_radius_filter(pts, cols, nb_points, radius):
    """RemoveRadiusOutliers:

    * `size_t nb = kdtree.SearchRadius(point, radius, ...)` — Open3D passes
      radius*radius to FLANN, whose RadiusResultSet::addPoint admits
      `dist < radius_` (STRICTLY below the squared radius); the query point
      itself (distance 0) is included in the count;
    * survive iff the count STRICTLY exceeds nb_points
      (`mask[i] = (nb_neighbors > nb_points)`).
    """
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    counts = np.sum(d2 < radius**2, axis=1)
    keep = counts > nb_points
    return pts[keep], cols[keep]


def o_reproject(disp, cx, cy, b, f):
    h, w = disp.shape
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    with np.errstate(divide="ignore"):
        inv_w = b / disp
    return np.stack([(xs - cx) * inv_w, (cy - ys) * inv_w, -f * inv_w], axis=-1)
