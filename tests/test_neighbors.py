"""Outlier-removal kernels vs brute-force oracles (Open3D-replacement)."""

import numpy as np

from semantic_depth_tpu.ops import neighbors, pcl

import oracles as o


def make_cloud(n=300, capacity=512, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    # add a tight cluster so radius counts vary meaningfully
    pts[: n // 2] *= 0.1
    xyz = np.zeros((capacity, 3), np.float32)
    xyz[:n] = pts
    xyz[n:] = 50.0  # garbage that must not count as neighbors
    valid = np.arange(capacity) < n
    cloud = pcl.MaskedCloud(xyz=xyz, rgb=np.zeros_like(xyz), valid=valid)
    return cloud, pts


def test_knn_mean_distances_matches_bruteforce():
    cloud, pts = make_cloud()
    got = np.asarray(neighbors.knn_mean_distances(cloud, 10, block_size=128))
    want = o.o_knn_mean_distances(pts.astype(np.float64), 10)
    np.testing.assert_allclose(got[:300], want, rtol=1e-3, atol=1e-4)
    assert np.all(np.isinf(got[300:]))


def test_exact_pallas_knn_matches_xla_path():
    """The Pallas exact-kNN kernel must reproduce knn_mean_distances (same
    k-smallest set incl. duplicate distances; distances to f32 round-off)."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_exact_knn import knn_mean_distances_exact_pallas

    cloud, pts = make_cloud(n=300, capacity=512)
    want = np.asarray(neighbors.knn_mean_distances(cloud, 10, block_size=128))
    got = np.asarray(
        knn_mean_distances_exact_pallas(
            jnp.asarray(cloud.xyz), jnp.asarray(cloud.valid), 10, tq=128, cb=128
        )
    )
    finite = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], want[finite], rtol=0, atol=1e-5)


def test_exact_pallas_knn_duplicates_and_sparse():
    """Duplicate coordinates must count multiply; < k valid candidates ->
    mean over the min(k, n) found (SearchKNN semantics, oracles.py)."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_exact_knn import knn_mean_distances_exact_pallas

    capacity = 256
    xyz = np.full((capacity, 3), 9.0, np.float32)
    xyz[:4] = 0.0  # four coincident points
    xyz[4] = [1.0, 0.0, 0.0]
    valid = np.zeros(capacity, bool)
    valid[:5] = True
    got = np.asarray(
        knn_mean_distances_exact_pallas(
            jnp.asarray(xyz), jnp.asarray(valid), 4, tq=128, cb=128
        )
    )
    # point 0's 4-NN: three zeros (duplicates) + itself -> mean 0
    assert got[0] == 0.0
    # point 4's 4-NN: itself + three of the coincident points at distance 1
    np.testing.assert_allclose(got[4], 3.0 / 4.0, atol=1e-6)
    assert np.all(np.isinf(got[5:]))

    # fewer than k valid candidates in the whole cloud -> average over the
    # n that exist (upstream SearchKNN returns min(k, n) neighbors)
    valid2 = np.zeros(capacity, bool)
    valid2[:3] = True
    got2 = np.asarray(
        knn_mean_distances_exact_pallas(
            jnp.asarray(xyz), jnp.asarray(valid2), 4, tq=128, cb=128
        )
    )
    want2 = o.o_knn_mean_distances(xyz[:3], 4)
    np.testing.assert_allclose(got2[:3], want2, rtol=1e-6)
    assert np.all(np.isinf(got2[3:]))


def test_radius_counts_pallas_matches_xla_path():
    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_exact_knn import radius_counts_pallas

    cloud, pts = make_cloud(n=300, capacity=512)
    want = np.asarray(neighbors.radius_counts(cloud, 0.5, block_size=128))
    got = np.asarray(
        radius_counts_pallas(
            jnp.asarray(cloud.xyz), jnp.asarray(cloud.valid), 0.5, tq=128, cb=128
        )
    )
    np.testing.assert_array_equal(got, want)

    # and under vmap (the batch pipeline vmaps the geometry chain)
    xyzs = jnp.stack([cloud.xyz, cloud.xyz * 0.5])
    valids = jnp.stack([cloud.valid, cloud.valid])
    got_b = np.asarray(
        jax.vmap(lambda x, v: radius_counts_pallas(x, v, 0.5, tq=128, cb=128))(
            xyzs, valids
        )
    )
    np.testing.assert_array_equal(got_b[0], want)


def test_radius_counts_pallas_nan_garbage_row0():
    """Invalid rows are 'inert garbage' (MaskedCloud doc) — including row 0
    and including NaN (from_dense back-projections genuinely produce
    non-finite garbage at masked pixels). The query fill must come from a
    VALID row: a NaN fill would poison the per-tile z-range and the
    block-skip test would silently zero counts for the tile's VALID
    queries too."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_exact_knn import radius_counts_pallas

    cloud, pts = make_cloud(n=300, capacity=512)
    # rotate validity so rows 0..9 are invalid, and poison them with NaN
    xyz = np.roll(np.asarray(cloud.xyz), 10, axis=0)
    valid = np.roll(np.asarray(cloud.valid), 10)
    xyz[:10] = np.nan
    shifted = pcl.MaskedCloud(xyz=xyz, rgb=np.zeros_like(xyz), valid=valid)

    want = np.asarray(neighbors.radius_counts(shifted, 0.5, block_size=128))
    got = np.asarray(
        radius_counts_pallas(
            jnp.asarray(xyz), jnp.asarray(valid), 0.5, tq=128, cb=128
        )
    )
    np.testing.assert_array_equal(got, want)
    assert want[valid].min() >= 1  # self-inclusion: valid counts are nonzero


def test_statistical_filter_matches_oracle():
    cloud, pts = make_cloud(seed=1)
    out = neighbors.statistical_outlier_filter(cloud, 10, 0.5, block_size=128)
    ref_p, _ = o.o_statistical_filter(pts.astype(np.float64), np.zeros_like(pts), 10, 0.5)
    got_p = np.asarray(out.xyz)[np.asarray(out.valid)]
    assert got_p.shape == ref_p.shape
    a = got_p[np.lexsort(got_p.T)]
    b = ref_p[np.lexsort(ref_p.T)].astype(np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_radius_filter_matches_oracle():
    cloud, pts = make_cloud(seed=2)
    out = neighbors.radius_outlier_filter(cloud, 12, 0.5, block_size=128)
    ref_p, _ = o.o_radius_filter(pts.astype(np.float64), np.zeros_like(pts), 12, 0.5)
    got_p = np.asarray(out.xyz)[np.asarray(out.valid)]
    assert got_p.shape == ref_p.shape
    a = got_p[np.lexsort(got_p.T)]
    b = ref_p[np.lexsort(ref_p.T)].astype(np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_radius_counts_exclude_invalid_columns():
    cloud, pts = make_cloud(seed=3)
    counts = np.asarray(neighbors.radius_counts(cloud, 100.0, block_size=128))
    # with a huge radius every valid point sees exactly n valid points
    assert np.all(counts[:300] == 300)
    assert np.all(counts[300:] == 0)


def test_grid_statistical_matches_exact_on_road_scene():
    """On a dense back-projected road grid the windowed kNN must reproduce
    the exact O(N^2) statistical filter."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import synthetic_road_scene

    from semantic_depth_tpu import camera as camera_lib
    from semantic_depth_tpu.config import CAMERA_MUNICH
    import jax.numpy as jnp

    disp, road_mask = synthetic_road_scene(CAMERA_MUNICH, h=128, w=256)
    pts = camera_lib.reproject_disparity(jnp.asarray(disp), CAMERA_MUNICH)
    valid = jnp.asarray(road_mask)
    # knock some holes in the mask to stress sparse regions
    rng = np.random.default_rng(0)
    holes = jnp.asarray(rng.uniform(size=road_mask.shape) < 0.3)
    valid = valid & ~holes

    grid_valid = neighbors.statistical_outlier_filter_grid(
        pts, valid, 10, 0.5, window=(5, 21)
    )

    flat = pcl.MaskedCloud(
        xyz=pts.reshape(-1, 3), rgb=jnp.zeros((128 * 256, 3)), valid=valid.reshape(-1)
    )
    compacted = pcl.compact(flat, 8192)
    exact = neighbors.statistical_outlier_filter(compacted, 10, 0.5, block_size=1024)

    n_grid = int(jnp.sum(grid_valid))
    n_exact = int(exact.count())
    # identical keep-counts up to a tiny tolerance (window truncation)
    assert abs(n_grid - n_exact) <= max(5, 0.005 * n_exact), (n_grid, n_exact)


def test_radius_filter_weighted():
    """Per-candidate weights compensate subsampled/denser-grid densities:
    all-ones weights are bit-identical to the unweighted cut; weight w makes
    each in-radius candidate contribute w to the > nb_points comparison."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(256, 3)).astype(np.float32)
    cloud = pcl.MaskedCloud(
        xyz=jnp.asarray(xyz), rgb=jnp.zeros((256, 3)), valid=jnp.ones(256, bool)
    )
    base = neighbors.radius_outlier_filter(cloud, 10, 1.0)
    ones = jnp.ones((256,), jnp.float32)
    same = neighbors.radius_outlier_filter(cloud, 10, 1.0, weights=ones)
    np.testing.assert_array_equal(np.asarray(base.valid), np.asarray(same.valid))

    counts = np.asarray(neighbors.radius_counts(cloud, 1.0, block_size=256))
    scaled = neighbors.radius_outlier_filter(cloud, 10, 1.0, weights=ones * 3.0)
    np.testing.assert_array_equal(np.asarray(scaled.valid), counts * 3.0 > 10)

    # mixed weights: weighted count = sum of weights of in-radius candidates
    w = jnp.asarray(rng.uniform(0.5, 4.0, size=(256,)).astype(np.float32))
    got = neighbors.radius_outlier_filter(cloud, 10, 1.0, weights=w)
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    est = np.where(d2 < 1.0, np.asarray(w)[None, :], 0.0).sum(1)
    np.testing.assert_array_equal(np.asarray(got.valid), est > 10)


def test_select_slab_priority():
    """Slab points all survive selection; the rest is an even subsample
    sized to the remaining capacity."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    n = 1000
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * [3, 1, 10]
    cloud = pcl.MaskedCloud(
        xyz=jnp.asarray(xyz), rgb=jnp.zeros((n, 3)), valid=jnp.ones(n, bool)
    )
    lo, hi = -12.0, -8.0
    sel, stride = pcl.select_slab_priority(cloud, 256, 2, lo, hi)
    in_slab = (xyz[:, 2] > lo) & (xyz[:, 2] < hi)
    sel_np = np.asarray(sel.valid)
    assert sel_np[in_slab].all(), "slab points must all be kept"
    n_out = int((~in_slab).sum())
    room = 256 - int(in_slab.sum())
    expect_stride = -(-n_out // room)
    assert int(stride) == expect_stride
    # out-of-slab kept points: every stride-th by valid order
    out_sel = sel_np[~in_slab]
    assert out_sel.sum() == -(-n_out // expect_stride)
    assert int(sel_np.sum()) <= 256

    # no overflow -> selection is a no-op
    sel2, stride2 = pcl.select_slab_priority(cloud, 2048, 2, lo, hi)
    assert int(stride2) == 1
    assert np.asarray(sel2.valid).all()


def test_radius_counts_pallas_masks_invalid_weights():
    """Invalid candidate rows sit at the ORIGIN in the kernel's coordinate
    planes; a nonzero weight there must not be counted for queries near the
    origin (the kernel masks weights by validity itself — callers are not
    required to pre-zero them)."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_exact_knn import radius_counts_pallas

    rng = np.random.default_rng(8)
    xyz = (rng.normal(size=(256, 3)) * 0.3).astype(np.float32)  # all near 0
    valid = np.ones(256, bool)
    valid[::4] = False
    w = np.full(256, 2.0, np.float32)  # deliberately nonzero on invalid rows
    got = np.asarray(
        radius_counts_pallas(
            jnp.asarray(xyz), jnp.asarray(valid), 1.0, tq=128, cb=128,
            weights=jnp.asarray(w),
        )
    )
    d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    want = np.where(
        valid, np.where((d2 <= 1.0) & valid[None, :], 2.0, 0.0).sum(1), 0.0
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _masked(pts):
    import jax.numpy as jnp

    n = pts.shape[0]
    return pcl.MaskedCloud(
        xyz=jnp.asarray(pts, jnp.float32), rgb=jnp.zeros((n, 3), jnp.float32),
        valid=jnp.ones((n,), bool),
    )


def test_radius_strictness_matches_flann():
    """FLANN's RadiusResultSet admits squared distance STRICTLY below r^2 —
    a pair at exactly the radius must NOT count (all code paths)."""
    import jax.numpy as jnp

    # distances exactly 0.5 apart: d^2 = 0.25, exactly representable in f32
    pts = np.zeros((8, 3), np.float32)
    pts[:, 0] = np.arange(8) * 0.5
    cloud = _masked(pts)
    counts = np.asarray(neighbors.radius_counts(cloud, 0.5, block_size=8))
    # only the point itself is strictly within 0.5 of itself
    np.testing.assert_array_equal(counts, np.ones(8, np.int32))
    ref_p, _ = o.o_radius_filter(pts, pts, 0, 0.5)
    assert ref_p.shape[0] == 8  # count 1 > 0 survives; ties excluded

    from semantic_depth_tpu.ops.pallas_exact_knn import radius_counts_pallas

    pts128 = np.zeros((128, 3), np.float32)
    pts128[:, 0] = np.arange(128) * 0.5
    got = np.asarray(
        radius_counts_pallas(
            jnp.asarray(pts128), jnp.ones(128, bool), 0.5, tq=128, cb=128
        )
    )
    np.testing.assert_array_equal(got, np.ones(128, np.int32))


def test_statistical_duplicate_cluster_removed():
    """A point lying on >= k-1 exact duplicates has avg_distance == 0 and is
    removed by the upstream `avg > 0` condition (oracle + kernel agree)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(64, 3)).astype(np.float32) * 0.2
    dup = np.tile(np.asarray([[5.0, 5.0, 5.0]], np.float32), (6, 1))  # 6 >= k=4
    pts = np.concatenate([base, dup])
    cloud = _masked(pts)
    got = neighbors.statistical_outlier_filter(cloud, 4, 2.0)
    got_valid = np.asarray(got.valid)
    assert not got_valid[64:].any(), "duplicate cluster must be removed"
    ref_p, _ = o.o_statistical_filter(pts, pts, 4, 2.0)
    got_p = np.asarray(cloud.xyz)[got_valid]
    assert got_p.shape == ref_p.shape
    np.testing.assert_allclose(
        got_p[np.lexsort(got_p.T)], ref_p[np.lexsort(ref_p.T)], atol=1e-6
    )


def test_statistical_small_cloud_averages_over_n():
    """Clouds smaller than nb_neighbors: SearchKNN returns min(k, n)
    neighbors and the mean divides by that — points must NOT be assigned
    +inf means (which would remove everything)."""
    rng = np.random.default_rng(12)
    pts = rng.normal(size=(6, 3)).astype(np.float32)  # n=6 < k=10
    cloud = _masked(pts)
    md = np.asarray(neighbors.knn_mean_distances(cloud, 10, block_size=6))
    want = o.o_knn_mean_distances(pts, 10)
    np.testing.assert_allclose(md, want, rtol=1e-5)
    got = neighbors.statistical_outlier_filter(cloud, 10, 2.0)
    ref_p, _ = o.o_statistical_filter(pts, pts, 10, 2.0)
    got_p = np.asarray(cloud.xyz)[np.asarray(got.valid)]
    assert got_p.shape == ref_p.shape

    # and the Pallas exact path (interpret mode off-TPU), padded to 256
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_exact_knn import knn_mean_distances_exact_pallas

    xyz = np.zeros((256, 3), np.float32)
    xyz[:6] = pts
    valid = np.zeros(256, bool)
    valid[:6] = True
    got_md = np.asarray(
        knn_mean_distances_exact_pallas(
            jnp.asarray(xyz), jnp.asarray(valid), 10, tq=128, cb=128
        )
    )
    np.testing.assert_allclose(got_md[:6], want, rtol=1e-5)
    assert np.isinf(got_md[6:]).all()
