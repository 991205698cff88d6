"""Masked point-cloud kernels vs NumPy oracles of the reference semantics."""

import numpy as np
import pytest

from semantic_depth_tpu.ops import pcl

import oracles as o


def make_cloud(n=500, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * [3.0, 1.0, 10.0] - [0, 1.0, 12.0]
    cols = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    capacity = capacity or n + 37  # leave some invalid slots
    xyz = np.zeros((capacity, 3), np.float32)
    rgb = np.zeros((capacity, 3), np.float32)
    valid = np.zeros((capacity,), bool)
    # scatter valid points into non-contiguous slots to stress the masking
    idx = rng.permutation(capacity)[:n]
    xyz[idx] = pts
    rgb[idx] = cols
    valid[idx] = True
    # garbage in invalid slots must never matter
    xyz[~valid] = rng.normal(size=(capacity - n, 3)) * 100
    cloud = pcl.MaskedCloud(xyz=xyz, rgb=rgb, valid=valid)
    return cloud, pts, cols, idx


def extract(cloud, order_idx=None):
    """Valid points of a masked cloud as a dense array (slot order)."""
    v = np.asarray(cloud.valid)
    return np.asarray(cloud.xyz)[v], np.asarray(cloud.rgb)[v]


def assert_same_set(a, b):
    """Compare two point sets ignoring row order."""
    assert a.shape == b.shape, (a.shape, b.shape)
    a_sorted = a[np.lexsort(a.T)]
    b_sorted = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a_sorted, b_sorted, rtol=1e-5, atol=1e-5)


def test_masked_median_matches_numpy():
    rng = np.random.default_rng(1)
    for n in [1, 2, 5, 100, 101]:
        vals = rng.normal(size=(n + 13,)).astype(np.float32)
        valid = np.zeros((n + 13,), bool)
        valid[rng.permutation(n + 13)[:n]] = True
        got = float(pcl.masked_median(vals, valid))
        want = float(np.median(vals[valid]))
        assert got == pytest.approx(want, rel=1e-6)


def test_keep_beyond_matches_remove_from_to():
    cloud, pts, cols, _ = make_cloud()
    out = pcl.keep_beyond(cloud, 2, 7.0)
    ref_p, ref_c = o.o_keep_beyond(pts, cols, 2, 7.0)
    got_p, got_c = extract(out)
    assert_same_set(got_p, ref_p)


def test_mad_filter_matches_oracle():
    cloud, pts, cols, _ = make_cloud(seed=2)
    for axis, thr in [(0, 2.0), (1, 15.0), (1, 5.0), (2, 1.0)]:
        out = pcl.mad_filter(cloud, axis, thr)
        ref_p, _ = o.o_mad_filter(pts, cols, axis, thr)
        got_p, _ = extract(out)
        assert_same_set(got_p, ref_p)


def test_mad_filter_zero_mad_removes_all_but_median_matches_numpy():
    # Degenerate cloud: >50% identical values -> MAD == 0 -> penalty inf/nan.
    pts = np.zeros((10, 3), np.float32)
    pts[:, 1] = [1, 1, 1, 1, 1, 1, 2, 3, 4, 5]
    cols = np.zeros_like(pts)
    cloud = pcl.MaskedCloud(xyz=pts, rgb=cols, valid=np.ones(10, bool))
    out = pcl.mad_filter(cloud, 1, 15.0)
    ref_p, _ = o.o_mad_filter(pts, cols, 1, 15.0)
    got_p, _ = extract(out)
    assert_same_set(got_p, ref_p)


def test_threshold_abs_matches_oracle():
    cloud, pts, cols, _ = make_cloud(seed=3)
    out = pcl.threshold_abs(cloud, 2, 15.0)
    ref_p, _ = o.o_threshold_abs(pts, cols, 2, 15.0)
    got_p, _ = extract(out)
    assert_same_set(got_p, ref_p)


def test_fit_plane_matches_lstsq():
    rng = np.random.default_rng(4)
    # points near plane y = 0.05 x - 0.02 z + 1.5 with noise
    n = 400
    x = rng.uniform(-10, 10, n)
    z = rng.uniform(-30, -5, n)
    y = 0.05 * x - 0.02 * z + 1.5 + rng.normal(0, 0.05, n)
    pts = np.stack([x, y, z], axis=1).astype(np.float32)
    cols = np.zeros_like(pts)
    capacity = n + 21
    xyz = np.zeros((capacity, 3), np.float32)
    xyz[:n] = pts
    xyz[n:] = 1e3  # garbage
    valid = np.arange(capacity) < n
    cloud = pcl.MaskedCloud(xyz=xyz, rgb=np.zeros_like(xyz), valid=valid)
    for axis in [0, 1, 2]:
        got = np.asarray(pcl.fit_plane(cloud, axis))
        want = o.o_fit_plane(pts.astype(np.float64), axis)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_plane_inlier_filter_matches_oracle():
    cloud, pts, cols, _ = make_cloud(seed=5, n=600)
    out, coeffs = pcl.plane_inlier_filter(cloud, 1, 5.0)
    ref_p, _, ref_coeffs = o.o_plane_inlier_filter(pts.astype(np.float64), cols, 1, 5.0)
    got_p, _ = extract(out)
    np.testing.assert_allclose(np.asarray(coeffs), ref_coeffs, rtol=1e-3, atol=1e-3)
    assert_same_set(got_p, ref_p.astype(np.float32))


def test_planes_intersection_matches_oracle():
    ca = np.array([0.02, -1.0, 0.01, 1.4])
    cb = np.array([-1.0, 0.3, 0.05, -6.0])
    got = np.asarray(pcl.planes_intersection_at_depth(ca.astype(np.float32), cb.astype(np.float32), 10.0))
    want = o.o_planes_intersection(ca, cb, 10.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_split_by_mean_matches_oracle():
    cloud, pts, cols, _ = make_cloud(seed=6)
    l, r = pcl.split_by_mean(cloud, 0)
    rl, _, rr, _ = o.o_split_by_mean(pts, cols, 0)
    got_l, _ = extract(l)
    got_r, _ = extract(r)
    assert_same_set(got_l, rl)
    assert_same_set(got_r, rr)


def test_road_endpoints_matches_oracle():
    cloud, pts, cols, _ = make_cloud(seed=7, n=2000)
    depth = 9.98
    left, right, found = (np.asarray(a) for a in pcl.road_endpoints(cloud, depth))
    ref_l, ref_r = o.o_road_endpoints(pts, depth)
    assert bool(found) == (ref_l is not None)
    if ref_l is not None:
        np.testing.assert_allclose(left, ref_l, rtol=1e-6)
        np.testing.assert_allclose(right, ref_r, rtol=1e-6)


def test_road_endpoints_empty_slab():
    pts = np.array([[0, 0, -1.0], [1, 0, -2.0]], np.float32)
    cloud = pcl.MaskedCloud(xyz=pts, rgb=np.zeros_like(pts), valid=np.ones(2, bool))
    left, right, found = pcl.road_endpoints(cloud, 10.0)
    assert not bool(found)
    assert np.all(np.isnan(np.asarray(left)))


def test_compact_packs_points():
    cloud, pts, cols, _ = make_cloud(seed=8, n=100, capacity=256)
    out = pcl.compact(cloud, 128)
    got_p, got_c = extract(out)
    assert got_p.shape == (100, 3)
    assert_same_set(got_p, pts)
    # valid mask is a prefix
    v = np.asarray(out.valid)
    assert v[:100].all() and not v[100:].any()


def test_compact_overflow_stride_subsamples():
    """Overflow keeps every ceil(n/cap)-th valid point (an even spatial
    subsample), not the first cap points (which would keep only the top
    image rows). compact_stride reports the stride for count compensation."""
    cloud, pts, cols, _ = make_cloud(seed=9, n=100, capacity=256)
    out = pcl.compact(cloud, 64)
    # n=100, cap=64 -> stride 2 -> 50 kept: valid points 0, 2, 4, ...
    assert int(pcl.compact_stride(cloud, 64)) == 2
    assert int(out.count()) == 50
    got_p, _ = extract(out)
    order = np.asarray(cloud.valid)
    src = np.flatnonzero(order)[::2]
    np.testing.assert_array_equal(got_p, np.asarray(cloud.xyz)[src])


def test_compact_stride_one_is_identity_packing():
    cloud, pts, cols, _ = make_cloud(seed=10, n=60, capacity=256)
    assert int(pcl.compact_stride(cloud, 64)) == 1
    out = pcl.compact(cloud, 64)
    got_p, _ = extract(out)
    src = np.flatnonzero(np.asarray(cloud.valid))
    np.testing.assert_array_equal(got_p, np.asarray(cloud.xyz)[src])


@pytest.mark.heavy
def test_masked_median_radix_select_fuzz():
    """The sort-free radix-select median must equal numpy exactly on
    normal-range floats (XLA flushes subnormal results to zero, so values
    below ~1e-37 are excluded — metric geometry never goes there)."""
    rng = np.random.default_rng(0)
    from semantic_depth_tpu.ops.pcl import masked_median

    import jax.numpy as jnp

    for trial in range(150):
        n_cap = int(rng.integers(1, 200))
        if trial % 3 == 0:
            vals = rng.choice([0.0, -0.0, 1.5, -1.5, 42.0, -1e9, 3.14], size=n_cap)
        else:
            vals = rng.normal(scale=10.0 ** rng.integers(-3, 4), size=n_cap)
        vals = vals.astype(np.float32)
        valid = rng.uniform(size=n_cap) < rng.uniform(0.1, 1.0)
        if not valid.any():
            continue
        want = float(np.median(vals[valid]))
        for impl in (pcl._masked_median_radix, pcl._masked_median_sort):
            got = float(impl(jnp.asarray(vals), jnp.asarray(valid)))
            assert got == want, (impl.__name__, trial, got, want)


@pytest.mark.heavy
def test_masked_median_batched_fuzz():
    """Both batched implementations must equal per-row numpy medians."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for trial in range(60):
        b = int(rng.integers(1, 5))
        n_cap = int(rng.integers(2, 150))
        if trial % 3 == 0:
            vals = rng.choice([0.0, -0.0, 1.5, -1.5, 42.0, -1e9], size=(b, n_cap))
        else:
            vals = rng.normal(scale=10.0 ** rng.integers(-3, 4), size=(b, n_cap))
        vals = vals.astype(np.float32)
        valid = rng.uniform(size=(b, n_cap)) < rng.uniform(0.1, 1.0)
        want = np.array(
            [np.median(vals[i][valid[i]]) if valid[i].any() else np.nan
             for i in range(b)]
        )
        for impl in (pcl._masked_median_radix_batched, pcl._masked_median_sort_batched):
            got = np.asarray(impl(jnp.asarray(vals), jnp.asarray(valid)))
            np.testing.assert_array_equal(got, want.astype(np.float32),
                                          err_msg=f"{impl.__name__} trial {trial}")


def test_mad_filter_pair_equals_two_mad_filters():
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 5
    cols = np.ones_like(pts)
    base = pcl.MaskedCloud(
        xyz=jnp.asarray(pts), rgb=jnp.asarray(cols),
        valid=jnp.asarray(rng.uniform(size=300) < 0.8),
    )
    left = base.with_mask(base.valid & (base.xyz[:, 0] < 0))
    right = base.with_mask(base.valid & (base.xyz[:, 0] > 0))
    la, ra = pcl.mad_filter_pair(left, right, 0, 5.0, 1.0)
    lb = pcl.mad_filter(left, 0, 5.0)
    rb = pcl.mad_filter(right, 0, 1.0)
    np.testing.assert_array_equal(np.asarray(la.valid), np.asarray(lb.valid))
    np.testing.assert_array_equal(np.asarray(ra.valid), np.asarray(rb.valid))


def test_masked_kth_smallest_matches_sort():
    from semantic_depth_tpu.ops.pcl import masked_kth_smallest

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    vals = rng.normal(size=500).astype(np.float32)
    valid = rng.uniform(size=500) < 0.6
    sorted_valid = np.sort(vals[valid])
    for k in [0, 1, len(sorted_valid) // 2, len(sorted_valid) - 1]:
        got = float(masked_kth_smallest(jnp.asarray(vals), jnp.asarray(valid), jnp.int32(k)))
        assert got == float(sorted_valid[k]), k


def test_pallas_mad_kernel_matches_xla_path():
    """The fused Pallas MAD kernel (interpret mode on CPU) equals the XLA
    radix path bit-for-bit, including duplicates, empty masks, and MAD=0."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pallas_mad import mad_keep_mask_pallas
    from semantic_depth_tpu.ops.pcl import _masked_median_radix

    rng = np.random.default_rng(0)
    n = 2048
    cases = []
    x = rng.normal(size=n).astype(np.float32) * 7 - 2
    cases.append((x, rng.random(n) < 0.6))
    xd = np.round(x)  # heavy duplicates
    cases.append((xd, rng.random(n) < 0.6))
    cases.append((np.full(n, 3.25, np.float32), rng.random(n) < 0.5))  # MAD = 0
    cases.append((x, np.zeros(n, bool)))  # empty mask

    for vals, valid in cases:
        vj, mj = jnp.asarray(vals), jnp.asarray(valid)
        got = np.asarray(mad_keep_mask_pallas(vj, mj, 2.0))
        med = _masked_median_radix(vj, mj)
        diffs = jnp.abs(vj - med)
        mad = _masked_median_radix(diffs, mj)
        penalty = 0.6745 * diffs / mad
        ref = np.asarray(mj & (penalty < 2.0))
        np.testing.assert_array_equal(got, ref)


def test_compact_slab_aware_weight_conservation():
    """Density weights must conserve the original valid count (each survivor's
    weight = how many originals it represents) in BOTH regimes: the normal
    out-of-slab overflow, and the slab-alone-over-capacity case where
    pcl.compact applies a residual stride to everything — previously in-slab
    survivors kept weight 1 there and the weighted radius cut over-pruned."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)

    def build(n_slab, n_out):
        z_slab = rng.uniform(-10.05, -9.95, n_slab)
        z_out = np.concatenate([
            rng.uniform(-9.0, -7.0, n_out // 2),
            rng.uniform(-14.0, -11.0, n_out - n_out // 2),
        ])
        z = np.concatenate([z_slab, z_out])
        xyz = np.stack([rng.normal(size=z.size), rng.normal(size=z.size), z], 1)
        return pcl.MaskedCloud(
            xyz=jnp.asarray(xyz, jnp.float32),
            rgb=jnp.zeros((z.size, 3), jnp.float32),
            valid=jnp.ones((z.size,), bool),
        )

    lo, hi = -10.1, -9.9
    # regime 1: slab fits, out-of-slab overflows
    cloud = build(100, 2000)
    packed, w = pcl.compact_slab_aware(cloud, 512, 2, lo, hi)
    assert int(packed.count()) <= 512
    total = float(jnp.sum(w))
    assert abs(total - 2100) / 2100 < 0.05
    z = np.asarray(packed.xyz[:, 2])
    in_slab = np.asarray(packed.valid) & (z > lo) & (z < hi)
    np.testing.assert_allclose(np.asarray(w)[in_slab], 1.0)

    # regime 2: the slab ALONE exceeds capacity -> compact's residual stride
    # subsamples the slab too; weights must reflect it (and stay conserving)
    cloud = build(1500, 500)
    packed, w = pcl.compact_slab_aware(cloud, 512, 2, lo, hi)
    assert int(packed.count()) <= 512
    z = np.asarray(packed.xyz[:, 2])
    in_slab = np.asarray(packed.valid) & (z > lo) & (z < hi)
    assert in_slab.any()
    assert (np.asarray(w)[in_slab] > 1.0).all(), (
        "slab survivors under residual stride must carry the stride weight"
    )
    # conservation within the slab group (out-of-slab collapses to ~1 point
    # by slab-priority design, so only its expectation conserves)
    slab_total = float(jnp.sum(jnp.where(jnp.asarray(in_slab), w, 0.0)))
    assert abs(slab_total - 1500) / 1500 < 0.10

    # px_scale divides everything
    _, w_scaled = pcl.compact_slab_aware(cloud, 512, 2, lo, hi, px_scale=4.0)
    np.testing.assert_allclose(np.asarray(w_scaled), np.asarray(w) / 4.0, rtol=1e-6)


def test_indicator_cumsum_matmul_exact():
    """The TPU matmul-based indicator cumsum must equal np.cumsum exactly for
    0/1 inputs across shapes that hit the block padding and multi-batch
    paths (CPU exercises the matmul variant directly)."""
    import jax.numpy as jnp

    from semantic_depth_tpu.ops.pcl import _indicator_cumsum_matmul

    rng = np.random.default_rng(3)
    for shape in [(7,), (512,), (513,), (4096,), (2, 3, 1000), (4, 131072)]:
        ind = rng.random(shape) < 0.3
        got = np.asarray(_indicator_cumsum_matmul(jnp.asarray(ind)))
        ref = np.cumsum(ind.astype(np.int64), axis=-1)
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, ref)


def test_compact_slab_aware_matches_composition():
    """The fused single-cumsum compact_slab_aware must be row-for-row identical
    to the three-step composition it replaced (select_slab_priority ->
    compact_stride -> compact), across fits/overflow/slab-overflow regimes."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    lo, hi = -10.1, -9.9

    def composition(cloud, capacity, axis):
        sel, stride_out = pcl.select_slab_priority(cloud, capacity, axis, lo, hi)
        resid = pcl.compact_stride(sel, capacity).astype(jnp.float32)
        packed = pcl.compact(sel, capacity)
        x = packed.xyz[:, axis]
        in_slab = packed.valid & (x > lo) & (x < hi)
        w = jnp.where(in_slab, 1.0, stride_out.astype(jnp.float32)) * resid / 2.0
        return packed, jnp.where(packed.valid, w, 0.0)

    for n_slab, n_out, cap in [(0, 100, 512), (100, 300, 512), (100, 2000, 512),
                               (1500, 500, 512), (700, 9000, 1024), (0, 0, 64)]:
        n = max(n_slab + n_out, 1)
        z_slab = rng.uniform(-10.05, -9.95, n_slab)
        z_out = rng.uniform(-14.0, -7.0, n - n_slab)
        z_out = np.where((z_out > lo) & (z_out < hi), -6.0, z_out)
        z = np.concatenate([z_slab, z_out])
        perm = rng.permutation(n)
        xyz = np.stack([rng.normal(size=n), rng.normal(size=n), z[perm]], 1)
        valid = rng.random(n) < 0.9
        cloud = pcl.MaskedCloud(
            xyz=jnp.asarray(xyz, jnp.float32),
            rgb=jnp.asarray(rng.random((n, 3)), jnp.float32),
            valid=jnp.asarray(valid),
        )
        ref_p, ref_w = composition(cloud, cap, 2)
        got_p, got_w = pcl.compact_slab_aware(cloud, cap, 2, lo, hi, px_scale=2.0)
        np.testing.assert_array_equal(np.asarray(got_p.valid), np.asarray(ref_p.valid))
        m = np.asarray(ref_p.valid)
        np.testing.assert_array_equal(np.asarray(got_p.xyz)[m], np.asarray(ref_p.xyz)[m])
        np.testing.assert_array_equal(np.asarray(got_p.rgb)[m], np.asarray(ref_p.rgb)[m])
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), rtol=1e-6)


# ---------------------------------------------------------------------------
# plane_edge_width: the native mode's robust road-width estimator
# ---------------------------------------------------------------------------


def _analytic_road_mask(h, w, f, cx, cy, plane, half_width_of, z_range=(1.0, 60.0)):
    """Rasterize the road mask of an analytic planar road: pixel (row, col)
    is road iff its ray-plane intersection lands within |x| <= half_width(z).
    plane = (a, -1, c, d): y = a*x + c*z + d."""
    a, _, c, d = plane
    u = np.arange(w, dtype=np.float64)[None, :] - cx
    v = cy - np.arange(h, dtype=np.float64)[:, None]
    denom = v - a * u + c * f
    with np.errstate(divide="ignore", invalid="ignore"):
        wz = d * f / denom
        x = u * wz / f
    ok = np.isfinite(wz) & (wz > z_range[0]) & (wz < z_range[1])
    return ok & (np.abs(x) <= half_width_of(wz)), wz, x


def test_plane_edge_width_flat_road_exact():
    """Constant-width flat road: recovered width must be exact to ~1e-4 m
    (the mask quantizes the edge to pixels; the half-pixel widening plus the
    symmetric-slab line fit cancels the quantization to first order)."""
    h, w, f = 256, 512, 500.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    plane = (0.0, -1.0, 0.0, -1.5)
    mask, _, _ = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 3.0)
    lp, rp, found, width = pcl.plane_edge_width(
        np.asarray(mask), np.asarray(plane, np.float32), cx, cy, f, 10.0
    )
    assert bool(found)
    assert float(width) == pytest.approx(6.0, abs=2e-3)
    # endpoints lie ON the plane at z = -10
    np.testing.assert_allclose(np.asarray(lp)[2], -10.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp)[1], -1.5, atol=1e-4)


def test_plane_edge_width_tilted_plane_and_varying_width():
    """Tilted road plane + linearly varying width: the symmetric-slab line
    fit is first-order exact, so the width at the slab center must match the
    analytic width there to a few mm at 256x512."""
    h, w, f = 256, 512, 500.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    plane = (0.02, -1.0, 0.015, -1.4)  # gentle roll + pitch
    half = lambda z: 2.5 + 0.05 * (z - 10.0)  # 5 m wide at z=10, widening
    mask, _, _ = _analytic_road_mask(h, w, f, cx, cy, plane, half)
    lp, rp, found, width = pcl.plane_edge_width(
        np.asarray(mask), np.asarray(plane, np.float32), cx, cy, f, 10.0
    )
    assert bool(found)
    assert float(width) == pytest.approx(5.0, abs=0.01)


def test_plane_edge_width_empty_slab():
    """No road rows in the slab -> found False, nan width/points."""
    h, w, f = 64, 128, 120.0
    mask = np.zeros((h, w), bool)
    plane = np.asarray((0.0, -1.0, 0.0, -1.5), np.float32)
    lp, rp, found, width = pcl.plane_edge_width(
        mask, plane, (w - 1) / 2.0, (h - 1) / 2.0, f, 10.0
    )
    assert not bool(found)
    assert np.isnan(float(width))
    assert np.isnan(np.asarray(lp)).all() and np.isnan(np.asarray(rp)).all()


def test_plane_edge_width_beats_slab_minmax_under_noise():
    """The motivating property: with noisy per-pixel depths, the plane-ray
    estimator's error must be well under the measured-point min/max-x
    estimator's (road_endpoints over the noisy cloud)."""
    import jax.numpy as jnp

    h, w, f = 256, 512, 500.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    plane = (0.0, -1.0, 0.0, -1.5)
    mask, wz, x = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 3.0)

    # noisy measured cloud: true plane geometry + 2% range noise per pixel
    rng = np.random.default_rng(0)
    wz_noisy = np.where(mask, wz * (1.0 + 0.02 * rng.standard_normal((h, w))), np.nan)
    u = np.arange(w, dtype=np.float64)[None, :] - cx
    v = cy - np.arange(h, dtype=np.float64)[:, None]
    xyz = np.stack(
        [u * wz_noisy / f, v * wz_noisy / f, -wz_noisy], axis=-1
    ).reshape(-1, 3)
    ok = np.isfinite(xyz).all(axis=1)
    xyz[~ok] = 0.0
    cloud = pcl.MaskedCloud(
        xyz=jnp.asarray(xyz, jnp.float32),
        rgb=jnp.zeros_like(jnp.asarray(xyz, jnp.float32)),
        valid=jnp.asarray(ok & mask.reshape(-1)),
    )
    lp_mm, rp_mm, _ = pcl.road_endpoints(cloud, 10.0, 0.05)
    err_minmax = abs(float(jnp.abs(lp_mm[0] - rp_mm[0])) - 6.0)

    _, _, found, width = pcl.plane_edge_width(
        np.asarray(mask), np.asarray(plane, np.float32), cx, cy, f, 10.0
    )
    err_edge = abs(float(width) - 6.0)
    assert bool(found)
    assert err_edge < 0.01
    assert err_edge < err_minmax / 5.0


def test_plane_edge_width_rejects_boundary_false_positives():
    """The r5 regression: a segmentation halo of on-plane-looking false
    positives extending the mask ~0.3 m past each edge in EVERY slab row
    (what a real FCN does at the road boundary — measured 5.7 m rw MAE on
    the native bench weights). The halo pixels' MEASURED range is
    boundary-interpolated (off the plane-ray range), so the
    measured-vs-plane consistency gate must drop them; ungated, the
    estimator must reproduce the blow-up (the test pins both behaviors)."""
    h, w, f = 256, 512, 500.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    plane = (0.0, -1.0, 0.0, -1.5)
    mask, wz, x = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 3.0)
    halo, _, _ = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 3.3)

    # measured range: exact on the true road; the halo ring carries
    # interpolated (fence/background-mixed) depth ~1 m off the plane ray
    meas = np.where(mask, wz, np.where(halo, wz * 1.10, np.nan))
    poisoned = halo  # mask with the halo attached (contiguous, every row)

    _, _, found_bad, width_bad = pcl.plane_edge_width(
        np.asarray(poisoned), np.asarray(plane, np.float32), cx, cy, f, 10.0
    )
    assert bool(found_bad)
    assert float(width_bad) > 6.4  # ungated: the halo fakes the edges

    _, _, found, width = pcl.plane_edge_width(
        np.asarray(poisoned), np.asarray(plane, np.float32), cx, cy, f, 10.0,
        meas_range=np.asarray(meas, np.float32), range_tol=0.25,
    )
    assert bool(found)
    assert float(width) == pytest.approx(6.0, abs=0.01)


def test_plane_edge_width_mad_rejects_poisoned_rows():
    """The line fit's MAD pass: a MINORITY of slab rows carry an on-plane
    false-positive strip that survives every geometric gate (correct
    measured range, on the plane). The robust refit must reject those rows
    and recover the clean width."""
    h, w, f = 256, 512, 500.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    plane = (0.0, -1.0, 0.0, -1.5)
    mask, wz, x = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 3.0)
    wide, _, _ = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 5.0)

    # slab rows for the flat plane: row = cy + 1.5*f/z
    r_lo = int(cy + 1.5 * f / 10.5)
    r_hi = int(cy + 1.5 * f / 9.5)
    poisoned = mask.copy()
    bad_rows = list(range(r_lo, r_hi + 1))[::4][:2]  # ~25% of slab rows
    for r in bad_rows:
        poisoned[r] = wide[r]

    _, _, found, width = pcl.plane_edge_width(
        np.asarray(poisoned), np.asarray(plane, np.float32), cx, cy, f, 10.0
    )
    assert bool(found)
    assert float(width) == pytest.approx(6.0, abs=0.02)


def test_plane_edge_width_cloud_beats_slab_minmax_under_noise():
    """The shipped plane_edge implementation (pipeline._road_width): same
    denoised slab points as road_endpoints, but each measured x replaced by
    its ray-plane intersection — the per-point range noise must drop out."""
    import jax.numpy as jnp

    h, w, f = 256, 512, 500.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    plane = (0.0, -1.0, 0.0, -1.5)
    mask, wz, x = _analytic_road_mask(h, w, f, cx, cy, plane, lambda z: 3.0)

    u = np.arange(w, dtype=np.float64)[None, :] - cx
    v = cy - np.arange(h, dtype=np.float64)[:, None]
    errs_cloud, errs_slab = [], []
    lp = None
    for seed in range(6):
        rng = np.random.default_rng(seed)
        wz_noisy = np.where(
            mask, wz * (1.0 + 0.02 * rng.standard_normal((h, w))), np.nan
        )
        xyz = np.stack(
            [u * wz_noisy / f, v * wz_noisy / f, -wz_noisy], axis=-1
        ).reshape(-1, 3)
        ok = np.isfinite(xyz).all(axis=1)
        xyz[~ok] = 0.0
        cloud = pcl.MaskedCloud(
            xyz=jnp.asarray(xyz, jnp.float32),
            rgb=jnp.zeros_like(jnp.asarray(xyz, jnp.float32)),
            valid=jnp.asarray(ok & mask.reshape(-1)),
        )
        lp_mm, rp_mm, _ = pcl.road_endpoints(cloud, 10.0, 0.05)
        errs_slab.append(abs(float(jnp.abs(lp_mm[0] - rp_mm[0])) - 6.0))
        lp, rp, found, width = pcl.plane_edge_width_cloud(
            cloud, jnp.asarray(plane, jnp.float32), f, 10.0, 0.05
        )
        assert bool(found)
        errs_cloud.append(abs(float(width) - 6.0))
    # 2% range noise at 10 m = +-20 cm per point at the slab extremes; the
    # projected estimator's residual is mask quantization (~1 footprint).
    # Slab's error is a noise extreme (a single seed can get lucky), so the
    # superiority claim is over the seed mean.
    assert np.mean(errs_cloud) < 0.03
    assert np.mean(errs_cloud) < np.mean(errs_slab) / 3.0
    # endpoints lie ON the plane (y = -1.5) near z = -10
    np.testing.assert_allclose(float(lp[1]), -1.5, atol=1e-4)
    assert abs(float(lp[2]) + 10.0) < 0.2


def test_plane_edge_width_cloud_empty_slab():
    import jax.numpy as jnp

    xyz = jnp.zeros((64, 3), jnp.float32)
    cloud = pcl.MaskedCloud(xyz=xyz, rgb=jnp.zeros_like(xyz),
                            valid=jnp.zeros((64,), bool))
    lp, rp, found, width = pcl.plane_edge_width_cloud(
        cloud, jnp.asarray((0.0, -1.0, 0.0, -1.5), jnp.float32), 500.0, 10.0
    )
    assert not bool(found)
    assert np.isnan(float(width))
    assert np.isnan(np.asarray(lp)).all() and np.isnan(np.asarray(rp)).all()
