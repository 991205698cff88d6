"""Pallas windowed-kNN kernel vs the jnp stencil reference (interpreter mode
on CPU; the same code compiles on TPU)."""

import numpy as np

import jax.numpy as jnp

from semantic_depth_tpu.ops.neighbors import knn_mean_distances_grid
from semantic_depth_tpu.ops.pallas_knn import knn_mean_distances_grid_pallas


def test_pallas_knn_matches_jnp_reference():
    rng = np.random.default_rng(0)
    h, w = 64, 128
    pts = rng.normal(size=(h, w, 3)).astype(np.float32) * [2, 0.3, 5]
    valid = rng.uniform(size=(h, w)) < 0.7

    ref = np.asarray(knn_mean_distances_grid(jnp.asarray(pts), jnp.asarray(valid), 10, (5, 21)))
    got = np.asarray(
        knn_mean_distances_grid_pallas(jnp.asarray(pts), jnp.asarray(valid), 10, (5, 21),
                                       tile_h=16)
    )
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-5, atol=1e-6)


def test_pallas_knn_sparse_windows_inf():
    # fewer than k valid candidates in a window -> +inf
    h, w = 32, 128
    pts = np.zeros((h, w, 3), np.float32)
    valid = np.zeros((h, w), bool)
    valid[5, 5] = True  # lone point: only 1 candidate < k
    got = np.asarray(
        knn_mean_distances_grid_pallas(jnp.asarray(pts), jnp.asarray(valid), 10, (5, 21),
                                       tile_h=16)
    )
    assert np.isinf(got[5, 5])
    assert np.isinf(got[0, 0])


def test_pallas_knn_hbm_variant_matches_reference():
    """Force the HBM-streaming variant (large-image path) and check parity."""
    from semantic_depth_tpu.ops import pallas_knn

    rng = np.random.default_rng(2)
    h, w = 64, 128
    pts = rng.normal(size=(h, w, 3)).astype(np.float32)
    valid = rng.uniform(size=(h, w)) < 0.7
    ref = np.asarray(knn_mean_distances_grid(jnp.asarray(pts), jnp.asarray(valid), 10, (5, 21)))

    orig = pallas_knn._VMEM_RESIDENT_BUDGET
    pallas_knn._VMEM_RESIDENT_BUDGET = 0  # force the DMA path
    pallas_knn.knn_mean_distances_grid_pallas.clear_cache()
    try:
        got = np.asarray(
            pallas_knn.knn_mean_distances_grid_pallas(
                jnp.asarray(pts), jnp.asarray(valid), 10, (5, 21), tile_h=16
            )
        )
    finally:
        pallas_knn._VMEM_RESIDENT_BUDGET = orig
        pallas_knn.knn_mean_distances_grid_pallas.clear_cache()
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-5, atol=1e-6)


def test_pallas_knn_batched_matches_single():
    """Batched wrapper (resident path -> vmap; HBM path -> batch-grid kernel)
    matches per-frame results."""
    from semantic_depth_tpu.ops import pallas_knn

    rng = np.random.default_rng(3)
    b, h, w = 2, 32, 128
    pts = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    valid = rng.uniform(size=(b, h, w)) < 0.7
    refs = np.stack(
        [
            np.asarray(
                knn_mean_distances_grid(jnp.asarray(pts[i]), jnp.asarray(valid[i]), 5, (3, 9))
            )
            for i in range(b)
        ]
    )

    # resident path
    got = np.asarray(
        pallas_knn.knn_mean_distances_grid_pallas_batched(
            jnp.asarray(pts), jnp.asarray(valid), 5, (3, 9), tile_h=16
        )
    )
    finite = np.isfinite(refs)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], refs[finite], rtol=1e-5, atol=1e-6)

    # forced HBM batch-grid path
    orig = pallas_knn._VMEM_RESIDENT_BUDGET
    pallas_knn._VMEM_RESIDENT_BUDGET = 0
    pallas_knn.knn_mean_distances_grid_pallas_batched.clear_cache()
    try:
        got_hbm = np.asarray(
            pallas_knn.knn_mean_distances_grid_pallas_batched(
                jnp.asarray(pts), jnp.asarray(valid), 5, (3, 9), tile_h=16
            )
        )
    finally:
        pallas_knn._VMEM_RESIDENT_BUDGET = orig
        pallas_knn.knn_mean_distances_grid_pallas_batched.clear_cache()
    np.testing.assert_array_equal(np.isfinite(got_hbm), finite)
    np.testing.assert_allclose(got_hbm[finite], refs[finite], rtol=1e-5, atol=1e-6)
