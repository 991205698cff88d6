"""ops/s2d.py transforms vs direct fine-grid convolutions (exactness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_depth_tpu.ops import s2d


def _fine_conv(x, k_hw, bias, stride=1):
    p = (k_hw.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, k_hw, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + bias


def test_space_to_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    s = s2d.space_to_depth(x)
    assert s.shape == (2, 4, 6, 20)
    # phase-major layout: channel (di*2+dj)*C + c == fine[2i+di, 2j+dj, c]
    np.testing.assert_array_equal(np.asarray(s[0, 1, 2, 5:10]),
                                  np.asarray(x[0, 2, 5, :]))  # phase (0,1)
    np.testing.assert_array_equal(np.asarray(s2d.depth_to_space(s)), np.asarray(x))


def test_conv_pack_forms_match_reshape():
    """The TPU one-hot-conv forms of space_to_depth/depth_to_space (sub-lane
    transposes lower ~30x off memory bound on v5e — s2d.py docstrings) must
    equal the reshape forms EXACTLY, including non-square grids and C=1."""
    rng = np.random.default_rng(3)
    for shape in [(2, 8, 12, 3), (1, 16, 16, 7), (3, 4, 6, 1), (1, 6, 4, 16)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        packed = s2d.space_to_depth(x)
        np.testing.assert_array_equal(
            np.asarray(s2d._space_to_depth_conv(x)), np.asarray(packed)
        )
        np.testing.assert_array_equal(
            np.asarray(s2d._depth_to_space_conv(packed)), np.asarray(x)
        )


@pytest.mark.parametrize("k", [3, 5, 7])
def test_s2d_conv_phase_out_matches_fine(k):
    rng = np.random.default_rng(k)
    c_in, n, h, w = 5, 6, 12, 16
    x = jnp.asarray(rng.normal(size=(2, h, w, c_in)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(k, k, c_in, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    ref = _fine_conv(x, kern, bias)  # (2, h, w, n), stride 1
    got = s2d.depth_to_space(
        s2d.s2d_conv([(s2d.space_to_depth(x), c_in)], kern, bias, k)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 7])
def test_s2d_conv_stride2_matches_fine(k):
    rng = np.random.default_rng(10 + k)
    c_in, n, h, w = 4, 3, 12, 16
    x = jnp.asarray(rng.normal(size=(2, h, w, c_in)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(k, k, c_in, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    ref = _fine_conv(x, kern, bias, stride=2)  # (2, h/2, w/2, n)
    got = s2d.s2d_conv(
        [(s2d.space_to_depth(x), c_in)], kern, bias, k, phase_out=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_s2d_conv_segments_match_concat():
    """Multiple s2d input segments == fine conv over channel-concatenated
    inputs (the decoder's upconv+skip+udisp concat)."""
    rng = np.random.default_rng(2)
    h, w = 8, 12
    xa = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(1, h, w, 2)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    ref = _fine_conv(jnp.concatenate([xa, xb], axis=-1), kern, bias)
    got = s2d.depth_to_space(
        s2d.s2d_conv(
            [(s2d.space_to_depth(xa), 3), (s2d.space_to_depth(xb), 2)],
            kern, bias, 3,
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upconv_s2d_matches_nn_upsample_conv():
    rng = np.random.default_rng(3)
    c_in, n, hc, wc = 4, 3, 6, 8
    x = jnp.asarray(rng.normal(size=(2, hc, wc, c_in)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3, 3, c_in, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = _fine_conv(up, kern, bias)  # (2, 2hc, 2wc, n)
    got = s2d.depth_to_space(s2d.upconv_s2d(x, kern, bias, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_replicate_phases_is_s2d_of_upsample():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 2)), jnp.float32)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(
        np.asarray(s2d.replicate_phases(x)), np.asarray(s2d.space_to_depth(up))
    )


@pytest.mark.parametrize("k", [3, 5, 7])
def test_s2d_conv_stride2_phase_out_matches_fine(k):
    """stride=2 + phase_out: fine stride-2 conv whose output is itself
    s2d-packed (coarse/2 grid, 4N channels)."""
    rng = np.random.default_rng(20 + k)
    c_in, n, h, w = 5, 6, 16, 24
    x = jnp.asarray(rng.normal(size=(2, h, w, c_in)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(k, k, c_in, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    ref = _fine_conv(x, kern, bias, stride=2)  # (2, h/2, w/2, n)
    got = s2d.depth_to_space(
        s2d.s2d_conv([(s2d.space_to_depth(x), c_in)], kern, bias, k, stride=2)
    )  # (2, h/2, w/2, n) via (h/4, w/4, 4n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
