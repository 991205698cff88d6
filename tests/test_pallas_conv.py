"""Pallas direct 3x3 conv vs the XLA convolution (exact on CPU interpret;
the TPU path is additionally timed/validated on-chip by tools/profile_blocks
before being enabled in models)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_depth_tpu.ops.pallas_conv import conv3x3_same


def _xla_conv(x, k, bias, relu):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    return jnp.maximum(y, 0) if relu else y


@pytest.mark.parametrize(
    "b,h,w,c,n,relu,tile_h",
    [
        (2, 16, 32, 8, 16, True, 4),
        (1, 8, 16, 16, 8, False, 8),
        (1, 32, 24, 4, 4, True, 8),
    ],
)
def test_conv3x3_matches_xla(b, h, w, c, n, relu, tile_h):
    rng = np.random.default_rng(hash((b, h, w, c, n)) % 2**31)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    got = np.asarray(conv3x3_same(x, k, bias, relu=relu, tile_h=tile_h))
    want = np.asarray(_xla_conv(x, k, bias, relu))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3x3_bf16():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 8)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    got = np.asarray(conv3x3_same(x, k, bias, tile_h=8).astype(jnp.float32))
    want = np.asarray(
        _xla_conv(x, k.astype(jnp.bfloat16), bias, True).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_fcn_pallas_blocks_matches_plain():
    """FCN8s(pallas_blocks=True) must produce the plain path's logits from
    the SAME parameter tree (checkpoint drop-in; blocks 1-2 routed through
    ops/pallas_conv)."""
    from semantic_depth_tpu.models import FCN8s

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)), jnp.float32)
    plain = FCN8s(num_classes=3, width_mult=0.125, fc_channels=64)
    fast = FCN8s(num_classes=3, width_mult=0.125, fc_channels=64, pallas_blocks=True)
    p = plain.init(jax.random.PRNGKey(0), x)
    a = np.asarray(plain.apply(p, x))
    b = np.asarray(fast.apply(p, x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * np.abs(a).max())
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        fast.init(jax.random.PRNGKey(0), x)
    )
