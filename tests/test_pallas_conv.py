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
