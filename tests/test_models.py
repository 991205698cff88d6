"""Model-layer tests: shapes, determinism, postprocessing oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_depth_tpu.models import FCN8s, Monodepth
from semantic_depth_tpu.models.monodepth import flip_average_postprocess


def test_fcn8s_output_shape_and_dtype():
    model = FCN8s(num_classes=3, width_mult=0.125, fc_channels=64)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 64, 128, 3)
    assert logits.dtype == jnp.float32


def test_fcn8s_train_dropout_is_stochastic():
    model = FCN8s(num_classes=3, width_mult=0.125, fc_channels=64)
    x = jnp.ones((1, 32, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    a = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # eval is deterministic
    c = model.apply(params, x)
    d = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


@pytest.mark.parametrize("encoder", ["vgg", "resnet50"])
def test_monodepth_pyramid_shapes(encoder):
    # vgg needs H,W multiples of 128 (7 stride-2 stages); resnet50 of 64.
    model = Monodepth(encoder=encoder, width_mult=0.0625)
    x = jnp.zeros((2, 128, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    disps = model.apply(params, x)
    assert len(disps) == 4
    for i, d in enumerate(disps):
        assert d.shape == (2, 128 // 2**i, 256 // 2**i, 2), (i, d.shape)
        vals = np.asarray(d)
        assert vals.min() >= 0.0 and vals.max() <= 0.3


def test_monodepth_disp_left_surface():
    model = Monodepth(encoder="vgg", width_mult=0.0625)
    x = jnp.zeros((2, 128, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    dl = model.apply(params, x, method=model.disp_left)
    assert dl.shape == (2, 128, 256)


def test_flip_average_postprocess_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    disp = rng.uniform(0, 0.3, size=(2, 16, 32)).astype(np.float32)
    got = np.asarray(flip_average_postprocess(jnp.asarray(disp)))

    # independent oracle following semantic_depth.py:656-664
    _, h, w = disp.shape
    l_disp = disp[0]
    r_disp = np.fliplr(disp[1])
    m_disp = 0.5 * (l_disp + r_disp)
    l, _ = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    l_mask = 1.0 - np.clip(20 * (l - 0.05), 0, 1)
    r_mask = np.fliplr(l_mask)
    want = r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m_disp
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_monodepth_deconv_variant_shapes():
    """use_deconv=True decoder (pad + stride-2 transposed conv + crop) keeps
    the pyramid geometry identical to the upsample+conv default."""
    model = Monodepth(encoder="vgg", width_mult=0.0625, use_deconv=True)
    x = jnp.zeros((2, 128, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    disps = model.apply(params, x)
    assert len(disps) == 4
    for i, d in enumerate(disps):
        assert d.shape == (2, 128 // 2**i, 256 // 2**i, 2), (i, d.shape)


@pytest.mark.heavy
@pytest.mark.parametrize("encoder", ["vgg", "resnet50"])
def test_monodepth_s2d_matches_plain(encoder):
    """The space-to-depth evaluation (s2d_opt) is an exact kernel
    rearrangement: identical parameter tree and outputs equal to the plain
    path up to f32 summation order, at every pyramid scale."""
    import jax
    import jax.numpy as jnp

    from semantic_depth_tpu.models import Monodepth

    rng = np.random.default_rng(0)
    h, w, b = 128, 256, 2
    x = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32)
    plain = Monodepth(encoder=encoder, compute_dtype=jnp.float32, s2d_opt=False)
    fast = Monodepth(encoder=encoder, compute_dtype=jnp.float32, s2d_opt=True)
    p1 = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    p2 = fast.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    assert jax.tree_util.tree_map(lambda a: a.shape, p1) == jax.tree_util.tree_map(
        lambda a: a.shape, p2
    )
    d_plain = plain.apply(p1, x)
    d_fast = fast.apply(p1, x)  # SAME params through the transformed path
    assert len(d_plain) == len(d_fast) == 4
    for a, b2 in zip(d_plain, d_fast):
        assert a.shape == b2.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=2e-5, atol=2e-6)


def test_fcn8s_input_s2d_restores_input_resolution():
    """The native full-res variant (input_s2d): 2x2 space-to-depth packed
    input, trunk on the half-res grid, learned depth_to_space logits — the
    output must be class logits at the ORIGINAL input resolution."""
    model = FCN8s(num_classes=3, width_mult=0.125, fc_channels=64, input_s2d=True)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 64, 128, 3)
    assert logits.dtype == jnp.float32
    # the packed trunk's first conv consumes the 12 packed channels
    assert params["params"]["conv1_1"]["kernel"].shape[2] == 12
    # upscore8 emits 4 phase groups
    assert params["params"]["upscore8"]["kernel"].shape[-2] == 12  # TF (H,W,O,I): O=4*nc


def test_monodepth_input_s2d_pyramid():
    """input_s2d mono: 5-scale pyramid, finest at the ORIGINAL resolution
    (the extra level 0), each coarser scale halving as usual."""
    h, w = 256, 256  # packed trunk sees 128x128 (vgg needs % 128)
    model = Monodepth(encoder="vgg", width_mult=0.0625, input_s2d=True, s2d_opt=False)
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    disps = model.apply(params, x)
    assert len(disps) == 5
    for i, d in enumerate(disps):
        assert d.shape == (1, h // 2**i, w // 2**i, 2), (i, d.shape)
    dl = model.apply(params, x, method=model.disp_left)
    assert dl.shape == (1, h, w)


@pytest.mark.heavy
def test_input_s2d_variants_train():
    """One gradient step through both input_s2d variants (the native
    weight-set trainer's path, tools/train_bench_weights.py) must produce
    finite grads for EVERY leaf — including the new level-0 / phase-decoder
    params."""
    import optax

    fcn = FCN8s(num_classes=3, width_mult=0.125, fc_channels=64, input_s2d=True)
    x = jnp.ones((1, 64, 128, 3), jnp.float32)
    p = fcn.init(jax.random.PRNGKey(0), x)
    y = jax.nn.one_hot(jnp.zeros((1, 64, 128), jnp.int32), 3)

    def loss_fcn(p):
        logp = jax.nn.log_softmax(fcn.apply(p, x), axis=-1)
        return -jnp.mean(jnp.sum(y * logp, axis=-1))

    g = jax.grad(loss_fcn)(p)
    for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
        assert np.isfinite(np.asarray(leaf)).all(), path

    mono = Monodepth(encoder="vgg", width_mult=0.0625, input_s2d=True)
    xm = jnp.ones((1, 256, 256, 3), jnp.float32) * 0.5
    pm = mono.init(jax.random.PRNGKey(1), xm)

    def loss_mono(p):
        disps = mono.apply(p, xm)
        return sum(jnp.mean(jnp.abs(d)) for d in disps)

    gm = jax.grad(loss_mono)(pm)
    flat = jax.tree_util.tree_flatten_with_path(gm)[0]
    names = {p[-2].key if hasattr(p[-2], "key") else str(p[-2]) for p, _ in flat}
    assert any("upconv0" in str(p) for p, _ in flat)  # level-0 params present
    for path, leaf in flat:
        assert np.isfinite(np.asarray(leaf)).all(), path


@pytest.mark.parametrize("encoder,h,w", [("vgg", 256, 256), ("resnet50", 128, 256)])
def test_monodepth_input_s2d_s2d_matches_plain(encoder, h, w):
    """The s2d_opt fast path of the input_s2d variant is the same exact
    kernel-rearrangement contract as the standard net, for BOTH published
    encoders: identical parameter tree, outputs equal to the plain path at
    every scale (the resnet50 packed trunk only needs H,W % 128)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    plain = Monodepth(
        encoder=encoder, compute_dtype=jnp.float32, input_s2d=True, s2d_opt=False,
        width_mult=0.0625,
    )
    fast = Monodepth(
        encoder=encoder, compute_dtype=jnp.float32, input_s2d=True, s2d_opt=True,
        width_mult=0.0625,
    )
    p1 = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    p2 = fast.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    assert jax.tree_util.tree_map(lambda a: a.shape, p1) == jax.tree_util.tree_map(
        lambda a: a.shape, p2
    )
    d_plain = plain.apply(p1, x)
    d_fast = fast.apply(p1, x)
    assert len(d_plain) == len(d_fast) == 5
    for a, b2 in zip(d_plain, d_fast):
        assert a.shape == b2.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=2e-5, atol=2e-6)
