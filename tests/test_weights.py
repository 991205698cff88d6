"""Weight-converter parity tests against live TensorFlow ops and synthetic
TF1-style checkpoints. Skipped when tensorflow is unavailable."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from flax import linen as nn

from semantic_depth_tpu.models import FCN8s, Monodepth
from semantic_depth_tpu.models import weights as W


def test_conv_transpose_matches_tf_gradient_of_conv():
    """flax ConvTranspose(transpose_kernel=True) must equal
    tf.nn.conv2d_transpose given the same (H, W, O, I) kernel."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 8, 3)).astype(np.float32)
    for k, s in [(4, 2), (16, 8)]:
        kern = rng.normal(size=(k, k, 5, 3)).astype(np.float32)  # (H, W, O, I)
        out_shape = (1, 6 * s, 8 * s, 5)
        tf_out = tf.nn.conv2d_transpose(
            x, kern, output_shape=out_shape, strides=[1, s, s, 1], padding="SAME"
        ).numpy()

        conv = nn.ConvTranspose(
            5, (k, k), strides=(s, s), padding="SAME", transpose_kernel=True
        )
        params = {"params": {"kernel": jnp.asarray(kern), "bias": jnp.zeros((5,))}}
        jx_out = np.asarray(conv.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(jx_out, tf_out, rtol=1e-4, atol=1e-4)


def test_conv_same_matches_tf():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 7, 9, 4)).astype(np.float32)
    kern = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)  # HWIO
    tf_out = tf.nn.conv2d(x, kern, strides=1, padding="SAME").numpy()
    conv = nn.Conv(6, (3, 3), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(kern), "bias": jnp.zeros((6,))}}
    jx_out = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(jx_out, tf_out, rtol=1e-4, atol=1e-4)


def _write_tf1_checkpoint(tmpdir, var_specs):
    """Create a TF1-format checkpoint holding the given {name: array}."""
    ckpt_prefix = os.path.join(str(tmpdir), "model")
    tf1 = tf.compat.v1
    with tf1.Graph().as_default():
        for name, arr in var_specs.items():
            tf1.get_variable(name, initializer=tf.constant(arr))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)
    return ckpt_prefix


@pytest.fixture(scope="module")
def mono_tiny():
    """Width-scaled monodepth whose layer list mirrors the full network."""
    model = Monodepth(encoder="vgg", width_mult=0.0625)
    x = jnp.zeros((2, 128, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_monodepth_converter_maps_all_layers(tmp_path, mono_tiny):
    model, params, x = mono_tiny
    rng = np.random.default_rng(2)

    # Build a synthetic TF checkpoint with slim naming whose k-th conv has the
    # same shapes as our k-th layer (read shapes from our params).
    enc_order = W._MONODEPTH_VGG_ENCODER
    dec_order = W._monodepth_decoder_order(7)
    p = params["params"]
    var_specs = {}
    for scope, order in (("model/encoder", enc_order), ("model/decoder", dec_order)):
        for i, our in enumerate(order):
            suffix = "" if i == 0 else f"_{i}"
            kshape = np.asarray(p[our]["kernel"]).shape
            var_specs[f"{scope}/Conv{suffix}/weights"] = rng.normal(size=kshape).astype(
                np.float32
            )
            bshape = np.asarray(p[our]["bias"]).shape
            var_specs[f"{scope}/Conv{suffix}/biases"] = rng.normal(size=bshape).astype(
                np.float32
            )

    ckpt = _write_tf1_checkpoint(tmp_path, var_specs)
    converted = W.convert_monodepth_checkpoint(ckpt, encoder="vgg")
    grafted = W.as_jax_params(params, converted)

    # every layer must carry the checkpoint values, mapped positionally
    for i, our in enumerate(enc_order):
        suffix = "" if i == 0 else f"_{i}"
        np.testing.assert_array_equal(
            np.asarray(grafted["params"][our]["kernel"]),
            var_specs[f"model/encoder/Conv{suffix}/weights"],
        )
    # and the model must run with the grafted weights
    disps = model.apply(grafted, x)
    assert disps[0].shape == (2, 128, 256, 2)


def test_fcn_converter_maps_all_layers(tmp_path):
    model = FCN8s(num_classes=3, width_mult=0.0625, fc_channels=16)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    rng = np.random.default_rng(3)

    var_specs = {}
    for tf_scope, our in W._FCN_VGG_NAME_MAP.items():
        var_specs[f"{tf_scope}/filter"] = rng.normal(
            size=np.asarray(p[our]["kernel"]).shape
        ).astype(np.float32)
        var_specs[f"{tf_scope}/biases"] = rng.normal(
            size=np.asarray(p[our]["bias"]).shape
        ).astype(np.float32)
    for i, our in enumerate(W._FCN_DECODER_CONV_ORDER):
        base = "conv2d" if i == 0 else f"conv2d_{i}"
        var_specs[f"{base}/kernel"] = rng.normal(
            size=np.asarray(p[our]["kernel"]).shape
        ).astype(np.float32)
        var_specs[f"{base}/bias"] = rng.normal(size=np.asarray(p[our]["bias"]).shape).astype(
            np.float32
        )
    for i, our in enumerate(W._FCN_DECODER_DECONV_ORDER):
        base = "conv2d_transpose" if i == 0 else f"conv2d_transpose_{i}"
        var_specs[f"{base}/kernel"] = rng.normal(
            size=np.asarray(p[our]["kernel"]).shape
        ).astype(np.float32)
        var_specs[f"{base}/bias"] = rng.normal(size=np.asarray(p[our]["bias"]).shape).astype(
            np.float32
        )

    ckpt = _write_tf1_checkpoint(tmp_path, var_specs)
    converted = W.convert_fcn_checkpoint(ckpt)
    grafted = W.as_jax_params(params, converted)
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["upscore8"]["kernel"]),
        var_specs["conv2d_transpose_2/kernel"],
    )
    logits = model.apply(grafted, x)
    assert logits.shape == (1, 64, 128, 3)


def test_save_load_roundtrip(tmp_path, mono_tiny):
    model, params, x = mono_tiny
    path = W.save_params(params, str(tmp_path / "mono.msgpack"))
    loaded = W.load_params(params, path)
    a = model.apply(params, x)[0]
    b = model.apply(loaded, x)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_monodepth_resnet50_converter_maps_all_layers(tmp_path):
    """The resnet50 order list (with optional projection shortcuts) must
    exactly cover the module's parameter tree."""
    model = Monodepth(encoder="resnet50", width_mult=0.0625)
    x = jnp.zeros((2, 128, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    p = params["params"]

    enc_order = W._monodepth_resnet_encoder_order()
    dec_order = W._monodepth_decoder_order(6)
    assert sorted(enc_order + dec_order) == sorted(p.keys())

    rng = np.random.default_rng(5)
    var_specs = {}
    for scope, order in (("model/encoder", enc_order), ("model/decoder", dec_order)):
        for i, our in enumerate(order):
            suffix = "" if i == 0 else f"_{i}"
            var_specs[f"{scope}/Conv{suffix}/weights"] = rng.normal(
                size=np.asarray(p[our]["kernel"]).shape
            ).astype(np.float32)
            var_specs[f"{scope}/Conv{suffix}/biases"] = rng.normal(
                size=np.asarray(p[our]["bias"]).shape
            ).astype(np.float32)
    ckpt = _write_tf1_checkpoint(tmp_path, var_specs)
    converted = W.convert_monodepth_checkpoint(ckpt, encoder="resnet50")
    grafted = W.as_jax_params(params, converted)
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["res2_0_sc"]["kernel"]),
        var_specs[f"model/encoder/Conv_{enc_order.index('res2_0_sc')}/weights"],
    )
    disps = model.apply(grafted, x)
    assert disps[0].shape == (2, 128, 256, 2)


def test_monodepth_deconv_converter(tmp_path):
    model = Monodepth(encoder="vgg", width_mult=0.0625, use_deconv=True)
    x = jnp.zeros((2, 128, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    rng = np.random.default_rng(6)

    dec_order = W._monodepth_decoder_order(7)
    var_specs = {}
    for i, our in enumerate(W._MONODEPTH_VGG_ENCODER):
        suffix = "" if i == 0 else f"_{i}"
        var_specs[f"model/encoder/Conv{suffix}/weights"] = rng.normal(
            size=np.asarray(p[our]["kernel"]).shape).astype(np.float32)
        var_specs[f"model/encoder/Conv{suffix}/biases"] = rng.normal(
            size=np.asarray(p[our]["bias"]).shape).astype(np.float32)
    ci = di = 0
    for our in dec_order:
        if our.startswith("upconv"):
            base = "Conv2d_transpose" if di == 0 else f"Conv2d_transpose_{di}"
            di += 1
        else:
            base = "Conv" if ci == 0 else f"Conv_{ci}"
            ci += 1
        var_specs[f"model/decoder/{base}/weights"] = rng.normal(
            size=np.asarray(p[our]["kernel"]).shape).astype(np.float32)
        var_specs[f"model/decoder/{base}/biases"] = rng.normal(
            size=np.asarray(p[our]["bias"]).shape).astype(np.float32)

    ckpt = _write_tf1_checkpoint(tmp_path, var_specs)
    converted = W.convert_monodepth_checkpoint(ckpt, encoder="vgg", use_deconv=True)
    grafted = W.as_jax_params(params, converted)
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["upconv7"]["kernel"]),
        var_specs["model/decoder/Conv2d_transpose/weights"],
    )
    disps = model.apply(grafted, x)
    assert disps[0].shape == (2, 128, 256, 2)
