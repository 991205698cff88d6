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


@pytest.mark.heavy
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


@pytest.mark.heavy
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


def test_save_load_roundtrip(tmp_path):
    # a hand-built nested tree, NOT the mono_tiny fixture: the fixture's
    # model.init costs ~80 s of compile and the roundtrip only needs a
    # params-shaped pytree (mixed dtypes + nesting cover the format)
    rng = np.random.default_rng(0)
    params = {
        "params": {
            "enc": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
                    "bias": np.zeros((8,), np.float32)},
            "dec": {"kernel": rng.normal(size=(1, 1, 8, 2)).astype("float16")},
        }
    }
    path = W.save_params(params, str(tmp_path / "mono.msgpack"))
    loaded = W.load_params(params, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
def test_monodepth_resnet50_converter_maps_all_layers(tmp_path):
    """The resnet50 order list must exactly cover the module's parameter
    tree — including a projection shortcut in EVERY resconv (upstream's
    do_proj is a TF1 tensor!=int comparison that is always True, so all 16
    published resconvs carry a learned _sc; 65 encoder convs total)."""
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


@pytest.mark.heavy
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


def _tf_bilinear_sampler_1d_h(input_images, x_offset, wrap_mode="border"):
    """Live-TF transcription of the published monodepth bilinear_sampler_1d_h
    (upstream bilinear_sampler.py — vendored but absent in the reference,
    monodepth_lib/README.md:3). Semantics transcribed per-branch:

    * 'border': pad a ONE-PIXEL ZERO frame (tf.pad CONSTANT, edge_size 1),
      shift coords by +edge_size, clip x to [0, (W-1) + 2*edge_size];
    * x1 = min(x0 + 1, padded max) for the gather, but the LEFT weight uses
      the un-clipped x1_f = x0_f + 1 (so weights always sum to 1);
    * flat gather with base = batch*H_p*W_p + y*W_p indexing.

    Built here with TF ops as an executable oracle for ops/sampler.py.
    """
    b, h, w, c = input_images.shape
    edge = 1 if wrap_mode == "border" else 0
    im = input_images
    if wrap_mode == "border":
        im = tf.pad(im, [[0, 0], [1, 1], [1, 1], [0, 0]], mode="CONSTANT")
    hp, wp = h + 2 * edge, w + 2 * edge
    x_t, y_t = tf.meshgrid(
        tf.linspace(0.0, w - 1.0, w), tf.linspace(0.0, h - 1.0, h)
    )
    x_t = tf.tile(x_t[None], [b, 1, 1])
    y_t = tf.tile(y_t[None], [b, 1, 1])
    x = tf.reshape(x_t, [-1]) + tf.reshape(x_offset, [-1]) * float(w) + edge
    y = tf.reshape(y_t, [-1]) + edge
    x = tf.clip_by_value(x, 0.0, float(w - 1 + 2 * edge))
    x0_f = tf.floor(x)
    x1_f = x0_f + 1
    x0 = tf.cast(x0_f, tf.int32)
    x1 = tf.cast(tf.minimum(x1_f, float(w - 1 + 2 * edge)), tf.int32)
    dim2 = wp
    dim1 = wp * hp
    base = tf.repeat(tf.range(b) * dim1, h * w)
    base_y0 = base + tf.cast(y, tf.int32) * dim2
    im_flat = tf.reshape(im, [-1, c])
    pix_l = tf.gather(im_flat, base_y0 + x0)
    pix_r = tf.gather(im_flat, base_y0 + x1)
    weight_l = tf.expand_dims(x1_f - x, 1)
    weight_r = tf.expand_dims(x - x0_f, 1)
    out = weight_l * pix_l + weight_r * pix_r
    return tf.reshape(out, [b, h, w, c])


def test_bilinear_sampler_matches_tf_twin():
    """ops/sampler.py vs the live-TF transcription of the published sampler:
    interior samples, border blends toward the zero pad, and far
    out-of-range offsets (fully zero) must all agree."""
    from semantic_depth_tpu.ops import sampler

    rng = np.random.default_rng(3)
    b, h, w, c = 2, 8, 32, 3
    img = rng.uniform(0, 1, size=(b, h, w, c)).astype(np.float32)
    cases = {
        "interior": rng.uniform(-0.2, 0.2, size=(b, h, w)).astype(np.float32),
        "subpixel": rng.uniform(-2.0 / w, 2.0 / w, size=(b, h, w)).astype(np.float32),
        "far-out-of-range": rng.uniform(-2.0, 2.0, size=(b, h, w)).astype(np.float32),
        "zeros": np.zeros((b, h, w), np.float32),
    }
    for name, off in cases.items():
        want = _tf_bilinear_sampler_1d_h(
            tf.constant(img), tf.constant(off), "border"
        ).numpy()
        got = np.asarray(sampler.bilinear_sample_x(jnp.asarray(img), jnp.asarray(off)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=name)

    # the warp helpers are sign conventions over the same primitive
    disp = rng.uniform(0, 0.3, size=(b, h, w)).astype(np.float32)
    want = _tf_bilinear_sampler_1d_h(tf.constant(img), tf.constant(-disp)).numpy()
    got = np.asarray(sampler.warp_right_to_left(jnp.asarray(img), jnp.asarray(disp)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
