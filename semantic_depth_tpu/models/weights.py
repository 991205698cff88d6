"""Weight persistence and TF1-checkpoint conversion.

Native format: a single msgpack file of the flax variable dict
(``save_params``/``load_params``) — used by the CLIs; the trainer uses orbax
for step checkpoints.

Conversion: the reference publishes three weight sets (SURVEY.md §5
checkpoint/resume): the Udacity VGG16 SavedModel + trained FCN decoder
(fcn8s/fcn.py:136-154), and monodepth ckpts (models/get_monodepth_sh:1-21).
``convert_monodepth_checkpoint`` / ``convert_fcn_checkpoint`` map TF1
variables onto our flax modules.

Layout notes (verified by tests/test_weights.py against live TF):
* tf.nn.conv2d kernels are HWIO — identical to flax Conv, no transform;
* tf.layers.conv2d_transpose kernels are (H, W, out_ch, in_ch) and TF
  computes the *gradient-of-conv*; flax ConvTranspose(transpose_kernel=True)
  matches it when fed the TF kernel with the same (H, W, O, I) layout.
* slim auto-names layers Conv, Conv_1, ... per variable scope in graph
  creation order; our module layer names are generated in the same creation
  order, so mapping is positional per scope.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np
from flax import serialization, traverse_util


def save_params(params: Any, path: str) -> str:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(template: Any, path: str) -> Any:
    """Load a msgpack param tree and PLACE IT ON DEVICE.

    flax's from_bytes returns host numpy leaves; feeding those to a jitted
    function re-uploads the full parameter set on EVERY call — on this
    environment's ~30 MB/s device relay the 660 MB FCN+mono set turns a
    42 ms pipeline batch into a ~22 s one (measured: bench collapsed from
    254 to 0.37 fps when trained-weight loading landed). device_put once at
    load time makes params device-resident like init() outputs."""
    import jax

    with open(path, "rb") as f:
        return jax.device_put(serialization.from_bytes(template, f.read()))


# ---------------------------------------------------------------------------
# TF1 checkpoint readers
# ---------------------------------------------------------------------------


def _read_tf_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a TF1 checkpoint into numpy (requires
    tensorflow; the wheel in this image reads TF1-format checkpoints)."""
    import tensorflow as tf  # local import: heavy, optional

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    out = {}
    for name in shapes:
        if name.endswith("/Adam") or name.endswith("/Adam_1") or "Momentum" in name:
            continue  # optimizer slots
        if name in ("beta1_power", "beta2_power", "global_step"):
            continue
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def _slim_layer_ids(names: List[str], scope: str) -> List[int]:
    """Integer indices of slim auto-named layers (Conv, Conv_1, Conv_2, ...)
    of one scope, sorted in creation order."""

    def key(n):
        m = re.match(rf"{re.escape(scope)}/Conv(?:_(\d+))?/", n)
        if not m:
            return None
        return int(m.group(1) or 0)

    return sorted({key(n) for n in names if key(n) is not None})


# ---------------------------------------------------------------------------
# monodepth conversion
# ---------------------------------------------------------------------------

# Our layer creation order replicates the reference graph's per-scope slim
# numbering (see models/monodepth.py __call__).
_MONODEPTH_VGG_ENCODER = [f"enc{i}{s}" for i in range(1, 8) for s in ("a", "b")]


def _monodepth_decoder_order(n_ups: int) -> List[str]:
    names = []
    for level in range(n_ups, 0, -1):
        names.append(f"upconv{level}")
        names.append(f"iconv{level}")
        if level <= 4:
            names.append(f"disp{level}")
    return names


def _monodepth_resnet_encoder_order() -> List[str]:
    """Encoder conv creation order for the resnet50 variant. EVERY resconv
    carries a projection shortcut: the upstream rule
    ``do_proj = tf.shape(x)[3] != num_layers or stride == 2`` compares a TF1
    scalar Tensor to a Python int with ``!=``, which TF1 never overrides —
    it is ALWAYS True, so every published checkpoint has 16 ``_sc`` convs
    (1 + 16*4 = 65 encoder convs total). models/monodepth.py _resconv
    reproduces the same always-project behavior."""
    names = ["enc1"]
    for blk, num_layers, n in [("res2", 64, 3), ("res3", 128, 4), ("res4", 256, 6),
                               ("res5", 512, 3)]:
        for i in range(n):
            base = f"{blk}_{i}"
            names += [f"{base}_c1", f"{base}_c2", f"{base}_c3", f"{base}_sc"]
    return names


def convert_monodepth_checkpoint(
    ckpt_path: str, encoder: str = "vgg", use_deconv: bool = False
) -> Dict:
    """TF1 monodepth checkpoint -> flax params dict for models.Monodepth.

    use_deconv: set for checkpoints trained with the transposed-conv decoder
    (slim auto-names those ``Conv2d_transpose{_i}`` with independent
    numbering from the regular ``Conv{_i}`` sequence)."""
    tf_vars = _read_tf_checkpoint(ckpt_path)
    names = list(tf_vars)

    def scope_layers(scope: str) -> List[int]:
        return _slim_layer_ids(names, scope)

    params: Dict[str, Dict[str, np.ndarray]] = {}

    def take(scope: str, slim_idx: int, our_name: str, op: str = "Conv"):
        suffix = "" if slim_idx == 0 else f"_{slim_idx}"
        w = tf_vars[f"{scope}/{op}{suffix}/weights"]
        entry = {"kernel": w}
        bias_name = f"{scope}/{op}{suffix}/biases"
        if bias_name not in tf_vars:
            # upstream slim convs ALWAYS have biases; a missing one means the
            # naming/mapping is wrong — failing loudly beats silently zeroed
            # biases producing subtly wrong disparities
            raise KeyError(
                f"{bias_name} not in checkpoint (kernel found at "
                f"{scope}/{op}{suffix}/weights) — unexpected variable naming"
            )
        entry["bias"] = tf_vars[bias_name]
        params[our_name] = entry

    if encoder == "vgg":
        enc_names = _MONODEPTH_VGG_ENCODER
        n_ups = 7
    elif encoder == "resnet50":
        enc_names = _monodepth_resnet_encoder_order()
        n_ups = 6
        n_enc = len(scope_layers("model/encoder"))
        if n_enc != len(enc_names):
            raise ValueError(
                f"resnet50 checkpoint has {n_enc} encoder convs; expected "
                f"{len(enc_names)} — not a monodepth resnet50 checkpoint?"
            )
    else:
        raise ValueError(encoder)

    for idx, our in enumerate(enc_names):
        take("model/encoder", idx, our)
    if use_deconv:
        conv_idx = deconv_idx = 0
        for our in _monodepth_decoder_order(n_ups):
            if our.startswith("upconv"):
                take("model/decoder", deconv_idx, our, op="Conv2d_transpose")
                deconv_idx += 1
            else:
                take("model/decoder", conv_idx, our)
                conv_idx += 1
    else:
        for idx, our in enumerate(_monodepth_decoder_order(n_ups)):
            take("model/decoder", idx, our)

    return {"params": params}


# ---------------------------------------------------------------------------
# FCN-8s conversion
# ---------------------------------------------------------------------------

# Udacity VGG16 SavedModel variable names (scope/var) and our module names.
_FCN_VGG_NAME_MAP = {
    f"conv{b}_{c}": f"conv{b}_{c}"
    for b, n in [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]
    for c in range(1, n + 1)
}
_FCN_VGG_NAME_MAP.update({"fc6": "fc6", "fc7": "fc7"})

# The decoder layers were created with tf.layers in this graph order
# (fcn.py:165-213), yielding auto-names conv2d, conv2d_1, conv2d_2 and
# conv2d_transpose, conv2d_transpose_1, conv2d_transpose_2.
_FCN_DECODER_CONV_ORDER = ["score_fc7", "score_pool4", "score_pool3"]
_FCN_DECODER_DECONV_ORDER = ["upscore2", "upscore4", "upscore8"]


def _resolve_vgg_layer(tf_vars: Dict, tf_scope: str):
    """Find a VGG conv's (kernel, bias) across the three export namings:
    '<layer>/filter' (Udacity SavedModel), '<layer>/weights' (slim), or
    '<layer>/kernel' (tf.layers)."""
    for wkey, bkey in (
        (f"{tf_scope}/filter", f"{tf_scope}/biases"),
        (f"{tf_scope}/weights", f"{tf_scope}/biases"),
        (f"{tf_scope}/kernel", f"{tf_scope}/bias"),
    ):
        if wkey in tf_vars:
            return tf_vars[wkey], tf_vars[bkey]
    raise KeyError(f"VGG variable for layer {tf_scope} not found in checkpoint")


def convert_fcn_checkpoint(ckpt_path: str) -> Dict:
    """TF1 FCN-8s checkpoint (saved by fcn.py save_model, containing VGG +
    decoder vars) -> flax params for models.FCN8s.

    TF conv2d_transpose kernels are (H, W, O, I); flax ConvTranspose with
    transpose_kernel=True consumes exactly that layout, so deconv kernels
    pass through untransformed."""
    tf_vars = _read_tf_checkpoint(ckpt_path)
    params: Dict[str, Dict[str, np.ndarray]] = {}

    def put(our_name: str, w: np.ndarray, b: np.ndarray):
        params[our_name] = {"kernel": w, "bias": b}

    for tf_scope, our_name in _FCN_VGG_NAME_MAP.items():
        put(our_name, *_resolve_vgg_layer(tf_vars, tf_scope))

    def auto_name(base: str, i: int) -> str:
        return base if i == 0 else f"{base}_{i}"

    for i, our_name in enumerate(_FCN_DECODER_CONV_ORDER):
        base = auto_name("conv2d", i)
        put(our_name, tf_vars[f"{base}/kernel"], tf_vars[f"{base}/bias"])
    for i, our_name in enumerate(_FCN_DECODER_DECONV_ORDER):
        base = auto_name("conv2d_transpose", i)
        put(our_name, tf_vars[f"{base}/kernel"], tf_vars[f"{base}/bias"])

    return {"params": params}


def convert_vgg_checkpoint(ckpt_path: str) -> Dict:
    """Encoder-only VGG16 checkpoint (the S3-downloaded 'vgg' model of
    helper.py:60-94) -> flax params covering just the encoder layers.

    The reference never trains its decoder from a checkpoint — load_vgg pulls
    the pretrained encoder and the decoder starts trunc-normal (fcn.py:82-95,
    159-215). Use with ``graft_partial`` so missing decoder layers keep the
    template's trunc-normal init."""
    tf_vars = _read_tf_checkpoint(ckpt_path)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for tf_scope, our_name in _FCN_VGG_NAME_MAP.items():
        w, b = _resolve_vgg_layer(tf_vars, tf_scope)
        params[our_name] = {"kernel": w, "bias": b}
    return {"params": params}


def graft_partial(template: Any, converted: Dict):
    """Graft converted weights onto a template where present; layers absent
    from ``converted`` keep the template's (freshly initialized) values.
    Returns (params, loaded_layer_names). Shape mismatches still raise."""
    flat_t = traverse_util.flatten_dict(serialization.to_state_dict(template))
    flat_c = traverse_util.flatten_dict(converted)
    out = {}
    loaded = set()
    for k, v in flat_t.items():
        if k in flat_c:
            cv = np.asarray(flat_c[k])
            if cv.shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: ckpt {cv.shape} vs model {v.shape}")
            out[k] = cv.astype(np.asarray(v).dtype)
            loaded.add(k[-2] if len(k) >= 2 else k[-1])
        else:
            out[k] = v
    restored = traverse_util.unflatten_dict(out)
    import jax

    # device_put for the same reason as load_params: host numpy leaves
    # re-upload on every jitted call (~30 MB/s relay here).
    return jax.device_put(serialization.from_state_dict(template, restored)), sorted(loaded)


def as_jax_params(template: Any, converted: Dict) -> Any:
    """Graft converted numpy weights onto an initialized template params tree
    (validates shapes; raises on mismatch)."""
    flat_t = traverse_util.flatten_dict(serialization.to_state_dict(template))
    flat_c = traverse_util.flatten_dict(converted)
    out = {}
    for k, v in flat_t.items():
        if k in flat_c:
            cv = np.asarray(flat_c[k])
            if cv.shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: ckpt {cv.shape} vs model {v.shape}")
            out[k] = cv.astype(np.asarray(v).dtype)
        else:
            raise KeyError(f"missing converted weight for {k}")
    restored = traverse_util.unflatten_dict(out)
    import jax

    # device_put for the same reason as load_params: host numpy leaves
    # re-upload on every jitted call (~30 MB/s relay here).
    return jax.device_put(serialization.from_state_dict(template, restored))
