"""Live-TF twin of the published monodepth architecture (Godard CVPR'17).

The reference vendors monodepth but ships no code (reference
monodepth_lib/README.md:1-9); the consumed surface is
``MonodepthModel(params, "test", left, None).disp_left_est[0]``
(reference semantic_depth.py:609-675). This twin builds that graph with raw
tf.nn ops (tf.compat.v1.layers / slim are unimportable in this TF build) in
slim's variable creation order, so it can:

* generate random weights named exactly like the published checkpoints
  (``model/{encoder,decoder}/Conv{_i}/{weights,biases}``) for the converter
  round-trip goldens (tests/test_reference_oracle.py Part D), and
* EXECUTE a downloaded published checkpoint's variables directly
  (``variables=`` arg) so tools/verify_published_weights.py can pin the flax
  forward against live TF on the real weights the day egress exists.

Pure-TF module: no jax imports.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class TFMonodepth:
    """The published monodepth graph in raw tf.nn ops.

    variables: optional dict of slim-named arrays (from a real checkpoint);
    when absent, weights are generated from ``seed`` in creation order and
    recorded in ``self.V`` under the same slim names.
    """

    def __init__(self, width_mult: float = 1.0, seed: int = 0,
                 variables: Optional[Dict[str, np.ndarray]] = None):
        self.wm = width_mult
        self.rng = np.random.default_rng(seed)
        self.preset = variables
        self.V: Dict[str, np.ndarray] = dict(variables or {})
        self.counts = {"model/encoder": 0, "model/decoder": 0}

    def _ch(self, ch):
        return max(1, int(ch * self.wm))

    def _vars(self, scope, k, cin, cout):
        i = self.counts[scope]
        self.counts[scope] += 1
        base = f"{scope}/Conv" + ("" if i == 0 else f"_{i}")
        if self.preset is not None:
            w = self.V[f"{base}/weights"]
            b = self.V[f"{base}/biases"]
            if tuple(w.shape) != (k, k, cin, cout):
                raise ValueError(
                    f"{base}/weights has shape {w.shape}, twin expects "
                    f"{(k, k, cin, cout)} — architecture mismatch"
                )
            return w, b
        fan_in = k * k * cin
        w = (self.rng.normal(size=(k, k, cin, cout)) / np.sqrt(fan_in)).astype(
            np.float32
        )
        b = (0.1 * self.rng.normal(size=(cout,))).astype(np.float32)
        self.V[f"{base}/weights"] = w
        self.V[f"{base}/biases"] = b
        return w, b

    # published conv: symmetric pad floor((k-1)/2) then VALID conv, ELU
    def conv(self, t, ch, k, stride, scope, act="elu", scale=True):
        import tensorflow as tf

        if scale:
            ch = self._ch(ch)
        w, b = self._vars(scope, k, int(t.shape[3]), ch)
        p = (k - 1) // 2
        t = tf.pad(t, [[0, 0], [p, p], [p, p], [0, 0]])
        t = tf.nn.conv2d(t, w, strides=[1, stride, stride, 1], padding="VALID")
        t = tf.nn.bias_add(t, b)
        if act == "elu":
            return tf.nn.elu(t)
        if act == "sigmoid":
            return tf.nn.sigmoid(t)
        return t

    def upsample_nn(self, t, ratio=2):
        import tensorflow as tf

        shp = t.shape
        return tf.image.resize(
            t, [int(shp[1]) * ratio, int(shp[2]) * ratio], method="nearest"
        )

    def maxpool(self, t, k=3):
        import tensorflow as tf

        p = (k - 1) // 2
        t = tf.pad(t, [[0, 0], [p, p], [p, p], [0, 0]])
        return tf.nn.max_pool2d(t, ksize=k, strides=2, padding="VALID")

    def resconv(self, t, num_layers, stride):
        import tensorflow as tf

        out = self.conv(t, num_layers, 1, 1, "model/encoder")
        out = self.conv(out, num_layers, 3, stride, "model/encoder")
        out = self.conv(out, 4 * num_layers, 1, 1, "model/encoder", act=None)
        # the upstream do_proj condition is ALWAYS True in TF1 (Tensor != int)
        # so every published resconv carries a learned projection shortcut
        shortcut = self.conv(t, 4 * num_layers, 1, stride, "model/encoder", act=None)
        return tf.nn.elu(out + shortcut)

    def resblock(self, t, num_layers, num_blocks):
        for _ in range(num_blocks - 1):
            t = self.resconv(t, num_layers, 1)
        return self.resconv(t, num_layers, 2)

    def get_disp(self, t):
        return 0.3 * self.conv(t, 2, 3, 1, "model/decoder", act="sigmoid",
                               scale=False)

    def forward(self, x, encoder):
        """x: (B, H, W, 3) float32 in [0, 1]. Returns the 4-scale disparity
        pyramid as numpy, finest first (disps[0][..., 0] is the consumed
        disp_left_est[0] surface)."""
        import tensorflow as tf

        self.counts = {"model/encoder": 0, "model/decoder": 0}
        t = tf.constant(x)
        if encoder == "vgg":
            feats = []
            for k, ch in zip((7, 5, 3, 3, 3, 3, 3), (32, 64, 128, 256, 512, 512, 512)):
                t = self.conv(t, ch, k, 1, "model/encoder")
                t = self.conv(t, ch, k, 2, "model/encoder")
                feats.append(t)
            skips, bottom = feats[:6], feats[6]
            dec_chs = [512, 512, 256, 128, 64, 32, 16]
            n_ups = 7
        else:
            conv1 = self.conv(t, 64, 7, 2, "model/encoder")
            pool1 = self.maxpool(conv1)
            conv2 = self.resblock(pool1, 64, 3)
            conv3 = self.resblock(conv2, 128, 4)
            conv4 = self.resblock(conv3, 256, 6)
            bottom = self.resblock(conv4, 512, 3)
            skips = [conv1, pool1, conv2, conv3, conv4]
            dec_chs = [512, 256, 128, 64, 32, 16]
            n_ups = 6

        disps = []
        x_t = bottom
        udisp = None
        for level in range(n_ups, 0, -1):
            ch = dec_chs[n_ups - level]
            x_t = self.conv(self.upsample_nn(x_t), ch, 3, 1, "model/decoder")
            cat = [x_t]
            if 0 <= level - 2 < len(skips):
                cat.append(skips[level - 2])
            if udisp is not None:
                cat.append(udisp)
            x_t = self.conv(tf.concat(cat, axis=3), ch, 3, 1, "model/decoder")
            if level <= 4:
                disp = self.get_disp(x_t)
                disps.append(disp)
                if level > 1:
                    udisp = self.upsample_nn(disp, 2)
        return [d.numpy() for d in reversed(disps)]  # finest first
