"""FCN-8s semantic segmentation (VGG16 encoder, 3-skip decoder).

TPU-native re-implementation of the reference network:

* encoder — the Udacity VGG16 SavedModel the reference loads by tensor name
  (`image_input:0`, `layer3_out:0`, `layer4_out:0`, `layer7_out:0`,
  fcn8s/fcn.py:82-95): VGG16 conv stacks with fc6/fc7 convolutionalized
  (7x7x4096 and 1x1x4096) and dropout driven by a keep_prob;
* decoder — three 1x1 class convs on pool3/pool4/fc7 plus two 4x4-stride-2
  transposed convs with skip adds and one 16x16-stride-8 transposed conv
  (fcn8s/fcn.py:159-215).

Design notes (TPU-first, not a port):
* NHWC layout end to end, bf16-compatible with f32 accumulation: pass
  ``compute_dtype=jnp.bfloat16`` and the convs run on the MXU in bf16 while
  parameters and logits stay f32.
* The reference runs inference with raw 0..255 RGB floats (no normalization —
  the Udacity SavedModel has none; semantic_depth.py:550-552 feeds the resized
  frame directly). We do the same; callers must not rescale.
* keep_prob semantics follow the reference (probability of KEEPING a unit,
  fed 0.5 in training, 1.0 at inference — fcn.py:293,301).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

# VGG16 conv stacks: (num convs, channels) per block; pools between blocks.
_VGG_BLOCKS: Sequence[tuple] = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class _ConvParams(nn.Module):
    """Parameter container mirroring nn.Conv's tree (kernel/bias, same names,
    shapes, initializers) WITHOUT binding a spatial evaluation — the Pallas
    fast path applies these kernels through ops/pallas_conv while staying
    checkpoint-compatible with the plain path."""

    features: int
    ksize: int
    in_ch: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class FCN8s(nn.Module):
    """FCN-8s with VGG16 encoder.

    __call__(images, train=False) -> (B, H, W, num_classes) logits where
    (H, W) equals the input spatial shape (stride-8 deconv restores it).
    """

    num_classes: int = 3
    compute_dtype: Any = jnp.float32
    dropout_keep_prob: float = 0.5
    # Test-scale knobs; defaults match the reference network exactly.
    width_mult: float = 1.0
    fc_channels: int = 4096
    # Route the narrow encoder blocks 1-2 (except the 3->64 stem, which XLA
    # handles well) through the Pallas direct conv (ops/pallas_conv) — XLA's
    # conv for 64/128-channel layers sustains only ~23 TF/s on v5e (the
    # contraction depth is C, half the MXU idle); the Pallas kernel's
    # im2col-per-kernel-row form contracts over 3C. Identical parameter tree
    # (checkpoints drop in unchanged); same math to f32 accumulation order.
    # Off by default: enable on TPU (the interpreter path is slow on CPU).
    pallas_blocks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = self.compute_dtype
        x = x.astype(dtype)

        skips = {}
        for bi, (n_convs, ch) in enumerate(_VGG_BLOCKS, start=1):
            ch = max(1, int(ch * self.width_mult))
            for ci in range(1, n_convs + 1):
                name = f"conv{bi}_{ci}"
                use_pallas = (
                    self.pallas_blocks
                    and bi <= 2
                    and not (bi == 1 and ci == 1)
                    and x.shape[1] % 8 == 0
                )
                if use_pallas:
                    from ..ops.pallas_conv import conv3x3_same

                    k, b = _ConvParams(ch, 3, x.shape[-1], name=name)()
                    tile_h = 8 if x.shape[-1] <= 64 else 4
                    x = conv3x3_same(x, k, b, relu=True, tile_h=tile_h)
                else:
                    x = nn.Conv(
                        ch, (3, 3), padding="SAME", dtype=dtype, name=name
                    )(x)
                    x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if bi == 3:
                skips["pool3"] = x  # layer3_out, H/8
            elif bi == 4:
                skips["pool4"] = x  # layer4_out, H/16

        # fc6/fc7 convolutionalized (Udacity vgg16 SavedModel layout)
        x = nn.Conv(self.fc_channels, (7, 7), padding="SAME", dtype=dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=1.0 - self.dropout_keep_prob, deterministic=not train)(x)
        x = nn.Conv(self.fc_channels, (1, 1), dtype=dtype, name="fc7")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=1.0 - self.dropout_keep_prob, deterministic=not train)(x)
        skips["fc7"] = x  # layer7_out, H/32

        # Decoder (fcn.py:159-215): 1x1 class convs + transposed-conv upsamples
        # with skip additions.
        nc = self.num_classes
        init = nn.initializers.truncated_normal(stddev=0.01)  # fcn.py:161
        score7 = nn.Conv(nc, (1, 1), dtype=dtype, kernel_init=init, name="score_fc7")(
            skips["fc7"]
        )
        score4 = nn.Conv(nc, (1, 1), dtype=dtype, kernel_init=init, name="score_pool4")(
            skips["pool4"]
        )
        score3 = nn.Conv(nc, (1, 1), dtype=dtype, kernel_init=init, name="score_pool3")(
            skips["pool3"]
        )

        # transpose_kernel=True -> gradient-of-conv with TF's (H, W, O, I)
        # kernel layout, matching tf.layers.conv2d_transpose bit-for-bit so
        # converted reference checkpoints drop straight in.
        up2 = nn.ConvTranspose(
            nc, (4, 4), strides=(2, 2), padding="SAME", dtype=dtype, kernel_init=init,
            transpose_kernel=True, name="upscore2",
        )(score7)
        fuse4 = up2 + score4
        up4 = nn.ConvTranspose(
            nc, (4, 4), strides=(2, 2), padding="SAME", dtype=dtype, kernel_init=init,
            transpose_kernel=True, name="upscore4",
        )(fuse4)
        fuse3 = up4 + score3
        up8 = nn.ConvTranspose(
            nc, (16, 16), strides=(8, 8), padding="SAME", dtype=dtype, kernel_init=init,
            transpose_kernel=True, name="upscore8",
        )(fuse3)
        return up8.astype(jnp.float32)


def decoder_l2_loss(params, scale: float = 1e-3) -> jnp.ndarray:
    """L2 regularization over decoder kernels, matching the reference's
    tf.contrib l2_regularizer(1e-3) applied to every decoder conv
    (fcn.py:169-213). TF's l2_regularizer computes scale * sum(w^2) / 2."""
    decoder_names = (
        "score_fc7",
        "score_pool4",
        "score_pool3",
        "upscore2",
        "upscore4",
        "upscore8",
    )
    total = 0.0
    for name in decoder_names:
        w = params["params"][name]["kernel"]
        total = total + jnp.sum(jnp.square(w.astype(jnp.float32)))
    return 0.5 * scale * total
