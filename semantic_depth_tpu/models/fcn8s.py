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
    # Native full-resolution variant: 2x2 space-to-depth-pack the input
    # (bijective — every pixel enters the network, no interpolation) so the
    # whole trunk runs on the half-res grid with 12 input channels, and
    # restore input resolution by giving the final stride-8 deconv 4x the
    # class channels + depth_to_space (a learned per-phase decoder). Why:
    # dense evaluation at 1024x2048 is roofline-capped below the 30 fps bar
    # on one v5e (see DESIGN.md); the packed trunk costs 4x less while
    # consuming every pixel natively. Same FCN-8s topology otherwise; ships
    # its own trained weight set (conv1_1 and upscore8 shapes differ).
    input_s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = self.compute_dtype
        x = x.astype(dtype)
        if self.input_s2d:
            from ..ops import s2d as s2d_ops

            x = s2d_ops.space_to_depth(x)  # (B, H/2, W/2, 12)

        skips = {}
        for bi, (n_convs, ch) in enumerate(_VGG_BLOCKS, start=1):
            ch = max(1, int(ch * self.width_mult))
            for ci in range(1, n_convs + 1):
                x = nn.Conv(
                    ch, (3, 3), padding="SAME", dtype=dtype, name=f"conv{bi}_{ci}"
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
        # input_s2d: upscore8 emits the 4 pixel phases as channel groups and
        # depth_to_space restores the ORIGINAL input resolution — the phase
        # split is learned by the same deconv that already learns the x8
        # interpolation.
        out_ch = nc * 4 if self.input_s2d else nc
        up8 = nn.ConvTranspose(
            out_ch, (16, 16), strides=(8, 8), padding="SAME", dtype=dtype,
            kernel_init=init, transpose_kernel=True, name="upscore8",
        )(fuse3)
        if self.input_s2d:
            from ..ops import s2d as s2d_ops

            up8 = s2d_ops.depth_to_space(up8)
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
