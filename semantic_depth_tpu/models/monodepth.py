"""Monodepth monocular disparity network (Godard et al., CVPR'17).

The reference vendors this network but ships no code (monodepth_lib/README.md
directs users to copy it from mrharicot/monodepth; .gitignore:21 excludes the
.py files). This is therefore a from-spec rebuild of the published
architecture, covering the surface the reference consumes
(semantic_depth.py:609-675):

* ``monodepth_parameters``: encoder 'vgg' | 'resnet50', test mode, batch of 2
  (frame + horizontal flip), ``disp_left_est[0]`` output;
* conv layers use ELU activations with symmetric padding
  p = floor((k-1)/2) before a VALID conv (this differs from TF 'SAME' for
  stride-2 layers, and matters for weight parity);
* disparity heads are ``0.3 * sigmoid(conv(x, 2, 3))``; the left disparity is
  channel 0;
* decoder upsampling is nearest-neighbor x2 + 3x3 conv (use_deconv=False in
  the reference params, semantic_depth.py:617).

TPU-first notes: NHWC, optionally bf16 on the MXU with f32 disparity output;
static shapes; the whole pyramid is one XLA program.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn


def _sym_pad(x: jnp.ndarray, k: int) -> jnp.ndarray:
    p = (k - 1) // 2
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


def _upsample_nn(x: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    x = jnp.repeat(x, ratio, axis=1)
    return jnp.repeat(x, ratio, axis=2)


class Monodepth(nn.Module):
    """Monodepth disparity network.

    __call__(images) -> list of 4 disparity pyramids, finest first:
    ``disps[i]`` has shape (B, H/2^i, W/2^i, 2) with channels (left, right),
    values in (0, 0.3). ``disp_left(images)`` returns the consumed surface:
    the finest left-disparity map (B, H, W).
    """

    encoder: str = "vgg"  # 'vgg' | 'resnet50'
    compute_dtype: Any = jnp.float32
    # monodepth_parameters.use_deconv (semantic_depth.py:618 passes False):
    # False -> nearest-neighbor x2 + conv; True -> pad + stride-2 transposed
    # conv + crop, per the published architecture.
    use_deconv: bool = False
    # Test-scale knob; 1.0 matches the reference network exactly.
    width_mult: float = 1.0

    def _ch(self, ch: int) -> int:
        return max(1, int(ch * self.width_mult))

    def _conv(self, x, ch, k, stride, name, act="elu", scale_ch=True):
        if scale_ch:
            ch = self._ch(ch)
        # Symmetric pad p = (k-1)//2 expressed as the conv's own padding
        # attribute: identical sums to _sym_pad + VALID (the published
        # network's semantics, which differ from SAME at stride 2), but XLA
        # keeps it inside the convolution instead of materializing a padded
        # copy through HBM per layer.
        p = (k - 1) // 2
        x = nn.Conv(
            ch, (k, k), strides=(stride, stride), padding=((p, p), (p, p)),
            dtype=self.compute_dtype, name=name,
        )(x)
        if act == "elu":
            return nn.elu(x)
        if act == "sigmoid":
            return nn.sigmoid(x)
        return x

    def _conv_block(self, x, ch, k, idx):
        x = self._conv(x, ch, k, 1, f"enc{idx}a")
        return self._conv(x, ch, k, 2, f"enc{idx}b")

    def _maxpool(self, x, k=3):
        x = _sym_pad(x, k)
        return nn.max_pool(x, (k, k), strides=(2, 2), padding="VALID")

    def _resconv(self, x, num_layers, stride, name):
        do_proj = (x.shape[3] != self._ch(num_layers * 4)) or (stride == 2)
        out = self._conv(x, num_layers, 1, 1, f"{name}_c1")
        out = self._conv(out, num_layers, 3, stride, f"{name}_c2")
        out = self._conv(out, 4 * num_layers, 1, 1, f"{name}_c3", act=None)
        if do_proj:
            shortcut = self._conv(x, 4 * num_layers, 1, stride, f"{name}_sc", act=None)
        else:
            shortcut = x
        return nn.elu(out + shortcut)

    def _resblock(self, x, num_layers, num_blocks, name):
        for i in range(num_blocks - 1):
            x = self._resconv(x, num_layers, 1, f"{name}_{i}")
        return self._resconv(x, num_layers, 2, f"{name}_{num_blocks - 1}")

    def _get_disp(self, x, idx):
        # Always exactly 2 channels (left, right) regardless of width_mult.
        d = self._conv(x, 2, 3, 1, f"disp{idx}", act="sigmoid", scale_ch=False)
        return (0.3 * d).astype(jnp.float32)

    def _upconv(self, x, ch, name):
        if self.use_deconv:
            return self._deconv(x, ch, 3, name)
        return self._conv(_upsample_nn(x), ch, 3, 1, name)

    def _deconv(self, x, ch, k, name):
        """Published deconv variant: pad 1, stride-2 transposed conv (SAME,
        gradient-of-conv semantics like TF), crop [3:-1] — net 2x upsample."""
        ch = self._ch(ch)
        p_x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = nn.ConvTranspose(
            ch, (k, k), strides=(2, 2), padding="SAME", transpose_kernel=True,
            dtype=self.compute_dtype, name=name,
        )(p_x)
        return nn.elu(y[:, 3:-1, 3:-1, :])

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        x = images.astype(self.compute_dtype)

        if self.encoder == "vgg":
            conv1 = self._conv_block(x, 32, 7, 1)  # H/2
            conv2 = self._conv_block(conv1, 64, 5, 2)  # H/4
            conv3 = self._conv_block(conv2, 128, 3, 3)  # H/8
            conv4 = self._conv_block(conv3, 256, 3, 4)  # H/16
            conv5 = self._conv_block(conv4, 512, 3, 5)  # H/32
            conv6 = self._conv_block(conv5, 512, 3, 6)  # H/64
            conv7 = self._conv_block(conv6, 512, 3, 7)  # H/128
            skips = [conv1, conv2, conv3, conv4, conv5, conv6]
            bottom = conv7
            dec_chs = [512, 512, 256, 128, 64, 32, 16]
            n_ups = 7
        elif self.encoder == "resnet50":
            conv1 = self._conv(x, 64, 7, 2, "enc1")  # H/2
            pool1 = self._maxpool(conv1)  # H/4
            conv2 = self._resblock(pool1, 64, 3, "res2")  # H/8
            conv3 = self._resblock(conv2, 128, 4, "res3")  # H/16
            conv4 = self._resblock(conv3, 256, 6, "res4")  # H/32
            conv5 = self._resblock(conv4, 512, 3, "res5")  # H/64
            skips = [conv1, pool1, conv2, conv3, conv4]
            bottom = conv5
            dec_chs = [512, 256, 128, 64, 32, 16]
            n_ups = 6
        else:
            raise ValueError(f"unknown encoder: {self.encoder}")

        # Decoder: upconv -> concat(skip [, upsampled coarser disp]) -> iconv;
        # disparity heads at the last 4 scales.
        disps: List[jnp.ndarray] = []
        x = bottom
        udisp = None
        for level in range(n_ups, 0, -1):  # level = output stride exponent
            ch = dec_chs[n_ups - level]
            x = self._upconv(x, ch, f"upconv{level}")
            cat = [x]
            skip_idx = level - 2  # skip feeding level L is at H/2^(L-1)
            if 0 <= skip_idx < len(skips):
                cat.append(skips[skip_idx].astype(x.dtype))
            if udisp is not None:
                cat.append(udisp.astype(x.dtype))
            x = self._conv(jnp.concatenate(cat, axis=3), ch, 3, 1, f"iconv{level}")
            if level <= 4:
                disp = self._get_disp(x, level)
                disps.append(disp)
                if level > 1:
                    udisp = _upsample_nn(disp, 2)
        disps.reverse()  # finest (full res) first
        return disps

    def disp_left(self, images: jnp.ndarray) -> jnp.ndarray:
        """The consumed surface: ``disp_left_est[0]`` — finest left disparity
        (semantic_depth.py:675). images: (B, H, W, 3) in [0, 1]."""
        return self(images)[0][..., 0]


def flip_average_postprocess(disp: jnp.ndarray) -> jnp.ndarray:
    """Flip-averaged disparity post-processing (semantic_depth.py:656-664).

    disp: (2, H, W) — row 0 from the frame, row 1 from its horizontal flip.
    Returns (H, W): blended disparity with ramped masks near the left/right
    borders exactly as the reference computes them.
    """
    h, w = disp.shape[1], disp.shape[2]
    l_disp = disp[0]
    r_disp = disp[1, :, ::-1]
    m_disp = 0.5 * (l_disp + r_disp)
    l = jnp.tile(jnp.linspace(0.0, 1.0, w)[None, :], (h, 1))
    l_mask = 1.0 - jnp.clip(20.0 * (l - 0.05), 0.0, 1.0)
    r_mask = l_mask[:, ::-1]
    return r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m_disp
