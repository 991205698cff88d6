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

from ..ops import s2d as s2d_ops


class _ConvP(nn.Module):
    """Parameter container mirroring nn.Conv's tree (kernel/bias with the
    same names, shapes and initializers) WITHOUT binding a spatial
    evaluation — the s2d path applies these kernels through the transformed
    convolutions in ops/s2d.py while staying checkpoint-compatible with the
    plain path (params['enc1a']['kernel'] etc. are identical)."""

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

    __call__(images) -> list of disparity pyramids, finest first:
    ``disps[i]`` has shape (B, H/2^i, W/2^i, 2) with channels (left, right),
    values in (0, 0.3). The standard net returns 4 scales; with
    ``input_s2d=True`` there are 5 — the extra LEVEL-0 decoder step restores
    the original resolution from the packed grid, so ``disps[0]`` is the
    full-resolution map and the published 4 scales follow at indices 1..4.
    ``disp_left(images)`` returns the consumed surface either way: the
    finest left-disparity map (B, H, W).
    """

    encoder: str = "vgg"  # 'vgg' | 'resnet50'
    compute_dtype: Any = jnp.float32
    # monodepth_parameters.use_deconv (semantic_depth.py:618 passes False):
    # False -> nearest-neighbor x2 + conv; True -> pad + stride-2 transposed
    # conv + crop, per the published architecture.
    use_deconv: bool = False
    # Test-scale knob; 1.0 matches the reference network exactly.
    width_mult: float = 1.0
    # Evaluate the low-channel/high-resolution layers (the 7x7 stem and the
    # last two decoder levels) on the 2x2 space-to-depth grid with 4x the
    # channels — mathematically exact kernel rearrangements (ops/s2d.py)
    # that keep the MXU lanes full (the plain layers waste 4-8x on channel
    # padding at camera resolutions: measured 141 -> 90 ms at 1024x2048
    # batch 4 and 24 -> 13.5 ms at 256x512 batch 16 on v5e). Same parameter
    # tree; results match the plain path up to f32 summation order
    # (<= 1e-7 f32, <= 1e-3 bf16). Applies with nearest-neighbor upsampling
    # and H, W divisible by 8 (vgg) / 4 (resnet50); silently falls back to
    # the plain path otherwise.
    s2d_opt: bool = True
    # Native full-resolution variant: 2x2 space-to-depth-pack the input
    # (bijective, no interpolation) so the published trunk runs on the
    # half-res grid with 12 input channels, then an extra finest decoder
    # level ("level 0": upconv0/iconv0/disp0, 8 feature channels) restores
    # disparity at the ORIGINAL input resolution. Dense evaluation at
    # 1024x2048 is roofline-capped below the 30 fps bar on one v5e (see
    # DESIGN.md); the packed trunk costs ~4x less while consuming every
    # pixel natively. Ships its own trained weight set (enc1a and the
    # level-0 params differ from the reference tree).
    input_s2d: bool = False

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
        # EVERY resconv projects: the upstream condition
        # ``do_proj = tf.shape(x)[3] != num_layers or stride == 2`` compares
        # a TF1 scalar Tensor to an int with ``!=`` (never overridden in
        # TF1) — always True — so all 16 resconvs in the published
        # checkpoints carry a learned ``_sc`` 1x1 projection. Reproduce that
        # exactly or resnet50 weight parity is unattainable.
        out = self._conv(x, num_layers, 1, 1, f"{name}_c1")
        out = self._conv(out, num_layers, 3, stride, f"{name}_c2")
        out = self._conv(out, 4 * num_layers, 1, 1, f"{name}_c3", act=None)
        shortcut = self._conv(x, 4 * num_layers, 1, stride, f"{name}_sc", act=None)
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
        if self.input_s2d:
            x = s2d_ops.space_to_depth(x)  # (B, H/2, W/2, 12)
        # The vgg s2d path keeps enc2b's stride-2 output phase-packed on the
        # H/8 grid, so it needs H, W % 8 == 0 (a % 4 input like H=100 would
        # change shapes instead of falling back); resnet50 only uses the
        # H/2-grid stem and needs % 4.
        s2d_div = 8 if self.encoder == "vgg" else 4
        use_s2d = (
            self.s2d_opt
            and self.encoder in ("vgg", "resnet50")
            and not self.use_deconv
            and x.shape[1] % s2d_div == 0
            and x.shape[2] % s2d_div == 0
        )

        if use_s2d:
            return self._call_s2d(x)

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
        if self.input_s2d:
            # Level 0: one more decoder step from the packed grid back to the
            # ORIGINAL input resolution (input_s2d field doc above).
            x = self._upconv(x, 8, "upconv0")
            cat0 = jnp.concatenate(
                [x, _upsample_nn(disps[-1], 2).astype(x.dtype)], axis=3
            )
            x = self._conv(cat0, 8, 3, 1, "iconv0")
            disps.append(self._get_disp(x, 0))
        disps.reverse()  # finest (full res) first
        return disps

    def _call_s2d(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """Forward with the stem and decoder levels 2/1 evaluated on the
        space-to-depth grid (exact kernel rearrangement — see ops/s2d.py and
        the s2d_opt field). Identical parameter tree to the plain path.
        Runs inside __call__'s compact scope."""
        dt = self.compute_dtype
        ch32 = self._ch(32)
        ch16 = self._ch(16)

        if self.encoder == "vgg":
            # --- stem + block 2 entirely on the s2d grid: every conv here
            # has <= 64 channels, which runs at ~1/5 the MXU rate plain
            # (measured 23 vs 102 TF/s); stride-2 layers keep their outputs
            # PHASE-PACKED (s2d_conv stride=2) so lanes stay full end to end.
            ch64 = self._ch(64)
            in_ch = x.shape[3]  # 3, or 12 when input_s2d pre-packed
            ka, ba = _ConvP(ch32, 7, in_ch, name="enc1a")()
            kb, bb = _ConvP(ch32, 7, ch32, name="enc1b")()
            k2a, b2a = _ConvP(ch64, 5, ch32, name="enc2a")()
            k2b, b2b = _ConvP(ch64, 5, ch64, name="enc2b")()
            xs = s2d_ops.space_to_depth(x)  # (B, H/2, W/2, 4*in_ch)
            h1 = nn.elu(s2d_ops.s2d_conv([(xs, in_ch)], ka, ba, 7))  # conv1a phases
            c1s = nn.elu(
                s2d_ops.s2d_conv([(h1, ch32)], kb, bb, 7, stride=2)
            )  # (B, H/4, W/4, 4*ch32) == s2d(conv1 @ H/2)
            h2 = nn.elu(s2d_ops.s2d_conv([(c1s, ch32)], k2a, b2a, 5))
            c2s = nn.elu(
                s2d_ops.s2d_conv([(h2, ch64)], k2b, b2b, 5, stride=2)
            )  # (B, H/8, W/8, 4*ch64) == s2d(conv2 @ H/4)
            conv2 = s2d_ops.depth_to_space(c2s)  # (B, H/4, W/4, ch64)

            # encoder levels 3..7 unchanged (channels are MXU-wide there)
            conv3 = self._conv_block(conv2, 128, 3, 3)
            conv4 = self._conv_block(conv3, 256, 3, 4)
            conv5 = self._conv_block(conv4, 512, 3, 5)
            conv6 = self._conv_block(conv5, 512, 3, 6)
            bottom = self._conv_block(conv6, 512, 3, 7)
            # skips[0] (conv1) is consumed ONLY by the s2d level 2 below —
            # keep it phase-packed and never materialize the plain map.
            skips = [None, conv2, conv3, conv4, conv5, conv6]
            skip1_s2d, skip1_ch = c1s, ch32
            dec_chs = [512, 512, 256, 128, 64, 32, 16]
            n_ups = 7
        else:  # resnet50: 7x7-s2 stem as one coarse conv on the s2d grid
            ch64 = self._ch(64)
            in_ch = x.shape[3]  # 3, or 12 when input_s2d pre-packed
            k1, b1 = _ConvP(ch64, 7, in_ch, name="enc1")()
            xs = s2d_ops.space_to_depth(x)
            conv1 = nn.elu(
                s2d_ops.s2d_conv([(xs, in_ch)], k1, b1, 7, phase_out=False)
            )  # (B, H/2, W/2, ch64) == plain enc1
            pool1 = self._maxpool(conv1)
            conv2 = self._resblock(pool1, 64, 3, "res2")
            conv3 = self._resblock(conv2, 128, 4, "res3")
            conv4 = self._resblock(conv3, 256, 6, "res4")
            bottom = self._resblock(conv4, 512, 3, "res5")
            skips = [None, pool1, conv2, conv3, conv4]
            skip1_s2d, skip1_ch = s2d_ops.space_to_depth(conv1), ch64
            dec_chs = [512, 256, 128, 64, 32, 16]
            n_ups = 6

        # --- decoder levels n_ups..3 unchanged ---
        disps: List[jnp.ndarray] = []
        xx = bottom
        udisp = None
        for level in range(n_ups, 2, -1):
            ch = dec_chs[n_ups - level]
            xx = self._upconv(xx, ch, f"upconv{level}")
            cat = [xx]
            skip_idx = level - 2
            if 0 <= skip_idx < len(skips):
                cat.append(skips[skip_idx].astype(xx.dtype))
            if udisp is not None:
                cat.append(udisp.astype(xx.dtype))
            xx = self._conv(jnp.concatenate(cat, axis=3), ch, 3, 1, f"iconv{level}")
            if level <= 4:
                disp = self._get_disp(xx, level)
                disps.append(disp)
                if level > 3:  # level 3's udisp is consumed by the s2d level 2
                    udisp = _upsample_nn(disp, 2)
        disp3 = disps[-1]  # (B, H/4, W/4, 2) -> feeds level 2 via phases

        # --- level 2 on the s2d grid (fine = H/2, coarse = H/4) ---
        ku2, bu2 = _ConvP(ch32, 3, xx.shape[3], name="upconv2")()
        up2 = nn.elu(s2d_ops.upconv_s2d(xx, ku2, bu2, 3))  # (H/4, 4*ch32)
        # s2d(up_nn(disp3)) at the H/4 grid == disp3's channels replicated
        # across the 4 phases
        ud2 = s2d_ops.replicate_phases(disp3.astype(dt))
        ki2, bi2 = _ConvP(ch32, 3, ch32 + skip1_ch + 2, name="iconv2")()
        x2 = nn.elu(
            s2d_ops.s2d_conv(
                [(up2, ch32), (skip1_s2d, skip1_ch), (ud2, 2)], ki2, bi2, 3
            )
        )  # (H/4, 4*ch32)
        kd2, bd2 = _ConvP(2, 3, ch32, name="disp2")()
        d2 = 0.3 * nn.sigmoid(s2d_ops.s2d_conv([(x2, ch32)], kd2, bd2, 3))
        disp2 = s2d_ops.depth_to_space(d2).astype(jnp.float32)  # (H/2, 2)
        disps.append(disp2)

        # --- level 1 on the s2d grid (fine = H, coarse = H/2) ---
        x2_plain = s2d_ops.depth_to_space(x2)  # (H/2, ch32)
        ku1, bu1 = _ConvP(ch16, 3, ch32, name="upconv1")()
        up1 = nn.elu(s2d_ops.upconv_s2d(x2_plain, ku1, bu1, 3))  # (H/2, 4*ch16)
        ud1 = s2d_ops.replicate_phases(disp2.astype(dt))  # (H/2, 8)
        ki1, bi1 = _ConvP(ch16, 3, ch16 + 2, name="iconv1")()
        x1 = nn.elu(s2d_ops.s2d_conv([(up1, ch16), (ud1, 2)], ki1, bi1, 3))
        kd1, bd1 = _ConvP(2, 3, ch16, name="disp1")()
        d1 = 0.3 * nn.sigmoid(s2d_ops.s2d_conv([(x1, ch16)], kd1, bd1, 3))
        disps.append(s2d_ops.depth_to_space(d1).astype(jnp.float32))  # (H, 2)

        if self.input_s2d:
            # Level 0 on the s2d grid (fine = the ORIGINAL resolution, 2x the
            # packed input): same params as the plain-path level 0.
            ch8 = self._ch(8)
            x1_plain = s2d_ops.depth_to_space(x1)  # (H, ch16)
            ku0, bu0 = _ConvP(ch8, 3, ch16, name="upconv0")()
            up0 = nn.elu(s2d_ops.upconv_s2d(x1_plain, ku0, bu0, 3))  # (H, 4*ch8)
            ud0 = s2d_ops.replicate_phases(disps[-1].astype(dt))  # (H, 8)
            ki0, bi0 = _ConvP(ch8, 3, ch8 + 2, name="iconv0")()
            x0 = nn.elu(s2d_ops.s2d_conv([(up0, ch8), (ud0, 2)], ki0, bi0, 3))
            kd0, bd0 = _ConvP(2, 3, ch8, name="disp0")()
            d0 = 0.3 * nn.sigmoid(s2d_ops.s2d_conv([(x0, ch8)], kd0, bd0, 3))
            disps.append(s2d_ops.depth_to_space(d0).astype(jnp.float32))  # (2H, 2)

        disps.reverse()
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
