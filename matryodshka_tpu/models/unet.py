"""The MSI prediction U-Net, as a single flax module.

The reference maintains three near-identical network definitions —
msi_train_net (slim + wrap_pad, nets.py:387-469), msi_inference_net
(explicit pad/slice for export, nets.py:297-385) and the CoordNet twins
(nets.py:471-618). Because XLA export works straight from the jitted
function, one definition suffices here, with two variants:

  * variant="wrap":  horizontal wrap padding + vertical zero padding before
    every VALID conv (matching wrap_pad, nets.py:288-295) — the 360-degree
    continuity-aware default. Transposed convs wrap-pad by 2, run VALID,
    and crop 5 px per side (the nets.py:427-429 alignment).
  * variant="coord": SAME padding with an |sin(latitude)| coordinate
    channel appended before every encoder/decoder conv
    (add_sph_coords, nets.py:260-265) — the released checkpoints' variant.

Topology (both variants, nets.py:403-450): 3-level encoder with stride-2
downsampling, a 3-conv dilated (rate 2) bottleneck, decoder with skip
concats and 4x4 stride-2 transposed convs, 1x1 tanh head.

Normalization is layer norm over (H, W, C) with per-channel scale/offset
(slim.layer_norm semantics), computed in float32.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def wrap_pad(x: Array, left: int, right: int) -> Array:
    """Horizontal wrap padding + vertical zero padding (nets.py:288-295).

    x: [B, H, W, C]; pads W by wrapping, H by zeros, both by (left, right).
    """
    l = x[:, :, -left:, :]
    r = x[:, :, :right, :]
    x = jnp.concatenate([l, x, r], axis=2)
    return jnp.pad(x, ((0, 0), (left, right), (0, 0), (0, 0)))


def sph_coord_channel(h: int, w: int, dtype=jnp.float32) -> Array:
    """|sin(latitude)| channel, [1, H, W, 1] (add_sph_coords,
    nets.py:260-265): 1 at the poles, 0 at the equator."""
    lat = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, h, dtype=jnp.float32)
    col = jnp.abs(jnp.sin(lat))
    return jnp.broadcast_to(col[None, :, None, None], (1, h, w, 1)).astype(
        dtype)


class SpatialLayerNorm(nn.Module):
    """Layer norm over (H, W, C) with per-channel scale/offset.

    Matches tf.contrib slim.layer_norm (begin_norm_axis=1,
    begin_params_axis=-1), computed in float32 regardless of input dtype.
    """
    epsilon: float = 1e-12
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, stats=None, true_c: int = None) -> Array:
        """stats=(sum, sumsq, count) skips the reduction passes (the
        fused conv kernel already accumulated them); true_c declares the
        REAL channel count of a lane-padded activation — params cover
        the real channels, pad lanes normalize to exact zeros (gamma=0,
        beta=0 extension) so padded chains stay clean."""
        c = true_c or x.shape[-1]
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        if stats is None:
            mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3),
                           keepdims=True)
        else:
            s1, s2, n = stats
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        beta = self.param("beta", nn.initializers.zeros, (c,),
                          self.param_dtype)
        gamma = self.param("gamma", nn.initializers.ones, (c,),
                           self.param_dtype)
        gamma32 = gamma.astype(jnp.float32)
        beta32 = beta.astype(jnp.float32)
        if x.shape[-1] != c:
            padn = x.shape[-1] - c
            gamma32 = jnp.pad(gamma32, (0, padn))
            beta32 = jnp.pad(beta32, (0, padn))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * gamma32 + beta32
        return y.astype(orig_dtype)


class FusedDeconvCrop(nn.Module):
    """4x4 stride-2 transposed conv with the [5:-5, 5:-5] alignment crop
    folded in as negative padding on an lhs-dilated convolution.

    Numerically identical to ConvTranspose(VALID)(wrap_pad(x, 2, 2))
    cropped by 5 per side (verified bit-exact), but avoids the separate
    slice op, which XLA materializes as a multi-ms layout copy of the
    [2H+10, 2W+10] intermediate. Parameter tree matches nn.ConvTranspose
    ({kernel [kh, kw, in, out], bias}).
    """
    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_wrapped: Array) -> Array:
        b, hp, wp, cin = x_wrapped.shape
        h, w = hp - 4, wp - 4
        f = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        # Subpixel decomposition: the lhs-dilated conv wastes 3/4 of its
        # MACs on inserted zeros; instead run ONE dense 2x2 conv whose
        # output channels hold all four output parities, then interleave
        # (out[2i+da, 2j+db] = conv(x, k[da::2, db::2]) at offset
        # (1+da, 1+db) — derived + verified bit-exact vs ConvTranspose).
        subs = [kernel[da::2, db::2] for da in (0, 1) for db in (0, 1)]
        k2 = jnp.concatenate(subs, axis=-1)          # [2, 2, cin, 4f]
        c = jax.lax.conv_general_dilated(
            x_wrapped.astype(self.dtype), k2.astype(self.dtype),
            window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        parts = []
        for idx, (da, db) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            parts.append(c[:, 1 + da:1 + da + h, 1 + db:1 + db + w,
                           idx * f:(idx + 1) * f])
        y = jnp.stack(parts, axis=3).reshape(b, h, w, 2, 2, f)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, f)
        return y + bias.astype(self.dtype)


class WrapConv3x3(nn.Module):
    """Stride-1 3x3 conv with ERP horizontal wrap (wrap_pad semantics).

    Same parameter tree as nn.Conv ({kernel [3,3,cin,cout], bias}).
    When `use_pallas` and the shape fits, runs ops/pallas_conv.py's
    VMEM-resident 9-GEMM kernel (wrap = free circular rolls); otherwise
    the XLA conv on the wrap-concatenated input (identical math).
    """
    features: int
    use_pallas: bool = False
    fused_ln: bool = False
    pallas_interpret: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cin_true: int = None):
        cin = cin_true or x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        xc = x.astype(self.dtype)

        if self.fused_ln:
            return self._fused(xc, kernel, bias, cin)

        if self.use_pallas:
            from matryodshka_tpu.ops import pallas_conv
            out = pallas_conv.conv3x3_wrap_dma(xc,
                                               kernel.astype(self.dtype),
                                               bias=bias)
            if out is not None:
                return out.astype(self.dtype)
        xp = jnp.concatenate([xc[:, :, -1:], xc, xc[:, :, :1]], axis=2)
        y = jax.lax.conv_general_dilated(
            xp, kernel.astype(self.dtype), (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)

    def _fused(self, xc: Array, kernel: Array, bias: Array, cin: int):
        """Fused conv + layer-norm-statistics contract: input may be
        lane-padded beyond `cin` (pad lanes ignored); returns
        (y [B, H, W, cout_pad] with ZERO pad lanes, s1 [B], s2 [B]) —
        the biased conv output plus its LN sums over real channels."""
        from matryodshka_tpu.ops import pallas_conv
        b = xc.shape[0]
        cout = self.features
        use_k = (self.pallas_interpret
                 or jax.default_backend() == "tpu")
        ys, s1s, s2s = [], [], []
        kernel_fits = (use_k and xc.shape[-1] % 128 == 0
                       and xc.shape[1] % pallas_conv.ROW_BLOCK == 0)
        for i in range(b):
            got = None
            if kernel_fits:
                got = pallas_conv.conv3x3_ln_stats(
                    xc[i], kernel.astype(self.dtype), bias, cin,
                    interpret=self.pallas_interpret)
            if got is None:
                # XLA fallback with the identical contract
                xr = xc[i][None, :, :, :cin]
                xp = jnp.concatenate([xr[:, :, -1:], xr, xr[:, :, :1]],
                                     axis=2)
                y = jax.lax.conv_general_dilated(
                    xp, kernel.astype(self.dtype), (1, 1),
                    ((1, 1), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
                y = (y.astype(jnp.float32)
                     + bias.astype(jnp.float32)).astype(self.dtype)
                cp = 128 * -(-cout // 128)
                y32 = y.astype(jnp.float32)
                got = (jnp.pad(y, ((0, 0), (0, 0), (0, cp - cout))),
                       jnp.sum(y32), jnp.sum(y32 * y32))
            ys.append(got[0])
            s1s.append(got[1])
            s2s.append(got[2])
        return jnp.stack(ys), jnp.stack(s1s), jnp.stack(s2s)


class MSIUNet(nn.Module):
    """MSI blend-weight / alpha prediction network.

    Attributes:
      num_outputs: output channels (see MatryConfig.num_net_outputs).
      ngf: base filter count (64 in all released configs).
      variant: "wrap" | "coord" (see module docstring).
      dtype: compute dtype (bfloat16 recommended on TPU).
      param_dtype: parameter dtype (float32).
    """
    num_outputs: int
    ngf: int = 64
    variant: str = "wrap"
    smoothed: bool = False   # NN-upsample + conv instead of conv_transpose
    use_pallas_conv: bool = False
    pallas_interpret: bool = False   # fused path off-TPU (tests)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def _conv(self, x: Array, feats: int, name: str, stride: int = 1,
              rate: int = 1) -> Array:
        """3x3 conv + layer norm + relu, padded per variant.

        The wrap variant appends `rate` wrapped columns on each side and
        runs the conv VALID horizontally / zero-padded vertically —
        exactly the reference's wrap_pad (nets.py:288-295). (A
        seam-recompute scheme that patched the wrap columns into a
        zero-padded conv output with scatter updates measured ~1.8x
        SLOWER end-to-end: each .at[].set() materializes a full
        activation copy on TPU.)
        """
        if self.variant == "coord":
            b, h, w, _ = x.shape
            coord = jnp.broadcast_to(
                sph_coord_channel(h, w, x.dtype), (b, h, w, 1))
            x = jnp.concatenate([x, coord], axis=-1)
            y = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding="SAME", kernel_dilation=(rate, rate),
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=name)(x)
        elif (stride == 1 and rate == 1
              and (self.use_pallas_conv or self.pallas_interpret)
              and (self.pallas_interpret or x.shape[-1] >= 160)):
            # gated to the fat-input layers (conv1_1's 192-channel
            # 320x640): the only shape class where the fused kernel
            # beats XLA's conv pipeline on this chip (isolated: 1.74 vs
            # 2.53 ms); the thin layers measured at par or worse
            # fused conv + layer-norm-statistics: the kernel streams its
            # own halo windows from HBM and accumulates the LN sums, so
            # the XLA side runs just the one normalize+relu pass
            cin = x.shape[-1]
            cp = 128 * -(-cin // 128)
            xpad = (jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - cin)))
                    if cp != cin else x)
            y, s1, s2 = WrapConv3x3(
                feats, use_pallas=True, fused_ln=True,
                pallas_interpret=self.pallas_interpret, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name)(xpad,
                                                         cin_true=cin)
            n = float(y.shape[1] * y.shape[2] * feats)
            y = SpatialLayerNorm(param_dtype=self.param_dtype,
                                 name=name + "_ln")(
                y, stats=(s1[:, None, None, None],
                          s2[:, None, None, None], n), true_c=feats)
            y = nn.relu(y)
            return y[..., :feats] if y.shape[-1] != feats else y
        elif stride == 1 and rate == 1:
            y = WrapConv3x3(feats, use_pallas=self.use_pallas_conv,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)(x)
        else:
            xp = jnp.concatenate([x[:, :, -rate:], x, x[:, :, :rate]],
                                 axis=2)
            y = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding=((rate, rate), (0, 0)),
                        kernel_dilation=(rate, rate), dtype=self.dtype,
                        param_dtype=self.param_dtype, name=name)(xp)
        y = SpatialLayerNorm(param_dtype=self.param_dtype,
                             name=name + "_ln")(y)
        return nn.relu(y)

    def _deconv(self, x: Array, feats: int, name: str) -> Array:
        """4x4 stride-2 upsampling conv + layer norm + relu.

        smoothed=True replaces the transposed conv with nearest-neighbor
        2x upsampling followed by a 4x4 conv (the checkerboard-free
        export option, nets.py:186-203, pad [1, 2, 1, 2])."""
        if self.smoothed:
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            if self.variant == "coord":
                y = nn.Conv(feats, (4, 4), padding=((1, 2), (1, 2)),
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)(x)
            else:
                left = x[:, :, -1:]
                right = x[:, :, :2]
                x = jnp.concatenate([left, x, right], axis=2)
                y = nn.Conv(feats, (4, 4), padding=((1, 2), (0, 0)),
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)(x)
        elif self.variant == "coord":
            y = nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 param_dtype=self.param_dtype, name=name)(x)
        else:
            x = wrap_pad(x, 2, 2)
            y = FusedDeconvCrop(feats, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)(x)
        y = SpatialLayerNorm(param_dtype=self.param_dtype,
                             name=name + "_ln")(y)
        return nn.relu(y)

    @nn.compact
    def __call__(self, net_input: Array) -> Array:
        ngf = self.ngf
        x = net_input.astype(self.dtype)

        cnv1_1 = self._conv(x, ngf, "conv1_1")
        cnv1_2 = self._conv(cnv1_1, ngf * 2, "conv1_2", stride=2)

        cnv2_1 = self._conv(cnv1_2, ngf * 2, "conv2_1")
        cnv2_2 = self._conv(cnv2_1, ngf * 4, "conv2_2", stride=2)

        cnv3_1 = self._conv(cnv2_2, ngf * 4, "conv3_1")
        cnv3_2 = self._conv(cnv3_1, ngf * 4, "conv3_2")
        cnv3_3 = self._conv(cnv3_2, ngf * 8, "conv3_3", stride=2)

        cnv4_1 = self._conv(cnv3_3, ngf * 8, "conv4_1", rate=2)
        cnv4_2 = self._conv(cnv4_1, ngf * 8, "conv4_2", rate=2)
        cnv4_3 = self._conv(cnv4_2, ngf * 8, "conv4_3", rate=2)

        skip = jnp.concatenate([cnv4_3, cnv3_3], axis=3)
        cnv6_1 = self._deconv(skip, ngf * 4, "conv6_1")
        cnv6_2 = self._conv(cnv6_1, ngf * 4, "conv6_2")
        cnv6_3 = self._conv(cnv6_2, ngf * 4, "conv6_3")

        skip = jnp.concatenate([cnv6_3, cnv2_2], axis=3)
        cnv7_1 = self._deconv(skip, ngf * 2, "conv7_1")
        cnv7_2 = self._conv(cnv7_1, ngf * 2, "conv7_2")

        skip = jnp.concatenate([cnv7_2, cnv1_2], axis=3)
        cnv8_1 = self._deconv(skip, ngf, "conv8_1")
        cnv8_2 = self._conv(cnv8_1, ngf, "conv8_2")

        pred = nn.Conv(self.num_outputs, (1, 1), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="color_pred")(cnv8_2)
        return jnp.tanh(pred).astype(jnp.float32)


def atlas_pack(pred: Array, height: int, width: int,
               channels: int = 64) -> Array:
    """Pack CNN output channels into an 8x(C/8) image atlas.

    Matches BOTH export-time msi_output tilings of the reference
    (nets.py:370-385): blend_psv keeps 64 channels -> [1, 8H, 8W]
    (output_h=8 mosaic, :370-376) and alpha_only keeps 32 -> [1, 8H, 4W]
    (:377-382); the channel->tile order (row-major over [8, C/8], same
    transpose chain) is identical, so 8x(C/8) reproduces each branch
    bit-for-bit.
    """
    cols = channels // 8
    x = jnp.transpose(pred[..., :channels], (0, 3, 1, 2))
    x = x.reshape(1, 8, cols, height, width)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(1, 8 * height, cols * width)
