"""HookNet segmentation model in Flax: two coupled U-Nets.

Capability parity with the reference (``src/models/hooknet.py``), which
builds on segmentation_models_pytorch's Unet:

  * Both branches: ResNet encoder (5-level pyramid) + U-Net decoder with
    nearest 2x upsampling and [Conv3x3-BN-ReLU] x2 blocks
    (smp ``DecoderBlock``), and a 3x3 conv segmentation head.
  * The **context branch** exports the center crop of its decoder feature
    map at block index 1 — for a 256px input that is the 8x8 center of the
    32x32, 128-channel map, i.e. exactly the sub-region the target branch
    sees at 4x magnification (``hooknet.py:29-33``: ``x[:, :, 12:20,
    12:20]``; generalized here to the center H/4 crop).
  * The **target branch** concatenates those 128 context channels onto its
    encoder head before decoding (``hooknet.py:64-66,93``).

TPU-first: NHWC, bf16 compute with fp32 params/BN stats; upsampling via
``jnp.repeat`` (pure data movement XLA fuses into the following conv).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import s2d
from .resnet import get_encoder

__all__ = ["HookNet", "ContextUnet", "TargetUnet", "UnetDecoder"]

# smp initialize_decoder: kaiming_uniform(mode=fan_in, nonlinearity=relu).
_decoder_conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
# smp initialize_head: xavier_uniform.
_head_conv_init = nn.initializers.glorot_uniform()


def _upsample2x_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class Conv2dReLU(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(
            self.out_ch,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_decoder_conv_init,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv``: declares the identical
    ``kernel`` (+ optional ``bias``) variables so the packed decoder path
    can drive the convolution itself while keeping the variable tree
    bit-compatible with :class:`Conv2dReLU` / :class:`SegmentationHead`
    (checkpoints interchange freely with the unpacked model)."""

    out_ch: int
    in_ch: int
    kernel_init: Any = _decoder_conv_init
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, self.in_ch, self.out_ch), jnp.float32
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.out_ch,), jnp.float32
        )
        return kernel, bias


class _PackedBN(nn.Module):
    """BatchNorm over a space-to-depth packed activation.

    Variables are bit-compatible with ``nn.BatchNorm(momentum=0.9,
    epsilon=1e-5)`` on the *logical* (C,) channels; the input is packed
    ``(B, h, w, 4C)`` (sub-position-major), and statistics reduce over the
    4 sub-positions too — exactly the logical (batch, H, W) element set, so
    the math equals the logical BN up to fp reassociation. Normalization is
    applied as a folded per-channel affine computed in fp32."""

    C: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp, *, train: bool):
        C = self.C
        scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (C,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", jnp.ones, (C,), jnp.float32)
        if train:
            acc = jnp.promote_types(xp.dtype, jnp.float32)
            xf = s2d.packed_bn_reduce_axes(xp, C).astype(acc)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        acc = jnp.promote_types(xp.dtype, jnp.float32)
        return (xp.astype(acc) * s2d.tile_params(a) + s2d.tile_params(b)).astype(
            self.dtype
        )


class PackedConv2dReLU(nn.Module):
    """:class:`Conv2dReLU` computed in the 2x2 space-to-depth domain.

    Input/output are packed ``(B, h, w, 4C)`` activations; the conv uses
    the structured packed kernel (``ops/s2d.py``), which is exactly the
    logical SAME 3x3 conv. ``in_groups`` gives the logical channel count of
    each independently-packed group concatenated on the input (upsample
    path + skip), since concat-of-packed is not packed-of-concat."""

    out_ch: int
    in_groups: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp, *, train: bool):
        in_ch = sum(self.in_groups)
        kernel, _ = _ConvParams(self.out_ch, in_ch, name="conv")()
        packed_kernel = _pack_grouped_kernel(kernel, self.in_groups)
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype),
            packed_kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _PackedBN(self.out_ch, dtype=self.dtype, name="bn")(y, train=train)
        return nn.relu(y)


def _pack_grouped_kernel(kernel, in_groups):
    """Packed kernel for an input that is a concat of independently packed
    groups: pack each logical input-channel slice separately and concat on
    the packed input axis (matching ``concat([packed_a, packed_b], -1)``)."""
    parts, lo = [], 0
    for g in in_groups:
        parts.append(s2d.pack_conv3x3_kernel(kernel[:, :, lo : lo + g, :]))
        lo += g
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]


def _packed_upsample2x(xp):
    """Nearest 2x upsample of a packed activation, emitted packed.

    ``packed@2h[I, J, p, c] = logical@2h[2I+py, 2J+px, c] =
    logical@h[I, J, c] = packed@h[I//2, J//2, (I%2, J%2), c]`` — i.e. a
    depth-to-space whose every sub-position block broadcasts to all four
    output sub-positions. One full-lane data-movement pass, never
    materializing the lane-padded logical tensor. (Kept for the unfused
    reference path and tests; the default packed block fuses this shuffle
    into conv1 via ``s2d.pack_upconv3x3_kernel`` instead.)"""
    B, h, w, C4 = xp.shape
    t = xp.reshape(B, h, w, 4, 1, C4 // 4)
    t = jnp.broadcast_to(t, (B, h, w, 4, 4, C4 // 4)).reshape(B, h, w, 4 * C4)
    return s2d.depth_to_space(t)


class PackedEntryConv2dReLU(nn.Module):
    """First :class:`Conv2dReLU` of a packed decoder block with the
    upsample / skip-s2d shuffles folded into the convolution kernels
    (exact — see ``ops/s2d.py`` routing derivations):

      * ``x`` packed: one ``lhs_dilation=(2,2)`` conv with the structured
        (4, 4, 4Cin, 4Cout) kernel computes [packed 2x upsample -> logical
        SAME 3x3 conv] without materializing the upsampled tensor;
      * ``x`` logical (first packed block): the 2x-upsample entry is a free
        channel tile + packed conv (the fused alternative measured slower);
      * ``skip`` (always logical): a window-4 stride-2 conv consumes it
        directly — its space-to-depth never runs. The two convs sum (conv
        linearity over input-channel groups == the concat formulation).

    Variable tree identical to :class:`PackedConv2dReLU` / the unpacked
    :class:`Conv2dReLU` (one ``conv/kernel`` of logical shape
    (3, 3, in_ch + skip_ch, out_ch) plus ``bn``), so checkpoints
    interchange freely with every other decoder variant."""

    out_ch: int
    in_ch: int
    skip_ch: int = 0
    x_packed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        kernel, _ = _ConvParams(self.out_ch, self.in_ch + self.skip_ch, name="conv")()
        wx = kernel[:, :, : self.in_ch]
        if self.x_packed:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                s2d.pack_upconv3x3_kernel(wx).astype(self.dtype),
                window_strides=(1, 1),
                padding=((2, 2), (2, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                s2d.upsample2x_packed(x).astype(self.dtype),
                s2d.pack_conv3x3_kernel(wx).astype(self.dtype),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if skip is not None:
            wsk = kernel[:, :, self.in_ch :]
            y = y + jax.lax.conv_general_dilated(
                skip.astype(self.dtype),
                s2d.pack_skipconv3x3_kernel(wsk).astype(self.dtype),
                window_strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = _PackedBN(self.out_ch, dtype=self.dtype, name="bn")(y, train=train)
        return nn.relu(y)


class DecoderBlock(nn.Module):
    """smp DecoderBlock: nearest 2x upsample -> concat skip -> 2x Conv2dReLU."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        x = _upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = Conv2dReLU(self.out_ch, dtype=self.dtype, name="conv1")(x, train=train)
        x = Conv2dReLU(self.out_ch, dtype=self.dtype, name="conv2")(x, train=train)
        return x


class PackedDecoderBlock(nn.Module):
    """:class:`DecoderBlock` in the space-to-depth domain. ``x`` may be
    logical (first packed block: packed entry happens at its upsample,
    which costs nothing — see :func:`s2d.upsample2x_packed`) or already
    packed; ``skip`` is always logical. Variable tree identical to
    :class:`DecoderBlock`."""

    out_ch: int
    in_ch: int
    skip_ch: int = 0
    x_packed: bool = False
    fused_entry: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        if self.fused_entry:
            xp = PackedEntryConv2dReLU(
                self.out_ch,
                in_ch=self.in_ch,
                skip_ch=0 if skip is None else self.skip_ch,
                x_packed=self.x_packed,
                dtype=self.dtype,
                name="conv1",
            )(x, skip, train=train)
        else:
            xp = _packed_upsample2x(x) if self.x_packed else s2d.upsample2x_packed(x)
            groups = [self.in_ch]
            if skip is not None:
                xp = jnp.concatenate(
                    [xp, s2d.space_to_depth(skip).astype(xp.dtype)], -1
                )
                groups.append(self.skip_ch)
            xp = PackedConv2dReLU(
                self.out_ch, tuple(groups), dtype=self.dtype, name="conv1"
            )(xp, train=train)
        xp = PackedConv2dReLU(self.out_ch, (self.out_ch,), dtype=self.dtype, name="conv2")(
            xp, train=train
        )
        return xp


# Default first decoder block run in the space-to-depth domain when
# packed_tail is on. Blocks 3 (C=32 @ half resolution) and 4 (C=16 @ full
# resolution) are the narrow tail whose lane padding (4x / 8x) dominates
# the finetune step's HBM traffic; block 2 (C=64, 2x pad on a 4x smaller
# grid) is measurable via packed_from=2.
_PACKED_FROM = 3


class UnetDecoder(nn.Module):
    """U-Net decoder over a 5-level pyramid with optional HookNet coupling.

    ``export_block``: emit the center H/4 crop of that block's output (the
    context branch's hook source, block 1). ``context_channels > 0``: expect
    ``context_feats`` concatenated onto the encoder head (target branch).

    ``packed_tail``: run decoder blocks >= ``_PACKED_FROM`` in the 2x2
    space-to-depth domain (exact — see ``ops/s2d.py``) and return the final
    activation **packed** ``(B, H/2, W/2, 4C)``; pair with
    :class:`PackedSegmentationHead`. Avoids materializing the narrow-channel
    (C=32/16) full-resolution activations whose 128-lane padding inflates
    HBM traffic 4-8x on TPU.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    export_block: int | None = None
    expect_context: bool = False
    packed_tail: bool = False
    packed_from: int = _PACKED_FROM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, context_feats=None, *, train: bool):
        # pyramid: [stem/2, layer1/4, layer2/8, layer3/16, layer4/32]
        feats = list(pyramid)[::-1]
        head, skips = feats[0], feats[1:]  # skips: /16, /8, /4, /2

        x = head
        if self.expect_context:
            if context_feats is None:
                raise ValueError("target decoder requires context_feats")
            x = jnp.concatenate([x, context_feats.astype(x.dtype)], axis=-1)

        if self.packed_tail and self.export_block is not None:
            # User-config validation must survive python -O: a packed hook
            # export would compute the H/4 crop on the (h/2, w/2, 4C) packed
            # tensor and deliver a wrong-layout hook into the target branch.
            if self.export_block >= self.packed_from:
                raise ValueError(
                    f"hook export block {self.export_block} must run in the "
                    f"logical domain (packed_from={self.packed_from})"
                )

        exported = None
        packed = False
        in_ch = x.shape[-1]
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            if self.packed_tail and i >= self.packed_from:
                x = PackedDecoderBlock(
                    out_ch,
                    in_ch=in_ch,
                    skip_ch=0 if skip is None else skip.shape[-1],
                    x_packed=packed,
                    dtype=self.dtype,
                    name=f"block{i}",
                )(x, skip, train=train)
                packed = True
            else:
                x = DecoderBlock(out_ch, dtype=self.dtype, name=f"block{i}")(
                    x, skip, train=train
                )
            in_ch = out_ch
            if self.export_block is not None and i == self.export_block:
                h = x.shape[1]
                c0 = h // 2 - h // 8
                c1 = h // 2 + h // 8  # center h/4 crop (12:20 for h=32)
                exported = x[:, c0:c1, c0:c1, :]

        if self.export_block is not None:
            return x, exported
        return x


class SegmentationHead(nn.Module):
    classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.classes,
            (3, 3),
            padding=1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_head_conv_init,
            bias_init=nn.initializers.zeros_init(),
            name="conv",
        )(x)


class PackedSegmentationHead(nn.Module):
    """:class:`SegmentationHead` on a packed decoder output. By default
    returns **logical** (B, H, W, classes) logits via a final
    depth-to-space (the only narrow-channel full-resolution tensor the
    packed path ever materializes — same as the unpacked path's own
    output); with ``emit_packed`` the d2s is skipped and the (B, H/2, W/2,
    4*classes) packed logits are returned for a packed-domain loss
    (``ops.losses.dice_loss_packed``). Variable tree identical to
    :class:`SegmentationHead`."""

    classes: int
    in_ch: int
    emit_packed: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        kernel, bias = _ConvParams(
            self.classes, self.in_ch, kernel_init=_head_conv_init, use_bias=True,
            name="conv",
        )()
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype),
            s2d.pack_conv3x3_kernel(kernel).astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + s2d.tile_params(bias).astype(y.dtype)
        if self.emit_packed:
            return y
        return s2d.depth_to_space(y)


class ContextUnet(nn.Module):
    """Low-magnification branch; returns (masks, context_feats)."""

    arch: str = "resnet18"
    classes: int = 6
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    remat: bool = False
    packed_tail: bool = False
    packed_from: int = _PACKED_FROM
    # With packed_tail: skip the head's final depth-to-space and emit
    # (B, H/2, W/2, 4*classes) packed logits (for dice_loss_packed).
    packed_logits: bool = False

    def setup(self):
        self.encoder = get_encoder(self.arch, dtype=self.dtype, remat=self.remat)
        self.decoder = UnetDecoder(
            decoder_channels=tuple(self.decoder_channels),
            export_block=1,
            packed_tail=self.packed_tail,
            packed_from=self.packed_from,
            dtype=self.dtype,
        )
        if self.packed_tail:
            self.segmentation_head = PackedSegmentationHead(
                self.classes, in_ch=self.decoder_channels[-1],
                emit_packed=self.packed_logits, dtype=self.dtype,
            )
        else:
            self.segmentation_head = SegmentationHead(self.classes, dtype=self.dtype)

    def __call__(self, x, *, train: bool):
        pyramid = self.encoder(x, train=train, features="pyramid")
        decoded, context_feats = self.decoder(pyramid, train=train)
        masks = self.segmentation_head(decoded)
        return masks, context_feats


class TargetUnet(nn.Module):
    """High-magnification branch consuming the context hook."""

    arch: str = "resnet18"
    classes: int = 6
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    remat: bool = False
    packed_tail: bool = False
    packed_from: int = _PACKED_FROM
    # With packed_tail: skip the head's final depth-to-space and emit
    # (B, H/2, W/2, 4*classes) packed logits (for dice_loss_packed).
    packed_logits: bool = False

    def setup(self):
        self.encoder = get_encoder(self.arch, dtype=self.dtype, remat=self.remat)
        self.decoder = UnetDecoder(
            decoder_channels=tuple(self.decoder_channels),
            expect_context=True,
            packed_tail=self.packed_tail,
            packed_from=self.packed_from,
            dtype=self.dtype,
        )
        if self.packed_tail:
            self.segmentation_head = PackedSegmentationHead(
                self.classes, in_ch=self.decoder_channels[-1],
                emit_packed=self.packed_logits, dtype=self.dtype,
            )
        else:
            self.segmentation_head = SegmentationHead(self.classes, dtype=self.dtype)

    def __call__(self, x, context_feats, *, train: bool):
        pyramid = self.encoder(x, train=train, features="pyramid")
        decoded = self.decoder(pyramid, context_feats, train=train)
        return self.segmentation_head(decoded)


class HookNet(nn.Module):
    """``HookNet(x_context, x_target) -> (context_masks, target_masks)``
    (``hooknet.py:251-254``); logits NHWC (B, H, W, classes), classes =
    len(class_names) + 1 with background 0 (``ssl_finetune.py:144``)."""

    arch: str = "resnet18"
    classes: int = 6
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    remat: bool = False
    packed_tail: bool = False
    packed_from: int = _PACKED_FROM
    packed_logits: bool = False

    def setup(self):
        kw = dict(
            arch=self.arch,
            classes=self.classes,
            decoder_channels=tuple(self.decoder_channels),
            dtype=self.dtype,
            remat=self.remat,
            packed_tail=self.packed_tail,
            packed_from=self.packed_from,
            packed_logits=self.packed_logits,
        )
        self.context_branch = ContextUnet(**kw)
        self.target_branch = TargetUnet(**kw)

    def __call__(self, x1, x2, *, train: bool = True):
        context_masks, context_feats = self.context_branch(x1, train=train)
        target_masks = self.target_branch(x2, context_feats, train=train)
        return context_masks, target_masks
