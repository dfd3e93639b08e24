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

import jax.numpy as jnp
from flax import linen as nn

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


class UnetDecoder(nn.Module):
    """U-Net decoder over a 5-level pyramid with optional HookNet coupling.

    ``export_block``: emit the center H/4 crop of that block's output (the
    context branch's hook source, block 1). ``context_channels > 0``: expect
    ``context_feats`` concatenated onto the encoder head (target branch).
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    export_block: int | None = None
    expect_context: bool = False
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

        exported = None
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(out_ch, dtype=self.dtype, name=f"block{i}")(
                x, skip, train=train
            )
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


class ContextUnet(nn.Module):
    """Low-magnification branch; returns (masks, context_feats)."""

    arch: str = "resnet18"
    classes: int = 6
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        self.encoder = get_encoder(self.arch, dtype=self.dtype, remat=self.remat)
        self.decoder = UnetDecoder(
            decoder_channels=tuple(self.decoder_channels),
            export_block=1,
            dtype=self.dtype,
        )
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

    def setup(self):
        self.encoder = get_encoder(self.arch, dtype=self.dtype, remat=self.remat)
        self.decoder = UnetDecoder(
            decoder_channels=tuple(self.decoder_channels),
            expect_context=True,
            dtype=self.dtype,
        )
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

    def setup(self):
        kw = dict(
            arch=self.arch,
            classes=self.classes,
            decoder_channels=tuple(self.decoder_channels),
            dtype=self.dtype,
            remat=self.remat,
        )
        self.context_branch = ContextUnet(**kw)
        self.target_branch = TargetUnet(**kw)

    def __call__(self, x1, x2, *, train: bool = True):
        context_masks, context_feats = self.context_branch(x1, train=train)
        target_masks = self.target_branch(x2, context_feats, train=train)
        return context_masks, target_masks
