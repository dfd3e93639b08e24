"""Multi-scale ResNet encoders in Flax (NHWC, TPU-native).

Capability parity with the reference's vendored torchvision ResNet
(``src/models/resnet.py``), whose one modification is ``return_features``:
pooled features from all 4 stages ``(x1_n, x2_n, x3_n, x4_n)`` instead of the
classifier head (``resnet.py:244-256``). This rebuild additionally exposes the
5-level feature pyramid needed by the HookNet U-Net decoders (the reference
gets that from ``segmentation_models_pytorch``'s resnet encoder).

TPU-first choices:
  * NHWC layout — XLA:TPU's native conv layout; keeps MXU tiling clean.
  * ``dtype`` (compute) vs fp32 ``param_dtype``; BatchNorm statistics always
    accumulate in fp32 (flax promotes half-precision stats).
  * Stage dims derived from the block expansion, fixing the reference's
    hardcoded ``[64,128,256,512]`` (``src/models/backbone.py:67``) so
    Bottleneck archs (resnet50+) work.
  * Optional ``nn.remat`` activation checkpointing per stage (the TPU
    equivalent of ``--use-ac``'s per-conv checkpoint wrapping).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ResNet",
    "get_encoder",
    "ARCH_SPECS",
    "feature_dims",
    "kaiming_normal_conv_init",
    "BatchNormNamedStats",
]

ModuleDef = Any

# torch nn.init.kaiming_normal_(mode="fan_out", nonlinearity="relu"):
# normal with std = sqrt(2 / fan_out).
kaiming_normal_conv_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Flax kernels are (fan_in, fan_out); torch's kaiming_uniform(a=sqrt(5))
    reduces to exactly this bound. For KERNELS only — flax calls bias_init
    with shape (fan_out,), where this would derive the bound from the wrong
    dimension; use :func:`torch_linear_bias_init` for biases.
    """
    import jax

    fan_in = shape[0]
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    """torch nn.Linear default BIAS init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    with fan_in = the layer's *input* width. Flax hands bias_init the bias
    shape (fan_out,), so the bound must be closed over explicitly."""
    import jax

    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class BatchNormNamedStats(nn.Module):
    """BatchNorm with flax ``nn.BatchNorm`` semantics whose batch statistics
    are tagged with ``jax.ad_checkpoint.checkpoint_name("bn_stats")``.

    Why: under per-block remat, the backward pass recomputes the block's
    forward — including the BN statistic reductions, which are full
    re-reads of every activation from HBM (measured ~90 ms/step of the
    resnet50 fused step, 2.3x the conv time). The stats themselves are only
    (C,)-sized, so the remat policy ``save_only_these_names("bn_stats")``
    keeps them and skips the backward re-reduction at zero memory cost.

    Numerics match ``nn.BatchNorm(force_float32_reductions=True)``: stats
    accumulate in fp32 (mean / mean-of-squares), normalization arithmetic
    runs in ``dtype``, running stats update as ``m*ra + (1-m)*batch``.
    """

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    use_scale: bool = True
    scale_init: Any = nn.initializers.ones_init()
    bias_init: Any = nn.initializers.zeros_init()
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        import jax
        from jax.ad_checkpoint import checkpoint_name

        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        C = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (C,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", jnp.ones, (C,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            if self.axis_name is not None:
                mean, mean2 = jax.lax.pmean((mean, mean2), axis_name=self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        dtype = self.dtype or jnp.result_type(x, mean, var)
        y = x.astype(dtype) - mean.astype(dtype)
        mul = jax.lax.rsqrt(var.astype(dtype) + jnp.asarray(self.epsilon, dtype))
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (C,), self.param_dtype)
            mul = mul * scale.astype(dtype)
        y = y * mul
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (C,), self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (expansion 1)."""

    expansion = 1

    planes: int
    strides: int = 1
    use_projection: bool = False
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal_conv_init,
        )
        bn = functools.partial(self.norm, use_running_average=not train)

        identity = x
        out = conv(self.planes, (3, 3), strides=self.strides, padding=1, name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1, name="conv2")(out)
        out = bn(
            name="bn2",
            scale_init=nn.initializers.zeros_init()
            if self.zero_init_residual
            else nn.initializers.ones_init(),
        )(out)
        if self.use_projection:
            identity = conv(self.planes, (1, 1), strides=self.strides, name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (expansion 4); stride on the 3x3 conv."""

    expansion = 4

    planes: int
    strides: int = 1
    use_projection: bool = False
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal_conv_init,
        )
        bn = functools.partial(self.norm, use_running_average=not train)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        identity = x
        out = conv(width, (1, 1), name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(
            width,
            (3, 3),
            strides=self.strides,
            padding=1,
            feature_group_count=self.groups,
            name="conv2",
        )(out)
        out = bn(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, (1, 1), name="conv3")(out)
        out = bn(
            name="bn3",
            scale_init=nn.initializers.zeros_init()
            if self.zero_init_residual
            else nn.initializers.ones_init(),
        )(out)
        if self.use_projection:
            identity = conv(
                self.planes * self.expansion, (1, 1), strides=self.strides, name="downsample_conv"
            )(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)

class ResNet(nn.Module):
    """NHWC ResNet with multi-scale outputs.

    ``__call__(x, train=..., features=...)`` where ``features`` selects:
      * ``"pooled"``  -> 4-tuple of stage-wise global-average-pooled (B, C_i)
        features — the reference's ``return_features=True`` path with
        ``fc = Identity`` (``resnet.py:244-256``, ``backbone.py:64-65``).
      * ``"pyramid"`` -> 5-tuple of NHWC maps [stem/2, layer1/4, layer2/8,
        layer3/16, layer4/32] — the smp-style U-Net encoder contract
        (HookNet consumes these; ``src/models/hooknet.py:16-21``).
      * ``"logits"``  -> (B, num_classes) classifier output.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef = BasicBlock
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9  # == torch momentum 0.1
    bn_epsilon: float = 1e-5
    remat: bool = False  # activation checkpointing per residual block
    remat_stages: Sequence[int] | None = None  # 1-indexed stages to remat (None = all)

    @property
    def feature_dims(self) -> tuple[int, int, int, int]:
        e = self.block_cls.expansion
        return (64 * e, 128 * e, 256 * e, 512 * e)

    @property
    def pyramid_dims(self) -> tuple[int, int, int, int, int]:
        e = self.block_cls.expansion
        return (64, 64 * e, 128 * e, 256 * e, 512 * e)

    @nn.compact
    def __call__(self, x, *, train: bool = False, features: str = "pooled"):
        norm = functools.partial(
            BatchNormNamedStats,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=None,  # GSPMD: global batch stats come from sharded jnp.mean
        )
        # static_argnums=(2,): `train` is a Python bool steering BatchNorm
        # mode — it must stay static through the remat boundary. The policy
        # saves the (C,)-sized BN statistics so the backward recompute skips
        # the full-activation stat reductions (see BatchNormNamedStats).
        if self.remat:
            import jax

            remat_block_cls = nn.remat(
                self.block_cls,
                static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names("bn_stats"),
            )
        else:
            remat_block_cls = self.block_cls

        def stage_block_cls(stage_idx: int):
            """Deep stages have small activations but most of the FLOPs —
            ``remat_stages`` limits checkpointing to the listed (1-indexed)
            stages so e.g. stages 3-4 keep their activations and skip the
            backward recompute entirely."""
            if not self.remat:
                return self.block_cls
            if self.remat_stages is not None and (stage_idx + 1) not in self.remat_stages:
                return self.block_cls
            return remat_block_cls

        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=2,
            padding=3,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal_conv_init,
            name="conv1",
        )(x)
        x = norm(use_running_average=not train, name="bn1")(x)
        stem = nn.relu(x)  # /2, 64ch — pyramid level 0

        x = nn.max_pool(stem, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stage_outs = []
        for i, num_blocks in enumerate(self.stage_sizes):
            planes = 64 * 2**i
            for j in range(num_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                needs_proj = j == 0 and (
                    strides != 1 or x.shape[-1] != planes * self.block_cls.expansion
                )
                x = stage_block_cls(i)(
                    planes=planes,
                    strides=strides,
                    use_projection=needs_proj,
                    zero_init_residual=self.zero_init_residual,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    dtype=self.dtype,
                    norm=norm,
                    name=f"layer{i + 1}_{j}",
                )(x, train)
            stage_outs.append(x)

        if features == "pyramid":
            return (stem, *stage_outs)

        pooled = tuple(jnp.mean(s, axis=(1, 2)) for s in stage_outs)
        if features == "pooled":
            return pooled

        if features == "logits":
            return nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=torch_linear_init,
                bias_init=torch_linear_bias_init(pooled[-1].shape[-1]),
                name="fc",
            )(pooled[-1])

        raise ValueError(f"unknown features mode: {features!r}")


# arch -> (block, stage_sizes, extra kwargs); mirrors the reference factory
# surface (``src/models/resnet.py:278-388``).
ARCH_SPECS: dict[str, tuple[ModuleDef, tuple[int, ...], dict]] = {
    # resnet10 is beyond the torchvision family (no ImageNet URL): one
    # BasicBlock per stage — the smallest encoder with the full 4-stage /
    # 5-level pyramid contract. Used for small research configs and to
    # halve whole-model compile time in the test suite.
    "resnet10": (BasicBlock, (1, 1, 1, 1), {}),
    "resnet18": (BasicBlock, (2, 2, 2, 2), {}),
    "resnet34": (BasicBlock, (3, 4, 6, 3), {}),
    "resnet50": (Bottleneck, (3, 4, 6, 3), {}),
    "resnet101": (Bottleneck, (3, 4, 23, 3), {}),
    "resnet152": (Bottleneck, (3, 8, 36, 3), {}),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), {"groups": 32, "width_per_group": 4}),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), {"groups": 32, "width_per_group": 8}),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), {"width_per_group": 128}),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), {"width_per_group": 128}),
}


def feature_dims(arch: str) -> tuple[int, int, int, int]:
    """Per-stage pooled feature dims for ``arch`` (expansion-aware — fixes
    the reference's BasicBlock-only hardcode at ``backbone.py:67``)."""
    block_cls, _, _ = ARCH_SPECS[arch]
    e = block_cls.expansion
    return (64 * e, 128 * e, 256 * e, 512 * e)


def get_encoder(arch: str, **kwargs) -> ResNet:
    """Factory mirroring ``resnet.__dict__[arch]`` lookup (``ssl_train.py:146``)."""
    if arch not in ARCH_SPECS:
        raise ValueError(f"unknown arch {arch!r}; choose from {sorted(ARCH_SPECS)}")
    block_cls, stage_sizes, extra = ARCH_SPECS[arch]
    return ResNet(stage_sizes=stage_sizes, block_cls=block_cls, **{**extra, **kwargs})
