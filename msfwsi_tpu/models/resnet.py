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


class _ConvKernel(nn.Module):
    """Parameter-only stand-in for ``nn.Conv``: declares the identical
    ``kernel`` param (HWIO, kaiming fan-out init) and returns it raw, so the
    fused-BN path below can drive the conv itself (dot / lax.conv) while
    keeping the variable tree bit-identical to the unfused modules."""

    features: int
    in_features: int
    ksize: tuple = (1, 1)

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            kaiming_normal_conv_init,
            (*self.ksize, self.in_features, self.features),
            jnp.float32,
        )


class _BNState(nn.Module):
    """Parameter/state-only BatchNorm for the fused path: same variables as
    :class:`BatchNormNamedStats` (scale/bias params, fp32 running mean/var),
    but the *statistics are supplied* (computed in the conv epilogue) and the
    module returns the BN folded to a per-channel affine ``(2, C) [a; b]``
    (see :func:`msfwsi_tpu.ops.fusedconv.bn_fold`)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones_init()

    @nn.compact
    def __call__(self, C: int, stats=None, n: int = 0, train: bool = False):
        from jax.ad_checkpoint import checkpoint_name

        from ..ops.fusedconv import bn_fold, bn_moments

        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (C,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", jnp.ones, (C,), jnp.float32)
        if train:
            mean, var = bn_moments(stats, n)
            # Same remat tag as BatchNormNamedStats: the (C,)-sized stats are
            # saved under save_only_these_names("bn_stats") policies.
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return bn_fold(mean, var, scale, bias, self.epsilon)


def _dot_bn(x, w2d, dtype, ab=None):
    """1x1 conv as a dot with the *previous* BN folded into an elementwise
    prologue and this conv's BN statistics as a reduce epilogue.

    XLA:TPU fuses elementwise producers and reduce consumers into dot
    fusions (measured at bare-dot speed, ``tools/diag/proto_fusedconv.py``),
    so the prologue normalize and the stat reduction cost zero HBM traffic —
    unlike spatial convolutions, which cannot absorb either, costing ~3
    activation-sized passes per conv+BN in the unfused graph.

    Returns the conv output as ``fp32`` — the *single* ``astype(f32)`` of
    the (bf16-rounded) dot output, shared by the stat reduction here and the
    downstream normalize. Sharing one cast matters for gradients: the BN
    backward is a near-cancellation between the normalize-path and
    stats-path cotangents, and with separate casts each side is rounded to
    bf16 *before* cancelling, leaving rounding noise of the large terms.
    With a shared cast the cancellation accumulates in fp32 at this node.
    (Stats still see the bf16-rounded values — parity with the unfused BN,
    which reads the materialized bf16 activation. The f32 dataflow costs no
    HBM: every consumer fuses, and XLA keeps the stored value bf16.)

    Everything stays 4-D NHWC: the 1x1 conv is ``einsum('bhwc,cd->bhwd')``
    (a dot_general contracting C — no reshape node in the graph). An
    earlier (N, C)-reshape formulation made XLA assign different tiled
    layouts to the conv side and the dot side, materializing ~7 ms physical
    relayout copies around every block (trace: bare ``reshape.NNNN`` ops).
    """
    if ab is not None:
        x = jnp.maximum(x.astype(jnp.float32) * ab[0] + ab[1], 0.0)
    y = jnp.einsum("bhwc,cd->bhwd", x.astype(dtype), w2d.astype(dtype))
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))])
    return yf, stats


def _apply_ab(y, ab, dtype, relu: bool = True):
    out = y.astype(jnp.float32) * ab[0] + ab[1]
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(dtype)


def _stats_of(y):
    yf = y.astype(jnp.float32)
    return jnp.stack([jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))])


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
    fused_bn: bool = False  # accepted for uniformity; 3x3-only blocks gain
    # nothing from dot-fusion (spatial convs can't absorb BN neighbors)

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
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fused_bn and self.groups == 1:
            return self._fused_call(x, train)
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

    def _fused_call(self, x, train: bool):
        """Raw+stats dataflow: 1x1 convs as 4-D einsum-dots with BN folded
        into fused prologues/epilogues; the 3x3 stays ``lax.conv`` (spatial
        convs can't absorb elementwise/reduce neighbors) with one explicit
        normalize pass. Everything remains NHWC — no reshape nodes (a 2-D
        formulation cost ~7 ms/relayout around every block). Variable tree
        and numerics match the unfused path (same param holders; stats
        differ only by summation order)."""
        import jax

        B, H, W, Cin = x.shape
        N = B * H * W
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        Cout = self.planes * self.expansion
        dtype = self.dtype
        # Honor the block's norm configuration: the unfused path routes
        # bn_momentum/bn_epsilon through the `norm` partial, so the fused
        # twin must read them from the same place or its running-stat
        # trajectories silently diverge from the contract it documents.
        norm_fn = self.norm.func if isinstance(self.norm, functools.partial) else self.norm
        if norm_fn not in (nn.BatchNorm, BatchNormNamedStats):
            raise ValueError(
                f"fused_bn supports BatchNorm-family norms only, got {norm_fn}"
            )
        norm_kw = self.norm.keywords if isinstance(self.norm, functools.partial) else {}
        BNS = functools.partial(
            _BNState,
            momentum=norm_kw.get("momentum", 0.9),
            epsilon=norm_kw.get("epsilon", 1e-5),
        )
        bn_kw = dict(train=train)

        k1 = _ConvKernel(width, Cin, (1, 1), name="conv1")()
        y1, st1 = _dot_bn(x, k1.reshape(Cin, width), dtype)
        ab1 = BNS(name="bn1")(width, st1, N, **bn_kw)

        xh1 = _apply_ab(y1, ab1, dtype)
        k2 = _ConvKernel(width, width, (3, 3), name="conv2")()
        y2 = jax.lax.conv_general_dilated(
            xh1,
            k2.astype(dtype),
            window_strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        H2, W2 = y2.shape[1], y2.shape[2]
        N2 = B * H2 * W2
        # Single shared f32 cast of the bf16 conv output (see _dot_bn).
        y2 = y2.astype(jnp.float32)
        ab2 = BNS(name="bn2")(width, _stats_of(y2), N2, **bn_kw)

        k3 = _ConvKernel(Cout, width, (1, 1), name="conv3")()
        y3, st3 = _dot_bn(y2, k3.reshape(width, Cout), dtype, ab=ab2)
        ab3 = BNS(
            name="bn3",
            scale_init=nn.initializers.zeros_init()
            if self.zero_init_residual
            else nn.initializers.ones_init(),
        )(Cout, st3, N2, **bn_kw)

        out = y3 * ab3[0] + ab3[1]
        if self.use_projection:
            kd = _ConvKernel(Cout, Cin, (1, 1), name="downsample_conv")()
            xd = x[:, :: self.strides, :: self.strides, :] if self.strides > 1 else x
            yd, std = _dot_bn(xd, kd.reshape(Cin, Cout), dtype)
            abd = BNS(name="downsample_bn")(Cout, std, N2, **bn_kw)
            out = out + yd * abd[0] + abd[1]
        else:
            out = out + x.astype(jnp.float32)
        return jnp.maximum(out, 0.0).astype(dtype)


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
    # Fused conv+BN dataflow for Bottleneck blocks (1x1 convs as dots with
    # the BN normalize/stats fused into the dot prologue/epilogue) — cuts
    # ~6 full-activation HBM passes per block. Same params and (reduction-
    # order-tolerance) numerics as the unfused path; no effect on BasicBlock.
    fused_bn: bool = False

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
                    fused_bn=self.fused_bn,
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
