"""MSF-WSI dual-branch multi-resolution SimSiam backbone, in Flax.

Reproduces the exact forward semantics of the reference
(``src/models/backbone.py:129-222``), redesigned for XLA:

  * K = scale^2 target tiles per context tile; n_keep = K*(1-mask_ratio)
    (``backbone.py:54-55``).
  * Context/target encoders are independent multi-scale ResNets emitting
    4 pooled stage features each.
  * Target features are reshaped (B, K, C) and un-shuffled back to spatial
    order with the per-view inverse jigsaw permutation — a sample-local
    gather, so pure batch sharding needs no cross-device collective here
    (``backbone.py:147-158``).
  * Three contrastive paths (context / target / fuser), each a per-scale
    projector->predictor stack with stop-gradient targets (SimSiam,
    ``backbone.py:188-191,214-221``).
  * Fuser input concatenates the context feature with the first ``n_keep``
    *still-shuffled* target features (shuffle + take-first == uniform random
    tile masking) (``backbone.py:193-202``).

All projector/predictor stacks across scales run as plain dense layers; XLA
fuses the per-scale stacks into large MXU matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import get_encoder, torch_linear_bias_init, torch_linear_init

__all__ = ["Projector", "Predictor", "MSFWSI"]


class Projector(nn.Module):
    """3-layer MLP projector: [Linear(no bias)-BN-ReLU] x2 + Linear(no bias)
    + BN(affine=False) — reference ``make_projector`` (``backbone.py:12-22``).

    ``taps``: optional {"fc1","fc2","fc3"} zero arrays added to each Dense
    output; their loss cotangents are exactly the Dense output gradients dY.
    When set, each Dense *input* X is also sow'n into the "fac_inputs"
    collection — together (X, dY) are the outer-product gradient factors the
    fused Adafactor path consumes without materializing dW
    (``train/factored.py``).
    """

    out_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, taps=None):
        def dense(d, name, h):
            if taps is not None:
                self.sow("fac_inputs", f"{name}_in", h)
            y = nn.Dense(
                d,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=torch_linear_init,
                name=name,
            )(h)
            return y if taps is None else y + taps[name]

        bn = lambda name, **kw: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
            **kw,
        )
        in_dim = x.shape[-1]
        x = x.astype(self.dtype)
        x = nn.relu(bn("bn1")(dense(in_dim, "fc1", x)))
        x = nn.relu(bn("bn2")(dense(in_dim, "fc2", x)))
        x = bn("bn3", use_scale=False, use_bias=False)(dense(self.out_dim, "fc3", x))
        return x


class Predictor(nn.Module):
    """2-layer MLP predictor: Linear(no bias)-BN-ReLU + Linear(bias) back to
    the input dim — reference ``make_predictor`` (``backbone.py:25-31``).

    ``taps``: optional {"fc1","fc2"} — see :class:`Projector`."""

    hidden_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, taps=None):
        in_dim = x.shape[-1]
        x = x.astype(self.dtype)
        if taps is not None:
            self.sow("fac_inputs", "fc1_in", x)
        x = nn.Dense(
            self.hidden_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=torch_linear_init,
            name="fc1",
        )(x)
        if taps is not None:
            x = x + taps["fc1"]
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn1",
        )(x)
        x = nn.relu(x)
        if taps is not None:
            self.sow("fac_inputs", "fc2_in", x)
        x = nn.Dense(
            in_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=torch_linear_init,
            # torch derives the bias bound from the layer's INPUT width
            # (here the predictor hidden dim); flax hands bias_init the
            # output shape, which would halve the range.
            bias_init=torch_linear_bias_init(self.hidden_dim),
            name="fc2",
        )(x)
        if taps is not None:
            x = x + taps["fc2"]
        return x


class MSFWSI(nn.Module):
    """Dual-branch multi-resolution SimSiam model.

    Call signature (shapes for scale=4, i.e. K=16):
      x1, x2:           (context (B, 224, 224, 3), target (B*K, 224, 224, 3))
      jigsaw_reverse:   pair of (B, K) inverse permutations, one per view
      returns           dict with keys 'context' / 'target' / 'fuser', each a
                        tuple (p1, p2, z1_sg, z2_sg) of 4-scale tuples.

    ``dim``/``pred_dim`` flags are accepted for CLI parity; like the
    reference, per-scale head widths actually derive from the encoder stage
    dims (projector keeps dim, predictor hidden = dim // 4)
    (``backbone.py:73-101``).
    """

    arch: str = "resnet18"
    scale: int = 4
    dim: int = 2048  # kept for flag parity; unused (see docstring)
    pred_dim: int = 512  # kept for flag parity; unused
    mask_ratio: float = 0.5
    dtype: Any = jnp.float32
    remat: bool = False
    # Storage dtype of the fuser (inter_) head parameters. fp32 matches the
    # reference; bf16 is the single-small-chip option for resnet50-class
    # encoders, where these heads are ~1.6B params: it removes the fp32
    # weights' per-use bf16 casts (which XLA rematerializes repeatedly under
    # HBM pressure) and halves gradient/optimizer HBM traffic. BN params in
    # the heads stay fp32 either way.
    inter_param_dtype: Any = jnp.float32
    # 1-indexed encoder stages to remat when ``remat`` is set (None = all 4).
    remat_stages: Any = None
    # True (reference semantics): target views arrive jigsaw-SHUFFLED and
    # the model un-shuffles their features with the inverse permutation.
    # False (TPU fast path): views arrive in spatial order and the
    # *shuffle* is applied at the feature level instead — the fuser gathers
    # its masked tile subset from the (B, K, C) features, replacing two
    # ~300 MB view-stack permutes per step with tiny feature gathers.
    # Mathematically identical for the same permutation (encoders and all
    # reductions are order-invariant); tested equivalent.
    views_shuffled: bool = True

    @property
    def K(self) -> int:
        return int(self.scale**2)

    @property
    def n_keep(self) -> int:
        return int(self.K * (1 - self.mask_ratio))

    def setup(self):
        enc_kwargs = dict(
            zero_init_residual=True,
            dtype=self.dtype,
            remat=self.remat,
            remat_stages=self.remat_stages,
        )
        self.context_encoder = get_encoder(self.arch, **enc_kwargs)
        self.target_encoder = get_encoder(self.arch, **enc_kwargs)

        inter_dim = self.context_encoder.feature_dims
        ms_inter_dim = tuple(d * (self.n_keep + 1) for d in inter_dim)

        self.context_projector = [Projector(d, dtype=self.dtype, name=f"context_projector_{i}") for i, d in enumerate(inter_dim)]
        self.target_projector = [Projector(d, dtype=self.dtype, name=f"target_projector_{i}") for i, d in enumerate(inter_dim)]
        self.inter_projector = [
            Projector(d, dtype=self.dtype, param_dtype=self.inter_param_dtype, name=f"inter_projector_{i}")
            for i, d in enumerate(ms_inter_dim)
        ]

        self.context_predictor = [Predictor(d // 4, dtype=self.dtype, name=f"context_predictor_{i}") for i, d in enumerate(inter_dim)]
        self.target_predictor = [Predictor(d // 4, dtype=self.dtype, name=f"target_predictor_{i}") for i, d in enumerate(inter_dim)]
        self.inter_predictor = [
            Predictor(d // 4, dtype=self.dtype, param_dtype=self.inter_param_dtype, name=f"inter_predictor_{i}")
            for i, d in enumerate(ms_inter_dim)
        ]

    def encode_context(self, x, *, train: bool):
        return self.context_encoder(x, train=train, features="pooled")

    def encode_target(self, x, *, train: bool):
        return self.target_encoder(x, train=train, features="pooled")

    def __call__(self, x1, x2, jigsaw_reverse_idx, *, train: bool = True, inter_taps=None):
        """``inter_taps``: optional pair (view1, view2) of per-scale tap dicts
        {"proj": {"fc1","fc2","fc3"}, "pred": {"fc1","fc2"}} of zeros, for the
        fused outer-product Adafactor path (``train/factored.py``)."""
        B = x1[0].shape[0]
        K = self.K

        # Encoder features: 4-scale pooled tuples.
        context_f1 = self.encode_context(x1[0], train=train)  # ((B, C_i)) x4
        context_f2 = self.encode_context(x2[0], train=train)
        target_f1 = self.encode_target(x1[1], train=train)  # ((B*K, C_i)) x4
        target_f2 = self.encode_target(x2[1], train=train)

        target_f1_split = tuple(f.reshape(B, K, -1) for f in target_f1)
        target_f2_split = tuple(f.reshape(B, K, -1) for f in target_f2)

        if self.views_shuffled:
            # Un-shuffle target tiles back to spatial order (per-sample
            # gather); the fuser below then uses the still-shuffled features.
            rev1 = jigsaw_reverse_idx[0][:, :, None]
            rev2 = jigsaw_reverse_idx[1][:, :, None]
            target_f1_sort = tuple(
                jnp.take_along_axis(f, rev1, axis=1).reshape(B * K, -1) for f in target_f1_split
            )
            target_f2_sort = tuple(
                jnp.take_along_axis(f, rev2, axis=1).reshape(B * K, -1) for f in target_f2_split
            )
            fuser_f1_split, fuser_f2_split = target_f1_split, target_f2_split
        else:
            # Views are already spatial: the target path needs no gather and
            # the *shuffle* moves to the feature level for the fuser
            # (shuffled[j] == original[argsort(rev)[j]]).
            target_f1_sort = tuple(f.reshape(B * K, -1) for f in target_f1_split)
            target_f2_sort = tuple(f.reshape(B * K, -1) for f in target_f2_split)
            perm1 = jnp.argsort(jigsaw_reverse_idx[0], axis=1)[:, : self.n_keep, None]
            perm2 = jnp.argsort(jigsaw_reverse_idx[1], axis=1)[:, : self.n_keep, None]
            fuser_f1_split = tuple(
                jnp.take_along_axis(f, perm1, axis=1) for f in target_f1_split
            )
            fuser_f2_split = tuple(
                jnp.take_along_axis(f, perm2, axis=1) for f in target_f2_split
            )

        # Context path.
        context_z1 = tuple(p(f, train=train) for p, f in zip(self.context_projector, context_f1))
        context_z2 = tuple(p(f, train=train) for p, f in zip(self.context_projector, context_f2))
        context_p1 = tuple(p(z, train=train) for p, z in zip(self.context_predictor, context_z1))
        context_p2 = tuple(p(z, train=train) for p, z in zip(self.context_predictor, context_z2))

        # Target path (on spatially ordered features).
        target_z1 = tuple(p(f, train=train) for p, f in zip(self.target_projector, target_f1_sort))
        target_z2 = tuple(p(f, train=train) for p, f in zip(self.target_projector, target_f2_sort))
        target_p1 = tuple(p(z, train=train) for p, z in zip(self.target_predictor, target_z1))
        target_p2 = tuple(p(z, train=train) for p, z in zip(self.target_predictor, target_z2))

        # Fuser path: context feature ++ first n_keep *shuffled* target tiles
        # (random masking by virtue of the shuffle).
        ms_f1 = tuple(
            jnp.concatenate((c, t[:, : self.n_keep, :].reshape(B, -1)), axis=1)
            for c, t in zip(context_f1, fuser_f1_split)
        )
        ms_f2 = tuple(
            jnp.concatenate((c, t[:, : self.n_keep, :].reshape(B, -1)), axis=1)
            for c, t in zip(context_f2, fuser_f2_split)
        )
        t1 = t2 = None
        if inter_taps is not None:
            t1, t2 = inter_taps
        ms_z1 = tuple(
            p(f, train=train, taps=None if t1 is None else t1[i]["proj"])
            for i, (p, f) in enumerate(zip(self.inter_projector, ms_f1))
        )
        ms_z2 = tuple(
            p(f, train=train, taps=None if t2 is None else t2[i]["proj"])
            for i, (p, f) in enumerate(zip(self.inter_projector, ms_f2))
        )
        ms_p1 = tuple(
            p(z, train=train, taps=None if t1 is None else t1[i]["pred"])
            for i, (p, z) in enumerate(zip(self.inter_predictor, ms_z1))
        )
        ms_p2 = tuple(
            p(z, train=train, taps=None if t2 is None else t2[i]["pred"])
            for i, (p, z) in enumerate(zip(self.inter_predictor, ms_z2))
        )

        sg = jax.lax.stop_gradient
        return {
            "context": (context_p1, context_p2, sg(context_z1), sg(context_z2)),
            "target": (target_p1, target_p2, sg(target_z1), sg(target_z2)),
            "fuser": (ms_p1, ms_p2, sg(ms_z1), sg(ms_z2)),
        }
