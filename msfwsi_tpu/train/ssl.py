"""SSL pre-training: jitted train step, optimizer, and state.

Capability parity with the reference's pretrain driver
(``tools/ssl_train.py:281-309,408-486``) redesigned for XLA:

  * Loss: symmetric negative cosine over the three contrastive paths and four
    scales with ``fuser_weights`` (``ssl_train.py:448-466``).
  * Optimizer: Adam with three learning-rate groups keyed on the
    ``context_/target_/inter_`` parameter prefixes and the sqrt-batch lr
    scaling ``lr*sqrt(B)/sqrt(32)`` (``ssl_train.py:155,301-309``). The
    reference parses ``--wd`` but never passes it to Adam
    (``ssl_train.py:551,309``) — reproduced faithfully (no weight decay).
  * Mixed precision: bf16 compute dtype end-to-end on TPU, fp32 params and
    loss; no GradScaler needed (bf16 has fp32's exponent range).
  * One jit'd step == forward + backward + Adam + BN stat update; under a
    batch-sharded Mesh, XLA inserts the gradient/BN psum over ICI (the DDP
    and SyncBN collectives, ``ssl_train.py:160,170``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.backbone import MSFWSI
from ..ops.losses import msfwsi_loss

__all__ = ["SSLConfig", "SSLTrainState", "create_ssl_state", "ssl_train_step", "make_ssl_optimizer"]


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    """Pretrain hyperparameters; defaults mirror the reference argparse
    (``ssl_train.py:544-628``)."""

    arch: str = "resnet18"
    batch_size: int = 32  # global batch
    lr: float = 1e-3
    epochs: int = 300
    dim: int = 2048
    pred_dim: int = 512
    mask_ratio: int = 50  # percent, as the reference flag
    scale: int = 4
    ms_lr: Sequence[float] = (1.0, 1.0, 1.0)
    fuser_weights: Sequence[float] = (0.1, 0.4, 0.7, 1.0)
    seed: int = 3407
    img_size: int = 224
    amp: bool = True  # bf16 compute
    use_ac: bool = False  # activation checkpointing (remat)
    # Optimizer for the inter_ (fuser) head group. "adam" matches the
    # reference (``ssl_train.py:301-309``). "adafactor" stores a factored
    # second moment instead of Adam's dense m/v — for resnet50-class
    # encoders the fuser heads are ~1.6B params (three d^2 matrices at
    # d=2048*(n_keep+1)=18432 for the last stage), so dense Adam state
    # alone exceeds a 16 GB v5e; factored state makes single-small-chip
    # training possible. On large-HBM chips (v5p) or under the fuser-head
    # TP sharding (parallel/tp.py) "adam" remains the default.
    # "fused_adafactor" = same adafactor math, but the big head kernels'
    # updates are computed directly from the (X, dY) outer-product factors
    # without ever materializing the dense gradient in HBM — see
    # train/factored.py. Numerics match "adafactor" to reassociation
    # tolerance; several HBM passes over ~GB gradients cheaper per step.
    inter_opt: str = "adam"
    # Storage dtype of the fuser-head params ("float32" | "bfloat16") — see
    # models/backbone.MSFWSI.inter_param_dtype. bf16 pairs with
    # inter_opt="adafactor" for single-small-chip resnet50 training.
    inter_dtype: str = "float32"
    # With use_ac: 1-indexed encoder stages to checkpoint (empty/None = all).
    # E.g. (1, 2) keeps the FLOP-heavy small-activation stages 3-4 stored.
    remat_stages: Sequence[int] | None = None
    # Gradient accumulation: split each global batch into this many
    # sequential microbatches inside the jitted step; gradients are
    # averaged and Adam applied once per global batch. Beyond-parity
    # capability (the reference has no accumulation): it makes the
    # published global batch sizes reachable on small-HBM chips — e.g.
    # resnet50 at the recipes' b32 does not fit on one 16 GB v5e in any
    # single-pass config (BASELINE.md), but fits with accum_steps=2.
    # Deviation from a single-pass step, documented: BatchNorm batch
    # statistics are computed per microbatch (and the running stats see
    # accum_steps momentum updates per global step) — the same semantics
    # a torch user gets when accumulating, and the per-shard analog of
    # non-sync BN. Optimizer math is otherwise exact: the averaged
    # microbatch gradient equals the global-batch gradient of the
    # mean loss given each microbatch's own BN statistics.
    accum_steps: int = 1
    # False (default, TPU fast path): target views stay in spatial order and
    # the jigsaw shuffle is applied at the feature level inside the model —
    # mathematically identical, saves two ~300 MB view permutes per step
    # (see models/backbone.MSFWSI.views_shuffled). True restores the
    # reference's shuffled-view-stack data contract.
    shuffle_views: bool = False

    @property
    def init_lr(self) -> float:
        # ssl_train.py:155 — sqrt-batch scaling against base batch 32.
        return self.lr * (self.batch_size**0.5) / (32**0.5)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.amp else jnp.float32

    def build_model(self) -> MSFWSI:
        return MSFWSI(
            arch=self.arch,
            scale=self.scale,
            dim=self.dim,
            pred_dim=self.pred_dim,
            mask_ratio=self.mask_ratio / 100,
            dtype=self.dtype,
            remat=self.use_ac,
            remat_stages=tuple(self.remat_stages) if self.remat_stages else None,
            inter_param_dtype=jnp.bfloat16 if self.inter_dtype == "bfloat16" else jnp.float32,
            views_shuffled=self.shuffle_views,
        )


class SSLTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    model: MSFWSI = struct.field(pytree_node=False)


def _param_group(path, leaf=None, factored_kernels: bool = False) -> str:
    """Label a parameter by its top-level module prefix — the reference's
    name-prefix partition (``ssl_train.py:281-300``). With
    ``factored_kernels``, the big inter-head Dense kernels are split into
    their own "inter_fac" group (fused outer-product Adafactor path)."""
    top = path[0] if isinstance(path[0], str) else path[0].key
    if top.startswith("context_"):
        return "context"
    if top.startswith("target_"):
        return "target"
    if top.startswith("inter_"):
        from .factored import is_factored_kernel

        if factored_kernels and is_factored_kernel(path, leaf):
            return "inter_fac"
        return "inter"
    raise ValueError(f"parameter {path} not in any optimizer group")


def make_ssl_optimizer(config: SSLConfig) -> optax.GradientTransformation:
    init_lr = config.init_lr
    groups = {
        name: optax.adam(init_lr * m, b1=0.9, b2=0.999, eps=1e-8)
        for name, m in zip(("context", "target", "inter"), config.ms_lr)
    }
    factored_kernels = config.inter_opt == "fused_adafactor"
    if config.inter_opt in ("adafactor", "fused_adafactor"):
        # Factored second moment, no first moment: O(rows+cols) state for
        # the d^2 fuser matrices instead of O(2*d^2). See SSLConfig.inter_opt.
        # Gradients are cast to f32 first so the factored statistics and the
        # update math stay full-precision even with bf16-stored head params
        # (optax.apply_updates then casts the update back to the param dtype).
        cast_f32 = optax.stateless(lambda updates, params: jax.tree.map(
            lambda g: g.astype(jnp.float32), updates
        ))
        groups["inter"] = optax.chain(
            cast_f32,
            optax.adafactor(
                learning_rate=init_lr * config.ms_lr[2],
                multiply_by_parameter_scale=False,
                clipping_threshold=None,
                eps=1e-8,
            ),
        )
        if factored_kernels:
            from .factored import fused_outer_adafactor

            groups["inter_fac"] = fused_outer_adafactor(
                learning_rate=init_lr * config.ms_lr[2], eps=1e-8
            )
    elif config.inter_opt != "adam":
        raise ValueError(f"unknown inter_opt {config.inter_opt!r}")

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: _param_group(path, leaf, factored_kernels), params
        )

    return optax.multi_transform(groups, label_fn)


def target_keys(views_shuffled: bool) -> tuple:
    """Batch keys for the two target view stacks. The jigsaw mode is encoded
    in the *pytree structure* (key names) so that pairing a view pipeline
    with a model in the other mode raises instead of silently training on
    scrambled target features: ``target{1,2}`` hold physically shuffled
    stacks (the reference contract, ``views_shuffled=True``),
    ``target{1,2}_spatial`` hold spatial-order stacks for the
    feature-level-jigsaw fast path. ``rev{1,2}`` are the inverse jigsaw
    permutations in BOTH modes (the model derives the forward permutation
    itself in the fast path)."""
    return ("target1", "target2") if views_shuffled else ("target1_spatial", "target2_spatial")


def batch_views(batch, views_shuffled: bool):
    """Extract ``(x1, x2, revs)`` model-apply arguments from a batch dict,
    enforcing the jigsaw-mode contract (see :func:`target_keys`)."""
    t1, t2 = target_keys(views_shuffled)
    if t1 not in batch:
        have = [k for k in batch if k.startswith("target")]
        raise ValueError(
            f"batch/model jigsaw-mode mismatch: the model has "
            f"views_shuffled={views_shuffled} (wants batch key {t1!r}) but the "
            f"batch carries {have}. Build views with make_ssl_views(..., "
            f"shuffle_views={views_shuffled}) — SSLConfig wires both sides "
            f"from its shuffle_views field."
        )
    return (
        (batch["context1"], batch[t1]),
        (batch["context2"], batch[t2]),
        (batch["rev1"], batch["rev2"]),
    )


def make_example_batch(config: SSLConfig, local_batch: int | None = None):
    """Shape-correct zero batch (for init / compile checks)."""
    B = local_batch or config.batch_size
    K = config.scale**2
    S = config.img_size
    img = jnp.zeros((B, S, S, 3), jnp.float32)
    tgt = jnp.zeros((B * K, S, S, 3), jnp.float32)
    rev = jnp.tile(jnp.arange(K)[None], (B, 1))
    t1, t2 = target_keys(config.shuffle_views)
    return {
        "context1": img,
        "context2": img,
        t1: tgt,
        t2: tgt,
        "rev1": rev,
        "rev2": rev,
    }


def create_ssl_state(rng, config: SSLConfig, example_batch=None) -> SSLTrainState:
    model = config.build_model()
    batch = example_batch or make_example_batch(config, local_batch=2)
    x1, x2, revs = batch_views(batch, model.views_shuffled)
    variables = model.init(rng, x1, x2, revs, train=False)
    tx = make_ssl_optimizer(config)
    params = variables["params"]
    return SSLTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        tx=tx,
        model=model,
    )


def ssl_loss_fn(model, params, batch_stats, batch, fuser_weights, inter_taps=None):
    x1, x2, revs = batch_views(batch, model.views_shuffled)
    mutable = ["batch_stats"] if inter_taps is None else ["batch_stats", "fac_inputs"]
    outputs, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x1,
        x2,
        revs,
        train=True,
        inter_taps=inter_taps,
        mutable=mutable,
    )
    total, per_path = msfwsi_loss(outputs, fuser_weights)
    return total, (per_path, mutated["batch_stats"], mutated.get("fac_inputs"))


def make_zero_taps(model: MSFWSI, local_batch: int, dtype):
    """Zero tap pair for the fused-Adafactor gradient-factor extraction —
    shapes follow the inter-head Dense outputs (see MSFWSI.__call__)."""
    from ..models.resnet import feature_dims

    dims = tuple(d * (model.n_keep + 1) for d in feature_dims(model.arch))
    B = local_batch

    def one_view():
        return tuple(
            {
                "proj": {
                    "fc1": jnp.zeros((B, d), dtype),
                    "fc2": jnp.zeros((B, d), dtype),
                    "fc3": jnp.zeros((B, d), dtype),
                },
                "pred": {
                    "fc1": jnp.zeros((B, d // 4), dtype),
                    "fc2": jnp.zeros((B, d), dtype),
                },
            }
            for d in dims
        )

    return (one_view(), one_view())


def _assemble_fac_sides(fac_inputs, tap_grads):
    """{params-path string: (X (2B, d_in), dY (2B, d_out))} for every tapped
    inter-head Dense — both SimSiam views concatenated (each head module runs
    twice per step, so dW = X^T dY over the concatenation)."""
    g1, g2 = tap_grads
    sides = {}
    for i in range(len(g1)):
        for mod, short in (("inter_projector", "proj"), ("inter_predictor", "pred")):
            for fc in g1[i][short]:
                xs = fac_inputs[f"{mod}_{i}"][f"{fc}_in"]
                x = jnp.concatenate(xs, axis=0)
                dy = jnp.concatenate((g1[i][short][fc], g2[i][short][fc]), axis=0)
                sides[f"{mod}_{i}/{fc}"] = (x, dy)
    return sides


def _ssl_grad_once(state, batch_stats, batch, fuser_weights, factored):
    """Loss + gradients of one (micro)batch against the given BN stats.
    Returns ``(loss, per_path, new_stats, grads, fac_sides)`` where
    ``fac_sides`` is None unless ``factored``."""
    if factored:
        B = batch["context1"].shape[0]
        taps = make_zero_taps(state.model, B, state.model.dtype)
        grad_fn = jax.value_and_grad(
            lambda p, t: ssl_loss_fn(
                state.model, p, batch_stats, batch, fuser_weights, inter_taps=t
            ),
            argnums=(0, 1),
            has_aux=True,
        )
        (loss, (per_path, new_stats, fac_inputs)), (grads, tap_grads) = grad_fn(
            state.params, taps
        )
        return loss, per_path, new_stats, grads, _assemble_fac_sides(fac_inputs, tap_grads)
    grad_fn = jax.value_and_grad(
        lambda p: ssl_loss_fn(state.model, p, batch_stats, batch, fuser_weights),
        has_aux=True,
    )
    (loss, (per_path, new_stats, _)), grads = grad_fn(state.params)
    return loss, per_path, new_stats, grads, None


def slice_microbatch(batch, accum_steps: int, i: int):
    """The i-th of ``accum_steps`` microbatches: the samples whose global
    sample index satisfies ``index % accum_steps == i``, for every array in
    ``batch`` (a pytree; leading axes are B or sample-major B*K — the
    per-sample factor is inferred as ``shape[0] // min(shape[0])``).

    The interleaved partition (vs contiguous B/accum blocks) is what keeps
    the slices LOCAL under a "data"-sharded batch: every device's
    contiguous shard contributes shard/accum samples to each microbatch,
    so the slice lowers to a reshape + static index with no cross-device
    movement. A contiguous half-batch would live on half the mesh and
    GSPMD rebalances it with collective-permutes every microbatch
    (measured: 57 collective-permutes in the accum=2 fused SSL step on an
    8-device mesh with contiguous slices, 0 interleaved). Microbatch
    composition is an implementation detail — samples are iid draws from
    the loader — but it is part of the step's numeric contract, so the
    tests' oracles build microbatches with this same function. Local
    slicing additionally needs ``accum_steps`` to divide the per-device
    shard; GSPMD still compiles (with movement) when it does not."""
    B = min(a.shape[0] for a in jax.tree.leaves(batch))

    def sl(a):
        m = a.shape[0] // B
        rest = a.shape[1:]
        out = a.reshape(B // accum_steps, accum_steps, m, *rest)[:, i]
        return out.reshape((B // accum_steps) * m, *rest)

    return jax.tree.map(sl, batch)


def _zero_factored_grads(grads):
    """Replace the factored inter-head kernels' dense gradients with zeros.
    Under accumulation the dense dW autodiff dots would otherwise become
    live through the accumulator sum; zeroing keeps them dead code (the
    fused optimizer reads only the (X, dY) factors)."""
    from .factored import is_factored_kernel

    return jax.tree_util.tree_map_with_path(
        lambda path, g: jnp.zeros_like(g) if is_factored_kernel(path, g) else g, grads
    )


def ssl_train_step(
    state: SSLTrainState,
    batch,
    fuser_weights: Sequence[float],
    factored: bool = False,
    accum_steps: int = 1,
    microbatch_fn=None,
):
    """One SGD step. Pure function of (state, batch) — jit it once with
    ``fuser_weights`` closed over (they are static per run). ``factored``
    (inter_opt="fused_adafactor") additionally differentiates w.r.t. zero
    output-taps on the inter-head Dense layers and hands the (X, dY)
    gradient factors to the optimizer, whose big-kernel updates then never
    materialize dense gradients (train/factored.py); the unused autodiff
    dW dots are dead code XLA eliminates.

    ``accum_steps > 1`` runs that many sequential microbatches (interleaved
    sample partitions of ``batch``, or ``microbatch_fn(i)`` if given —
    the fused aug path uses it to build each microbatch's views on the
    fly instead of materializing the full-batch views up front) and
    applies one optimizer update on the averaged gradient — see
    :class:`SSLConfig.accum_steps` for the BN semantics. The unrolled
    chain reuses one microbatch's activation footprint (each iteration
    depends on the previous accumulator)."""
    extra = {}
    if accum_steps == 1:
        loss, per_path, new_stats, grads, sides = _ssl_grad_once(
            state, state.batch_stats, batch, fuser_weights, factored
        )
        if factored:
            extra["fac_sides"] = sides
    else:
        if microbatch_fn is None:
            if batch["context1"].shape[0] % accum_steps:
                raise ValueError(
                    f"batch size {batch['context1'].shape[0]} not divisible by "
                    f"accum_steps {accum_steps}"
                )
            microbatch_fn = lambda i: slice_microbatch(batch, accum_steps, i)
        new_stats = state.batch_stats
        grads_sum = None
        loss_sum = 0.0
        per_path_sum = None
        sides_parts = []
        for i in range(accum_steps):
            mb = microbatch_fn(i)
            if grads_sum is not None:
                # Serialize the microbatches: tie this microbatch's inputs
                # to the previous accumulator. Without the barrier nothing
                # orders the two forwards (the accumulator add is the only
                # join), XLA schedules them concurrently, and peak HBM
                # approaches the unaccumulated step's — measured as an OOM
                # at r50 b32 accum=2 that this barrier resolves. In
                # factored mode the gate deliberately EXCLUDES the inter_
                # grads (the zeroed dense head placeholders must stay dead
                # — a barrier operand is materialized, and r50's are ~6 GB)
                # and uses the factor sides to order the head backward
                # instead; only the returned mb is kept, the gate values
                # pass through unchanged.
                gate = (
                    {
                        k: v
                        for k, v in grads_sum.items()
                        if not str(k).startswith("inter_")
                    }
                    if factored
                    else grads_sum,
                    sides_parts[-1] if factored else (),
                )
                mb, _ = jax.lax.optimization_barrier((mb, gate))
            loss_i, per_path_i, new_stats, grads_i, sides_i = _ssl_grad_once(
                state, new_stats, mb, fuser_weights, factored
            )
            if factored:
                grads_i = _zero_factored_grads(grads_i)
                sides_parts.append(sides_i)
            grads_sum = (
                grads_i
                if grads_sum is None
                else jax.tree.map(jnp.add, grads_sum, grads_i)
            )
            loss_sum = loss_sum + loss_i
            per_path_sum = (
                per_path_i
                if per_path_sum is None
                else {k: per_path_sum[k] + v for k, v in per_path_i.items()}
            )
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads_sum)
        loss = loss_sum * inv
        per_path = {k: v * inv for k, v in per_path_sum.items()}
        if factored:
            # mean over microbatches of X_i^T dY_i == concat(X)^T concat(dY/accum)
            extra["fac_sides"] = {
                k: (
                    jnp.concatenate([p[k][0] for p in sides_parts], axis=0),
                    jnp.concatenate([p[k][1] for p in sides_parts], axis=0) * inv,
                )
                for k in sides_parts[0]
            }
    updates, new_opt_state = state.tx.update(
        grads, state.opt_state, state.params, **extra
    )
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    metrics = {"loss": loss, **{f"loss_{k}": v for k, v in per_path.items()}}
    return new_state, metrics


def make_jitted_train_step(
    config: SSLConfig, mesh=None, donate: bool = True, model_parallel: bool = False
):
    """Compile the train step. With a mesh: batch sharded over "data",
    state replicated (XLA emits the ICI gradient reduction). With
    ``model_parallel`` the state is expected to be pre-placed (see
    ``parallel.tp.shard_ssl_state`` — fuser weights split over "model");
    shardings are then inferred from the argument placements and XLA
    propagates the TP collectives."""
    fuser_weights = tuple(config.fuser_weights)
    factored = config.inter_opt == "fused_adafactor"
    accum = config.accum_steps

    def step(state, batch):
        return ssl_train_step(
            state, batch, fuser_weights, factored=factored, accum_steps=accum
        )

    kwargs = {}
    if mesh is not None and not model_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, data)
        kwargs["out_shardings"] = (repl, repl)
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step, **kwargs)


def load_imagenet_encoders(state: SSLTrainState, torch_state_dict: dict) -> SSLTrainState:
    """Initialize both branch encoders from a torchvision ImageNet ResNet
    checkpoint — the reference's ``base_encoder(pretrained=True)``
    (``backbone.py:58-63``; it downloads from torch.hub, here the file is
    supplied locally). Heads/projectors keep their random init."""
    from .checkpoint import torch_resnet_to_flax

    enc_params, enc_stats = torch_resnet_to_flax(torch_state_dict, include_fc=False)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for enc in ("context_encoder", "target_encoder"):
        params[enc] = enc_params
        stats[enc] = enc_stats
    return state.replace(
        params=params, batch_stats=stats, opt_state=state.tx.init(params)
    )


def make_jitted_fused_step(
    config: SSLConfig,
    aug_cfg,
    mesh=None,
    donate: bool = True,
    model_parallel: bool = False,
):
    """One jit: on-device augmentation (uint8 tiles -> 4 views + jigsaw) +
    train step. Avoids materializing augmented views in HBM between two
    dispatches and lets XLA overlap aug (VPU) with the encoder (MXU).

    With ``model_parallel`` the state is expected to be pre-placed (fuser
    heads split over "model" via ``parallel.tp.shard_ssl_state``) and the
    uint8 tiles pre-sharded over "data"; shardings are inferred from the
    argument placements, exactly as in :func:`make_jitted_train_step`."""
    from ..data.pipeline import make_ssl_views

    fuser_weights = tuple(config.fuser_weights)
    factored = config.inter_opt == "fused_adafactor"
    accum = config.accum_steps

    def step(state, tiles_u8, key):
        if accum == 1:
            batch = make_ssl_views(
                key, tiles_u8, aug_cfg, shuffle_views=config.shuffle_views
            )
            return ssl_train_step(state, batch, fuser_weights, factored=factored)
        # Accumulation: build each microbatch's views on the fly from its
        # slice of the raw uint8 tiles — the full-batch view stacks (~20x
        # the tile bytes at scale 4) never materialize, so peak HBM under
        # accumulation is one microbatch's, which is the point.
        if tiles_u8.shape[0] % accum:
            raise ValueError(
                f"batch size {tiles_u8.shape[0]} not divisible by accum_steps {accum}"
            )

        def microbatch_fn(i):
            # Interleaved sample partition (see slice_microbatch) — local
            # under a "data"-sharded tile batch.
            t = slice_microbatch(tiles_u8, accum, i)
            return make_ssl_views(
                jax.random.fold_in(key, i), t, aug_cfg,
                shuffle_views=config.shuffle_views,
            )

        return ssl_train_step(
            state, None, fuser_weights, factored=factored,
            accum_steps=accum, microbatch_fn=microbatch_fn,
        )

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        if model_parallel:
            # State shardings come from its placement (fuser heads on
            # "model"); tiles and key are pinned so uncommitted host
            # arrays land correctly.
            kwargs["in_shardings"] = (None, data, repl)
        else:
            kwargs["in_shardings"] = (repl, data, repl)
            kwargs["out_shardings"] = (repl, repl)
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step, **kwargs)
