"""HookNet fine-tuning: state, checkpoint surgery, jitted train step.

Parity with ``tools/ssl_finetune.py``:
  * model: HookNet with ``classes = len(class_names) + 1`` (background 0)
    (``ssl_finetune.py:137-144``);
  * SSL checkpoint surgery: the pretrained ``context_encoder`` /
    ``target_encoder`` (minus fc, which our encoders never materialize for
    pooled features) load into the two branch encoders
    (``ssl_finetune.py:146-172``);
  * loss: ``(1-lam)*Dice(context) + lam*Dice(target)`` over classes 1..C,
    from logits (``ssl_finetune.py:287-288,433-436``), lam default 1;
  * optimizer: Adam, lr scaled ``lr*sqrt(B)/sqrt(64)``
    (``ssl_finetune.py:178,289``);
  * train metrics: per-batch confusion stats of the target argmax with
    background ignored (``ssl_finetune.py:440-447``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.hooknet import HookNet
from ..ops.losses import dice_loss, dice_loss_packed
from ..ops.metrics import get_stats

__all__ = [
    "FinetuneConfig",
    "SegTrainState",
    "create_finetune_state",
    "load_ssl_encoders",
    "finetune_train_step",
    "make_jitted_finetune_step",
    "PAIP_CLASSES",
    "BCSS_CLASSES",
    "C16_CLASSES",
]

# ssl_finetune.py:38-40
PAIP_CLASSES = ["tissue", "whole", "viable"]
BCSS_CLASSES = ["tumor", "stroma", "infla", "necr", "other"]
C16_CLASSES = ["tissue", "tumour"]


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    arch: str = "resnet18"
    class_names: Sequence[str] = tuple(BCSS_CLASSES)
    batch_size: int = 64
    lr: float = 1e-3
    epochs: int = 50
    lam: float = 1.0
    seg_size: int = 256
    amp: bool = True
    use_ac: bool = False
    seed: int = 3407
    # Run the narrow-channel decoder tail in the space-to-depth domain
    # (exact — see ops/s2d.py). Pure TPU layout optimization: avoids the
    # 4-8x 128-lane padding of the C=32/16 full-resolution activations.
    # Variable trees are bit-compatible either way, so checkpoints (and
    # torch interop) are unaffected by the setting.
    packed_tail: bool = False
    # First decoder block index run packed (see models/hooknet._PACKED_FROM).
    packed_from: int = 3
    # With packed_tail: the model emits packed (B, H/2, W/2, 4*classes)
    # logits and the train step computes the Dice loss + argmax metrics in
    # the packed domain (never materializing the lane-padded 256px logits).
    # Only for training states — eval paths expect logical logits.
    packed_logits: bool = False
    # Gradient accumulation: sequential microbatches inside the jitted
    # step, one Adam update on the averaged gradient (see
    # train.ssl.SSLConfig.accum_steps for the BN-statistics semantics).
    accum_steps: int = 1

    @property
    def num_classes(self) -> int:
        return len(self.class_names) + 1  # + background

    @property
    def init_lr(self) -> float:
        # ssl_finetune.py:178 — sqrt-batch scaling against base batch 64.
        return self.lr * (self.batch_size**0.5) / (64**0.5)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.amp else jnp.float32

    def build_model(self) -> HookNet:
        return HookNet(
            arch=self.arch,
            classes=self.num_classes,
            dtype=self.dtype,
            remat=self.use_ac,
            packed_tail=self.packed_tail,
            packed_from=self.packed_from,
            packed_logits=self.packed_tail and self.packed_logits,
        )


class SegTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    model: HookNet = struct.field(pytree_node=False)


def create_finetune_state(rng, config: FinetuneConfig, local_batch: int = 2) -> SegTrainState:
    model = config.build_model()
    x = jnp.zeros((local_batch, config.seg_size, config.seg_size, 3), jnp.float32)
    variables = model.init(rng, x, x, train=False)
    tx = optax.adam(config.init_lr, b1=0.9, b2=0.999, eps=1e-8)
    params = variables["params"]
    return SegTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        tx=tx,
        model=model,
    )


def load_ssl_encoders(state: SegTrainState, ssl_variables) -> SegTrainState:
    """Checkpoint surgery (``ssl_finetune.py:146-172``): SSL
    ``context_encoder`` -> context branch encoder, ``target_encoder`` ->
    target branch encoder (params *and* BN running stats)."""

    def graft(tree, branch, encoder):
        tree = dict(tree)
        btree = dict(tree[branch])
        btree["encoder"] = encoder
        tree[branch] = btree
        return tree

    params = graft(
        graft(state.params, "context_branch", ssl_variables["params"]["context_encoder"]),
        "target_branch",
        ssl_variables["params"]["target_encoder"],
    )
    stats = graft(
        graft(
            state.batch_stats, "context_branch", ssl_variables["batch_stats"]["context_encoder"]
        ),
        "target_branch",
        ssl_variables["batch_stats"]["target_encoder"],
    )
    # Optimizer state must be rebuilt for the grafted params.
    return state.replace(params=params, batch_stats=stats, opt_state=state.tx.init(params))


def finetune_loss_fn(model, params, batch_stats, batch, lam: float, num_fg: int):
    classes = list(range(1, num_fg + 1))
    valid = batch.get("valid")  # (N,) mask for wrap-padded trailing batches
    (ctx_logits, tgt_logits), mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["context"],
        batch["target"],
        train=True,
        mutable=["batch_stats"],
    )
    dice = dice_loss_packed if getattr(model, "packed_logits", False) else dice_loss
    # Skip zero-weight terms at trace time: XLA cannot fold `0.0 * x`
    # (NaN semantics), so with the default lam=1 the whole context-branch
    # softmax/Dice chain — and, unused, the context seg-head conv — would
    # otherwise be computed and multiplied by zero every step. The
    # reference pays that cost (`ssl_finetune.py` computes both terms); the
    # loss value is identical.
    loss = 0.0
    if (1.0 - lam) != 0.0:
        loss += (1.0 - lam) * dice(
            ctx_logits, batch["context_mask"], classes=classes, sample_mask=valid
        )
    if lam != 0.0:
        loss += lam * dice(
            tgt_logits, batch["target_mask"], classes=classes, sample_mask=valid
        )
    return loss, (tgt_logits, mutated["batch_stats"])


def finetune_train_step(
    state: SegTrainState, batch, lam: float, num_fg: int, accum_steps: int = 1
):
    if accum_steps == 1:
        grad_fn = jax.value_and_grad(
            lambda p: finetune_loss_fn(state.model, p, state.batch_stats, batch, lam, num_fg),
            has_aux=True,
        )
        (loss, (tgt_logits, new_stats)), grads = grad_fn(state.params)
    else:
        # Sequential microbatches, one update on the averaged gradient
        # (semantics documented at FinetuneConfig.accum_steps). Logits are
        # re-concatenated so the per-sample train metrics below keep their
        # (N, C) shape contract.
        from .ssl import slice_microbatch

        if batch["context"].shape[0] % accum_steps:
            raise ValueError(
                f"batch size {batch['context'].shape[0]} not divisible by "
                f"accum_steps {accum_steps}"
            )
        new_stats = state.batch_stats
        grads_sum = None
        loss_sum = 0.0
        logits_parts = []
        for i in range(accum_steps):
            mb = slice_microbatch(batch, accum_steps, i)
            if grads_sum is not None:
                # Serialize the microbatches (see train/ssl.py — without
                # this barrier XLA overlaps the forwards and peak HBM
                # approaches the unaccumulated step's).
                mb, grads_sum = jax.lax.optimization_barrier((mb, grads_sum))
            grad_fn = jax.value_and_grad(
                lambda p, s=new_stats, b=mb: finetune_loss_fn(
                    state.model, p, s, b, lam, num_fg
                ),
                has_aux=True,
            )
            (loss_i, (logits_i, new_stats)), grads_i = grad_fn(state.params)
            grads_sum = (
                grads_i
                if grads_sum is None
                else jax.tree.map(jnp.add, grads_sum, grads_i)
            )
            loss_sum = loss_sum + loss_i
            logits_parts.append(logits_i)
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads_sum)
        loss = loss_sum * inv
        # Invert the interleaved microbatch partition (microbatch i holds
        # samples with index % accum == i, see ssl.slice_microbatch) so the
        # logits line up with batch["target_mask"]'s original sample order
        # for the train metrics below.
        tgt_logits = jnp.stack(logits_parts, axis=1).reshape(
            (-1,) + logits_parts[0].shape[1:]
        )
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    # Train-time confusion stats with background ignored
    # (ssl_finetune.py:440-447): pred-1 vs mask-1, ignore -1.
    if getattr(state.model, "packed_logits", False):
        # Packed logits: argmax within each sub-position's class group,
        # then depth-to-space the (cheap, channel-free) int predictions.
        N, h, w, C4 = tgt_logits.shape
        z = tgt_logits.astype(jnp.float32).reshape(N, h, w, 4, C4 // 4)
        pp = jnp.argmax(z, axis=-1)  # (N, h, w, 4)
        pred = (
            pp.reshape(N, h, w, 2, 2)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, 2 * h, 2 * w)
        )
    else:
        pred = jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1)
    tp, fp, fn, tn = get_stats(
        pred - 1, batch["target_mask"] - 1, num_classes=num_fg, ignore_index=-1
    )
    metrics = {"loss": loss, "tp": tp, "fp": fp, "fn": fn, "tn": tn}
    if batch.get("valid") is not None:
        # Echo the sample-validity mask so hosts can filter the per-sample
        # stat rows without assuming where the pads sit (multi-host
        # assembly puts each process's wrap-pad at its own segment tail,
        # not the global tail — see data/loader.last_batch_valid_mask).
        metrics["valid"] = batch["valid"]
    return new_state, metrics


def make_jitted_finetune_step(config: FinetuneConfig, mesh=None, donate: bool = True):
    lam = float(config.lam)
    num_fg = len(config.class_names)
    accum = config.accum_steps

    def step(state, batch):
        return finetune_train_step(state, batch, lam, num_fg, accum_steps=accum)

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (repl, data)
        kwargs["out_shardings"] = (repl, repl)
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step, **kwargs)


def make_jitted_fused_finetune_step(config: FinetuneConfig, aug_cfg, mesh=None, donate: bool = True):
    """One jit: seg augmentation (uint8 img+mask -> context/target pairs) +
    finetune step."""
    from ..data.pipeline import make_seg_train_views

    lam = float(config.lam)
    num_fg = len(config.class_names)
    accum = config.accum_steps

    def step(state, imgs_u8, masks_u8, key, valid=None):
        """``valid``: (B,) bool — False marks wrap-padded samples in the
        trailing partial batch; they are excluded from the Dice loss exactly
        (drop_last=False parity, reference ``ssl_finetune.py:276``). Their
        metric rows come back unmasked, with the mask echoed as
        ``metrics["valid"]`` — callers filter rows by it (the pad is a
        per-process-segment suffix, a global suffix only single-host). Padded slots hold wrapped *real* images, so BN
        batch statistics stay in-distribution (documented minor deviation:
        that one step's BN stats are computed over a resampled batch).
        Under accum_steps > 1 the Dice loss is averaged per microbatch
        (Dice sums are batch-nonlinear — the standard accumulation
        semantics); an all-padded microbatch contributes loss 0."""
        (ctx, tgt), (cm, tm) = make_seg_train_views(key, imgs_u8, masks_u8, aug_cfg)
        batch = {"context": ctx, "target": tgt, "context_mask": cm, "target_mask": tm}
        if valid is not None:
            batch["valid"] = valid
        return finetune_train_step(state, batch, lam, num_fg, accum_steps=accum)

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is None:
        return jax.jit(step, **kwargs)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        step,
        in_shardings=(repl, data, data, repl, data),
        out_shardings=(repl, repl),
        **kwargs,
    )

    def call(state, imgs_u8, masks_u8, key, valid=None):
        # Always pass `valid` positionally: the 5-entry in_shardings must
        # prefix the actual argument tuple, so omitting the optional arg
        # would raise; None is an empty pytree and its sharding entry is
        # simply unused.
        return jitted(state, imgs_u8, masks_u8, key, valid)

    return call
