"""Tensor parallelism for the MSF-WSI fuser heads.

The fuser path concatenates a context feature with ``n_keep`` target
features, so its projector widths scale as ``C_i * (n_keep + 1)`` — with
resnet50 (C_4 = 2048) and the default scale 4 that is an 18432-wide 3-layer
MLP per scale: **~2.4B parameters**, far beyond one chip's HBM. (The
reference has the same structure but only ever ran resnet18; its hardcoded
dims made resnet50 impossible anyway, ``backbone.py:67``.)

GSPMD makes sharding these declarative: place every fuser ``Dense`` kernel
with its wide dimension split over the "model" mesh axis and let XLA insert
the collectives. No model-code changes — the sharding lives purely in where
the arrays are placed (jit infers the rest). The same path rule covers the
optimizer moments: any leaf whose tree path passes through an ``inter_*``
name (Adam m/v, Adafactor row/column factors) follows its parameter's
placement; everything else is replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = [
    "ssl_param_shardings",
    "state_shardings",
    "shard_ssl_state",
    "create_sharded_ssl_state",
]


def _path_names(path) -> list[str]:
    # DictKey has .key, GetAttrKey has .name, SequenceKey stringifies.
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def _spec_for(names: list[str], leaf, n_model: int) -> P:
    """Placement rule for one leaf: under an ``inter_*`` path, split Dense
    kernels column-parallel (else row-parallel) and divisible vectors
    (biases, Adafactor factors) over "model"; everything else replicated.
    Works on concrete arrays and on ``jax.eval_shape`` structs alike (only
    ``ndim``/``shape`` are read)."""
    if not any(n.startswith("inter_") for n in names):
        return P()
    if leaf.ndim == 2 and names[-1] == "kernel":
        if leaf.shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if leaf.shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
    elif leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
        return P(MODEL_AXIS)
    return P()


def ssl_param_shardings(params, mesh: Mesh):
    """NamedSharding tree for MSFWSI params: fuser (``inter_*``) Dense
    kernels/vectors split over "model" where divisible; everything else
    replicated."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(_path_names(path), leaf, n_model)
        ),
        params,
    )


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a whole SSL train state (step, params,
    batch_stats, opt_state) — accepts a concrete state or its
    ``jax.eval_shape``. Optimizer moments are matched to their parameters
    by the same ``inter_*`` path rule (their paths end with the parameter's
    path), so no template state is ever materialized."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(_path_names(path), leaf, n_model)
        ),
        state,
    )


def shard_ssl_state(state, mesh: Mesh):
    """Place an SSL train state for (data, model) execution: fuser weights
    and their optimizer moments model-sharded, everything else replicated.

    Every leaf is re-placed — a state restored from a checkpoint holds
    *committed* single-device arrays (step, Adam counts) that jit refuses
    to mix with mesh-placed params — and values are moved, never rebuilt,
    so restored optimizer moments survive a TP resume intact."""
    shardings = state_shardings(state, mesh)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def create_sharded_ssl_state(rng, config, mesh: Mesh):
    """Initialize an SSL train state directly under its TP placements: the
    init is traced abstractly first (``jax.eval_shape`` — no allocation),
    the placement tree derived from it, and the real init jitted with those
    ``out_shardings`` — so the fuser heads and their optimizer state are
    *born* distributed. With resnet50's ~1.58B-param heads, the
    materialize-then-reshard alternative would exceed a small-HBM chip
    before the re-placement could run."""
    from ..train import ssl as S

    def init(key):
        return S.create_ssl_state(key, config)

    abstract = jax.eval_shape(init, rng)
    shardings = state_shardings(abstract, mesh)
    return jax.jit(init, out_shardings=shardings)(rng)
