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
the parameter arrays are placed (jit infers the rest, and optimizer moments
created with ``zeros_like`` inherit the placement).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["ssl_param_shardings", "shard_ssl_state"]


def ssl_param_shardings(params, mesh: Mesh):
    """NamedSharding tree for MSFWSI params: fuser (``inter_*``) Dense
    kernels/vectors split over "model" where divisible; everything else
    replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if not names or not names[0].startswith("inter_"):
            return P()
        if leaf.ndim == 2 and names[-1] == "kernel":
            # Split the output dim (column-parallel) when divisible, else the
            # input dim (row-parallel), else replicate.
            if leaf.shape[1] % n_model == 0:
                return P(None, MODEL_AXIS)
            if leaf.shape[0] % n_model == 0:
                return P(MODEL_AXIS, None)
        elif leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def shard_ssl_state(state, mesh: Mesh):
    """Place an SSL train state for (data, model) execution: fuser weights
    model-sharded, everything else replicated; optimizer moments rebuilt so
    they inherit the weight placements."""
    shardings = ssl_param_shardings(state.params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, state.params, shardings)

    repl = NamedSharding(mesh, P())
    batch_stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state.batch_stats
    )
    # zeros_like under the placed params keeps their shardings — use the
    # freshly initialized tree as a placement template and transfer the
    # state's actual values onto it (a restored state carries real Adam
    # moments that must survive the re-placement).
    template = state.tx.init(params)

    def _place(t, v):
        # Param-shaped moments inherit the param placement (zeros_like under
        # NamedSharding); freshly created scalars (e.g. Adam's count) come
        # out single-device — replicate those over the mesh.
        s = t.sharding if isinstance(t.sharding, NamedSharding) else repl
        return jax.device_put(v, s)

    opt_state = jax.tree.map(_place, template, state.opt_state)
    # Replicate the scalar leaves too: a state restored from a checkpoint
    # holds *committed* single-device arrays (e.g. step), which jit refuses
    # to mix with mesh-placed params.
    return state.replace(
        step=jax.device_put(state.step, repl),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
