"""Fused outer-product Adafactor for the MSF-WSI fuser heads.

The fuser (``inter_``) projector/predictor Dense kernels are the bulk of the
model for deep encoders (~1.58B of resnet50's 1.67B params — three d x d plus
two d x d/4 matrices per scale, d = (n_keep+1)*C_i up to 18432). Their
gradient is an outer product ``dW = X^T dY`` of tiny (2B, d) activation /
cotangent matrices, yet the standard autodiff + optax path materializes the
dense ``dW`` in HBM (plus reads it back for the second-moment statistics and
the update) — ~GBs of pure HBM traffic per step on a step that is already
bandwidth-bound.

This module computes the exact optax ``adafactor`` update without ever
forming ``dW``:

  * Row/column second-moment statistics via the Gram trick:
    ``sum_j dW_ij^2 = diag(X^T (dY dY^T) X)`` — O(B^2 d) FLOPs/bytes
    instead of O(B d^2) bytes.
  * The preconditioned update is *separable*: optax's factored update is
    ``u = g * row_factor[:, None] * col_factor[None, :]`` (see
    ``optax/_src/factorized.py:182-188``), so
    ``u = (X * row_factor)^T @ (dY * col_factor)`` — a rank-2B matmul whose
    epilogue XLA fuses into ``W + u``, i.e. one read-modify-write of W and
    nothing else.

The dense ``dW`` leaves produced by autodiff are routed to a group whose
transform ignores them (`on the fac kernels`), making the ``X^T dY`` HLO
dots dead code that XLA eliminates.

Exactness: identical to ``optax.adafactor(learning_rate,
multiply_by_parameter_scale=False, clipping_threshold=None, eps=...)`` up to
float reassociation (the Gram-trick reduction order differs from the dense
row/col sums). Kernels that optax would not factor (second-largest dim
< ``min_dim_size_to_factor``) must be labeled into the regular group —
``is_factored_kernel`` encodes that rule.

The (X, dY) pairs are delivered through optax's extra-args channel
(``GradientTransformationExtraArgs``; ``optax.multi_transform`` forwards
``**extra_args`` to every group): ``fac_sides`` maps a "module/fc" path
string to its pair. X is the sow'n Dense input (both SimSiam views
concatenated), dY the gradient w.r.t. a zero "tap" added to the Dense
output (``models/backbone.Projector``/``Predictor`` ``taps=``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def _key_str(k) -> str:
    return k.key if hasattr(k, "key") else str(k)


def fac_path_str(path) -> str:
    """'inter_projector_0/fc1' from a params-tree kernel path."""
    return "/".join(_key_str(k) for k in path[:-1])


def is_factored_kernel(path, leaf, min_dim_size_to_factor: int = 128) -> bool:
    """True for inter-head Dense kernels that optax would factor (2-D with
    second-largest dim >= min_dim_size_to_factor; ``_factored_dims``,
    ``optax/_src/factorized.py:35-57``) — the leaves this module handles."""
    if leaf.ndim != 2 or min(leaf.shape) < min_dim_size_to_factor:
        return False
    keys = [_key_str(k) for k in path]
    return (
        keys[0].startswith("inter_")
        and keys[-1] == "kernel"
        and keys[-2].startswith("fc")
    )


@dataclasses.dataclass
class _Result:
    """Opaque (non-pytree) per-kernel result container, as in optax's
    ``_UpdateResult`` (``factorized.py:60-67``)."""

    update: chex.Array
    v_row: chex.Array
    v_col: chex.Array


class FacAdafactorState(NamedTuple):
    count: chex.Array  # shared step count
    v_row: chex.ArrayTree  # (d_in,) per kernel
    v_col: chex.ArrayTree  # (d_out,) per kernel


def fused_outer_adafactor(
    learning_rate: float,
    eps: float = 1e-8,
    decay_rate: float = 0.8,
) -> optax.GradientTransformationExtraArgs:
    """Adafactor for outer-product-gradient kernels, from (X, dY) factors.

    The incoming ``updates`` leaves (the dense autodiff grads) are ignored —
    they exist only so the tree structure matches, and ignoring them is what
    lets XLA dead-code-eliminate their matmuls. The true gradient factors
    arrive via the ``fac_sides`` extra arg: {path_str: (X, dY)} with
    X (N, d_in), dY (N, d_out), such that dW = X^T dY.

    Matches ``optax.adafactor(learning_rate=lr, multiply_by_parameter_scale
    =False, clipping_threshold=None, eps=eps)`` (i.e. scale_by_factored_rms
    -> scale(lr) -> scale(-1)) to float-reassociation tolerance, including
    the bf16 statistics storage when the params are bf16.
    """

    def init_fn(params):
        def _init_row(p):
            return jnp.zeros((p.shape[0],), dtype=p.dtype)

        def _init_col(p):
            return jnp.zeros((p.shape[1],), dtype=p.dtype)

        return FacAdafactorState(
            count=jnp.zeros([], jnp.int32),
            v_row=jax.tree.map(_init_row, params),
            v_col=jax.tree.map(_init_col, params),
        )

    def update_fn(updates, state, params=None, *, fac_sides=None, **extra):
        if params is None:
            raise ValueError("fused_outer_adafactor requires params")
        if fac_sides is None:
            raise ValueError(
                "fused_outer_adafactor needs the fac_sides extra arg "
                "({path: (X, dY)}); pass it through tx.update(..., "
                "fac_sides=...) — see train.ssl.ssl_train_step."
            )
        # optax _decay_rate_pow(count): 1 - (count+1)^-0.8.
        decay_t = 1.0 - (state.count.astype(jnp.float32) + 1.0) ** (-decay_rate)

        def _update(path, _dw_ignored, w, v_row, v_col):
            x, dy = fac_sides[fac_path_str(path)]
            xf = x.astype(jnp.float32)
            dyf = dy.astype(jnp.float32)
            n_in, n_out = w.shape
            # Instantaneous row/col mean squares of dW = xf^T dyf, via the
            # Gram trick (exact up to reassociation):
            #   sum_j dW_ij^2 = sum_{b,b'} X_bi X_b'i (dY dY^T)_{bb'}
            gram_dy = dyf @ dyf.T  # (N, N)
            gram_x = xf @ xf.T
            row_sq = jnp.sum(xf * (gram_dy @ xf), axis=0)  # (d_in,)
            col_sq = jnp.sum(dyf * (gram_x @ dyf), axis=0)  # (d_out,)
            # mean(g^2 + eps) = mean(g^2) + eps.
            r_inst = row_sq / n_out + eps
            c_inst = col_sq / n_in + eps
            # EMA in f32, stored in the param dtype (optax stores stats in
            # param.dtype; factored.py:178-179).
            new_v_row = (
                decay_t * v_row.astype(jnp.float32) + (1.0 - decay_t) * r_inst
            ).astype(v_row.dtype)
            new_v_col = (
                decay_t * v_col.astype(jnp.float32) + (1.0 - decay_t) * c_inst
            ).astype(v_col.dtype)
            # Factors in the state dtype (as optax), applied in f32.
            row_factor = (new_v_row / jnp.mean(new_v_row)) ** -0.5
            col_factor = new_v_col**-0.5
            xs = xf * row_factor.astype(jnp.float32)[None, :]
            dys = dyf * col_factor.astype(jnp.float32)[None, :]
            # u = -lr * (X*rf)^T (dY*cf): rank-N matmul; the -lr scale and
            # the downstream W + u fuse into its epilogue.
            u = -learning_rate * jnp.einsum(
                "bi,bj->ij", xs, dys, preferred_element_type=jnp.float32
            )
            return _Result(u, new_v_row, new_v_col)

        flat = jax.tree_util.tree_map_with_path(
            lambda p, dw, w, vr, vc: _update(p, dw, w, vr, vc),
            updates,
            params,
            state.v_row,
            state.v_col,
        )
        # _Result is NOT a pytree: it is a leaf of `flat`, so MaskedNode
        # positions (empty pytrees) pass through untouched.
        pick = lambda attr: jax.tree.map(lambda r: getattr(r, attr), flat)
        new_count = optax.safe_increment(state.count)
        return pick("update"), FacAdafactorState(new_count, pick("v_row"), pick("v_col"))

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
