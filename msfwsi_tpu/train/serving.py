"""Serving export: freeze a fine-tuned HookNet into a portable StableHLO
artifact.

Production deployment path beyond the reference (which only ever loads
checkpoints back into Python): ``export_hooknet_serving`` serializes the
*entire* inference function — eval-mode HookNet forward on a fixed tile
chunk, weights baked in — via ``jax.export`` to a single file that any JAX
runtime (same or newer jaxlib, any backend) can load and call without the
model code or checkpoint machinery.

The exported signature matches the per-slide chunk loop
(``evaluate.py:270-284``): ``(context (N,256,256,3) f32 normalized,
target (N,256,256,3)) -> predicted class map (N,256,256) int32``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["export_hooknet_serving", "load_serving_artifact"]


def export_hooknet_serving(
    model,
    variables,
    path: str,
    chunk: int = 128,
    size: int = 256,
) -> str:
    """Serialize eval-mode chunked inference (weights closed over) to
    ``path``. Returns the path."""
    from jax import export as jexport

    def infer(ctx, tgt):
        _, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        return jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1).astype(jnp.int32)

    spec = jax.ShapeDtypeStruct((chunk, size, size, 3), jnp.float32)
    exported = jexport.export(jax.jit(infer))(spec, spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_serving_artifact(path: str):
    """Load a serialized artifact; returns a callable
    ``(context, target) -> pred_mask``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
