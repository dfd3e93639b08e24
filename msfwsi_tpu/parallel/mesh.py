"""Device mesh + sharding policy — the TPU-native replacement for the
reference's DDP/NCCL runtime (``tools/ssl_train.py:62-71,135-141,160,170``).

Design (GSPMD, not a DDP translation):
  * A 2-D ``Mesh`` over ("data", "model"). The reference only exercises data
    parallelism (SURVEY §2.5), so "model" defaults to size 1 but the axis is
    plumbed through for larger encoders.
  * Batches are sharded over "data" via `NamedSharding`; parameters and
    optimizer state are replicated. Under ``jax.jit`` XLA then inserts the
    gradient reduce (psum over ICI) automatically — DDP's all-reduce without
    hand-written collectives.
  * SyncBatchNorm parity is free: batch statistics computed with ``jnp.mean``
    over the sharded batch axis are *global* means — XLA emits the
    cross-replica reduction, which is exactly
    ``SyncBatchNorm.convert_sync_batchnorm`` semantics
    (``ssl_train.py:160``).
  * Multi-host: call :func:`initialize_distributed` first
    (``jax.distributed.initialize``), DCN over the "data" axis outer
    dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "initialize_distributed",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape; ``data=-1`` means "all remaining devices"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        if model < 1:
            raise ValueError(f"model axis size must be >= 1, got {model}")
        data = self.data if self.data != -1 else n_devices // model
        if data < 1 or data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(spec: MeshSpec | None = None, devices: Sequence[Any] | None = None) -> Mesh:
    """Build a ("data", "model") mesh over the given (or all) devices."""
    spec = spec or MeshSpec()
    devices = list(devices) if devices is not None else jax.devices()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in ``batch`` with its leading dim sharded over
    "data". Works on arbitrary pytrees; leading dims must divide the data
    axis size."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def initialize_distributed(coordinator_address: str | None = None, **kwargs) -> None:
    """Multi-host bring-up (replaces ``dist.init_process_group``,
    ``ssl_train.py:135-141``). No-op when JAX is already initialized or
    running single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except (RuntimeError, ValueError):
        # Already initialized, or single-process run.
        pass
