"""Multi-chip scaling: mesh construction + shardings.

The reference has NO distributed layer (SURVEY.md §2.5/§2.6: one uvicorn
worker, one global model, an asyncio semaphore). The TPU design's multi-chip
story — recorded in the survey as the deliberate choice for a ~2B "Nano"
model that fits one chip — is **data parallelism over ICI**:

- parameters are REPLICATED on every chip (NamedSharding with no partitioned
  axes);
- the continuous batcher's session slots are SHARDED over the "data" axis —
  each chip serves its shard of concurrent sessions; XLA GSPMD compiles one
  SPMD program, and there are no cross-chip collectives on the hot path
  (sessions are independent), so ICI is touched only at parameter broadcast.

TP/PP/SP are intentionally NOT used at this model scale (the survey's §2.5
rationale); the mesh carries a "model" axis so tensor-parallel shardings can
be introduced without re-plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ("data", "model"); data = n_devices / model_parallel."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def replicate_params(params, mesh: Mesh):
    """Place every parameter replicated on all mesh devices."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_batch(tree, mesh: Mesh, axis: int = 0):
    """Shard array leaves over the 'data' mesh axis along `axis`."""

    def spec_for(x):
        spec = [None] * x.ndim
        if x.ndim > axis and x.shape[axis] % mesh.shape["data"] == 0:
            spec[axis] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), tree)


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
