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

TP/PP/SP are intentionally NOT the default at this model scale (the survey's
§2.5 rationale: a nano-class model fits one chip, and dp adds no hot-path
collectives). Tensor parallelism IS implemented for when the model outgrows
a chip: `shard_params_tp` places Megatron-style column/row sharding pairs
over the mesh's "model" axis and GSPMD inserts the psum at every
row-parallel contraction — `BatchedEngine(mesh=make_mesh(n, model_parallel=k))`
serves dp x tp with token parity (test_parallel.py) and the driver dryrun
executes it end-to-end (__graft_entry__.py).
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


# Tensor-parallel placement rules for the GLM-ASR param tree
# (models/glm_asr.py:init_params). Megatron-style column/row pairs: the
# projection INTO a parallel region is sharded on its output axis, the
# projection OUT is sharded on its input axis, and GSPMD inserts the
# reduce (psum over "model") where the row-parallel matmul contracts the
# sharded axis. Keyed by param name; value = the PartitionSpec for the
# UNSTACKED weight (stacked per-layer leaves get a leading None).
# Biases that feed a parallel region shard with it; biases/norms applied
# after the reduce stay replicated. `embed` stays replicated (it is the
# int8 skip-list's full-precision trio — reference backend/asr.py:176 —
# and at nano scale its 244 MB bf16 costs less than vocab-sharded logits'
# gather on every decode step).
_TP_RULES = {
    # encoder attention + MLP (d_model -> d_model, head-aligned)
    "q_w": P(None, "model"), "q_b": P("model",),
    "k_w": P(None, "model"),
    "v_w": P(None, "model"), "v_b": P("model",),
    "o_w": P("model", None),
    "fc1_w": P(None, "model"), "fc1_b": P("model",),
    "fc2_w": P("model", None),
    # adapter MLP (hidden axis parallel)
    "fc1.w": P(None, "model"), "fc1.b": P("model",),
    "fc2.w": P("model", None),
    # decoder GQA + SwiGLU. qkv_w's fused output axis is laid out
    # [q heads | k heads | v heads]; a contiguous "model" split is a valid
    # GSPMD sharding of the tensor (parity-tested) but not section-aligned
    # for every tp degree — the split into q/k/v inside the layer body
    # reshards. A head-aligned layout (separate q/k/v leaves) is the
    # optimization to take IF tp ever carries real traffic; SURVEY §2.5
    # records tp as out of scope for a single-chip-sized model.
    "qkv_w": P(None, "model"), "qkv_b": P("model",),
    "gate_up_w": P(None, "model"),
    "down_w": P("model", None),
}


def shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel placement over the mesh's "model" axis (replicated
    over "data"). Leaves without a rule — embeddings, norms, convs, biases
    after row-parallel matmuls — are replicated. Axis sizes that don't
    divide the tp degree fall back to replicated (GSPMD requires even
    shards only at placement; the compiled program is still SPMD)."""
    tp = int(mesh.shape["model"])

    def place(path, x):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys[-1] in ("q", "scale"):  # int8 QTensor wraps the weight leaf
            keys = keys[:-1]  # the wrapped weight's rule; the per-output
            # "scale" [..., 1, out] shards with output-parallel specs and
            # falls back to replicated under input-parallel ones (its
            # contracted axis is 1, indivisible — the divisibility check)
        name = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        spec = _TP_RULES.get(f"{parent}.{name}") or _TP_RULES.get(name)
        if spec is None or x.ndim < len(spec):
            return jax.device_put(x, NamedSharding(mesh, P()))
        dims = [None] * (x.ndim - len(spec)) + list(spec)  # stacked layers
        for i, d in enumerate(dims):
            if d == "model" and x.shape[i] % tp:
                return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(*dims)))

    return jax.tree_util.tree_map_with_path(place, params)


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
