"""Device-mesh parallelism: DP over batch, optional TP over feature columns.

The reference has no multi-device code at all (SURVEY §2 parallelism
checklist); at its scale **data parallelism is the strategy that matters**
(88-dim frames, ~13k windows). The TPU-native expression:

* a ``jax.sharding.Mesh`` with axes ``('data', 'model')``;
* batches sharded over ``'data'`` (:func:`shard_batch`), params replicated or
  column-sharded over ``'model'`` (:func:`param_sharding_rules`) — the tensor-
  parallel option for scaled-up ``intermediate_dim``;
* the jitted train step is annotated through its *input shardings* (arrays are
  ``device_put`` with NamedShardings); GSPMD propagates them and inserts the
  gradient all-reduce over ICI. No hand-written collectives anywhere —
  this is the TPU-native replacement for the NCCL layer the reference lacks.

TP/PP/EP beyond column sharding are intentionally out of scope (SURVEY §2:
layers are 88-176 units wide, no MoE, recurrence not attention); the sequence
axis is handled by ``lax.scan`` (see :mod:`..ops.lstm`), which is the RNN
analog of blockwise/context-parallel scaling.

Weight-norm interplay: the optimizer's g/V split reduces over all-but-last
axes of each kernel (``..optim.adamwn``), so column (last-dim) sharding keeps
those reductions device-local — TP costs nothing extra in the update step.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data}x{n_model} devices, have {len(devices)}"
    )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, data: dict) -> dict:
    """Place [N, ...] arrays batch-sharded over the 'data' axis."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in data.items()}


def param_sharding_rules(params, mesh: Mesh, shard_model_axis: bool = True):
    """NamedSharding pytree: rank>=2 kernels column-sharded over 'model', rest replicated.

    With ``n_model == 1`` (pure DP) everything is effectively replicated.
    """

    def rule(p):
        if shard_model_axis and p.ndim >= 2 and p.shape[-1] % mesh.shape["model"] == 0:
            spec = P(*([None] * (p.ndim - 1) + ["model"]))
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_params(params, mesh: Mesh, shard_model_axis: bool = True):
    """device_put params according to :func:`param_sharding_rules`."""
    shardings = param_sharding_rules(params, mesh, shard_model_axis)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_opt_state(opt_state, mesh: Mesh):
    """Replicate optimizer scalars; shard per-param moments like their params.

    Moments have the same shapes as params, so the same rule applies; the
    weight-norm g-vectors are per-column and follow the column sharding.
    """

    def rule(leaf):
        if leaf.ndim >= 2 and leaf.shape[-1] % mesh.shape["model"] == 0:
            spec = P(*([None] * (leaf.ndim - 1) + ["model"]))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(rule, opt_state)


def shard_training_state(mesh: Mesh, params, train_data: dict, val_data: dict,
                         shard_model_axis: bool = True):
    """Annotate a training run's inputs onto ``mesh``.

    Returns (params, train_data, val_data) placed with their shardings; the
    Trainer's jitted epoch functions compile against them — XLA emits the
    all-reduce for gradients (DP) and the gather/reduce pattern for any
    column-sharded matmuls (TP) over ICI.
    """
    params = shard_params(params, mesh, shard_model_axis)
    return params, shard_batch(mesh, train_data), shard_batch(mesh, val_data)
