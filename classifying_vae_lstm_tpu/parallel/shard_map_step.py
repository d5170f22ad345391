"""Explicit-SPMD training step via ``jax.shard_map`` + ``psum``.

:mod:`.mesh` expresses data parallelism implicitly (NamedSharding inputs,
GSPMD inserts the all-reduce). This module is the explicit counterpart: the
per-device program is written out — local forward/backward on the device's
batch shard, then ``jax.lax.psum`` of gradients and metrics over the ``data``
axis — which is the TPU-native spelling of the gradient all-reduce a NCCL
data-parallel trainer would do by hand. Both paths produce identical updates
(tested against each other and against single-device in
``tests/test_parallel.py``); the implicit path remains the default, this one
exists for cases where manual collective placement matters (e.g. overlapping
a reduce with the optimizer update on future multi-slice topologies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_shard_map_train_step(loss_fn, optimizer: optax.GradientTransformation, mesh: Mesh):
    """Build a jitted DP train step with explicit gradient psum.

    ``loss_fn(params, batch, key, kl_w, class_w, w_kl_w) -> (loss, metrics)``.
    Batch arrays must be sharded (or shardable) over ``mesh`` axis ``'data'``;
    params/opt state are replicated.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    n_data = mesh.shape["data"]

    def per_device(params, opt_state, batch, key, kl_w, class_w, w_kl_w):
        # identical PRNG stream on every device would correlate the noise;
        # fold in the device index so shards draw independently
        idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, idx)
        (_, metrics), grads = grad_fn(params, batch, key, kl_w, class_w, w_kl_w)
        # THE data-parallel collective: mean-reduce grads/metrics over ICI
        grads = jax.lax.pmean(grads, axis_name="data")
        metrics = jax.lax.pmean(metrics, axis_name="data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    replicated = P()
    batch_spec = P("data")
    step = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, replicated, batch_spec, replicated, replicated, replicated, replicated),
        out_specs=(replicated, replicated, replicated),
        check_vma=False,
    )
    return jax.jit(step)


def replicate(tree, mesh: Mesh):
    """device_put a pytree replicated over the whole mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
