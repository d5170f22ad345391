"""Training loop: whole epochs as single device programs.

The reference crosses the Python<->runtime boundary once per batch inside
``model.fit`` (SURVEY §3.1 "HOT LOOP", ``cl_vae/train.py:66``). Here an epoch
is ONE jitted call: on-device shuffle (``jax.random.permutation``), a
``lax.scan`` over minibatches doing value_and_grad + the optimizer update, and
a scanned validation pass. Anneal weights enter as traced scalars, so the
per-epoch schedule (``AnnealLossWeight``) never triggers recompilation.

Under a device mesh the batch axis of ``data`` is sharded over ``'data'`` and
params/optimizer state are replicated; XLA inserts the gradient all-reduce
over ICI (see :mod:`..parallel.mesh`). Single-chip semantics are identical.

``fit`` reproduces the reference driver behavior end to end: annealing
(``cl_vae/train.py:40-51``), save-best checkpointing and early stopping inert
until ``min_epoch`` (``utils/model_utils.py:142-158``), Keras-style history
dict, and best-epoch selection (``cl_vae/train.py:72-74``).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .callbacks import AnnealSchedule, CheckpointPolicy, EarlyStoppingAfterEpoch
from .checkpoint import save_checkpoint


def _batched(data: dict, perm, batch_size: int):
    """Gather-shuffle and reshape [N, ...] -> [nb, batch, ...] on device.

    Drops the N % batch_size remainder (shapes under ``lax.scan`` are static;
    this matches the reference's batch-truncation convention,
    utils/pianoroll.py:154-158 — a different remainder is dropped each epoch
    since the permutation comes first).
    """
    nb = perm.shape[0] // batch_size
    perm = perm[: nb * batch_size]

    def f(a):
        shuffled = jnp.take(a, perm, axis=0)
        return shuffled.reshape((nb, batch_size) + a.shape[1:])

    return {k: f(v) for k, v in data.items()}


class Trainer:
    """Compiled train/eval epoch functions for one model family.

    ``loss_fn(params, batch, key, kl_w, class_w, w_kl_w) -> (loss, metrics)``
    is the model's :func:`loss_and_metrics` partially applied to its config.
    """

    def __init__(
        self,
        loss_fn: Callable,
        optimizer: optax.GradientTransformation,
        batch_size: int,
        data_sharding=None,
        replicated_sharding=None,
        mesh=None,
        noise_fn: Callable | None = None,
    ):
        self.loss_fn = loss_fn
        self.optimizer = optimizer
        self.batch_size = batch_size
        self.data_sharding = data_sharding
        self.mesh = mesh

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def train_epoch(params, opt_state, data, key, kl_w, class_w, w_kl_w):
            n = next(iter(data.values())).shape[0]
            kperm, kstep = jax.random.split(key)
            perm = jax.random.permutation(kperm, n)
            batches = _batched(data, perm, batch_size)
            nb = n // batch_size
            keys = jax.random.split(kstep, nb)

            def step(carry, xs):
                params, opt_state = carry
                batch, k = xs
                (_, metrics), grads = grad_fn(params, batch, k, kl_w, class_w, w_kl_w)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(step, (params, opt_state), (batches, keys))
            return params, opt_state, jax.tree.map(jnp.mean, metrics)

        def eval_epoch(params, data, key, kl_w, class_w, w_kl_w):
            n = next(iter(data.values())).shape[0]
            nb = n // batch_size
            batches = {k: v[: nb * batch_size].reshape((nb, batch_size) + v.shape[1:]) for k, v in data.items()}
            keys = jax.random.split(key, nb)

            def step(_, xs):
                batch, k = xs
                _, metrics = self.loss_fn(params, batch, k, kl_w, class_w, w_kl_w)
                return None, metrics

            _, metrics = jax.lax.scan(step, None, (batches, keys))
            return jax.tree.map(jnp.mean, metrics)

        if mesh is not None:
            # Data-parallel epochs: explicit shard_map + psum (SPMD spelled
            # out per device, the TPU-native gradient all-reduce — see
            # ..parallel.shard_map_step). Bit-identity with the single-device
            # epoch is by construction: the per-batch noise is PRE-DRAWN for
            # the global batch with the same keys/splits apply() would use
            # (models.*.draw_apply_noise) and sharded with the data, so every
            # device computes exactly the rows single-device would. Only the
            # gradient reduction order differs (pmean of shard-means), an fp
            # reordering. Composes with the Pallas kernels: inside shard_map
            # each device runs the fused pallas_call on its LOCAL shard
            # (tested in tests/test_parallel.py).
            assert noise_fn is not None, "DP training needs the model's draw_apply_noise"
            from jax.sharding import PartitionSpec as P

            n_data = mesh.shape["data"]
            assert batch_size % n_data == 0, (
                f"--dp {n_data} must divide batch_size {batch_size}"
            )
            rep, shard = P(), P(None, "data")  # [nb, B, ...]: shard the batch axis

            def _with_noise(batches, keys):
                # (nb, B, ...) noise from the SAME per-batch keys the
                # single-device epoch hands to loss_fn
                return {**batches, **jax.vmap(noise_fn)(keys)}

            def dp_train_epoch(params, opt_state, data, key, kl_w, class_w, w_kl_w):
                n = next(iter(data.values())).shape[0]
                kperm, kstep = jax.random.split(key)
                perm = jax.random.permutation(kperm, n)
                batches = _batched(data, perm, batch_size)
                keys = jax.random.split(kstep, n // batch_size)
                batches = _with_noise(batches, keys)

                def per_device(params, opt_state, batches, keys, kl_w, class_w, w_kl_w):
                    def step(carry, xs):
                        params, opt_state = carry
                        batch, k = xs
                        (_, metrics), grads = grad_fn(params, batch, k, kl_w, class_w, w_kl_w)
                        # THE data-parallel collective: mean-reduce over ICI
                        grads = jax.lax.pmean(grads, "data")
                        updates, opt_state = self.optimizer.update(grads, opt_state, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt_state), metrics

                    (params, opt_state), metrics = jax.lax.scan(
                        step, (params, opt_state), (batches, keys)
                    )
                    metrics = jax.lax.pmean(jax.tree.map(jnp.mean, metrics), "data")
                    return params, opt_state, metrics

                return jax.shard_map(
                    per_device, mesh=mesh,
                    in_specs=(rep, rep, shard, rep, rep, rep, rep),
                    out_specs=(rep, rep, rep), check_vma=False,
                )(params, opt_state, batches, keys, kl_w, class_w, w_kl_w)

            def dp_eval_epoch(params, data, key, kl_w, class_w, w_kl_w):
                n = next(iter(data.values())).shape[0]
                nb = n // batch_size
                batches = {k: v[: nb * batch_size].reshape((nb, batch_size) + v.shape[1:])
                           for k, v in data.items()}
                keys = jax.random.split(key, nb)
                batches = _with_noise(batches, keys)

                def per_device(params, batches, keys, kl_w, class_w, w_kl_w):
                    def step(_, xs):
                        batch, k = xs
                        _, metrics = self.loss_fn(params, batch, k, kl_w, class_w, w_kl_w)
                        return None, metrics

                    _, metrics = jax.lax.scan(step, None, (batches, keys))
                    return jax.lax.pmean(jax.tree.map(jnp.mean, metrics), "data")

                return jax.shard_map(
                    per_device, mesh=mesh,
                    in_specs=(rep, shard, rep, rep, rep, rep),
                    out_specs=rep, check_vma=False,
                )(params, batches, keys, kl_w, class_w, w_kl_w)

            self.train_epoch = jax.jit(dp_train_epoch, donate_argnums=(0, 1))
            self.eval_epoch = jax.jit(dp_eval_epoch)
        else:
            self.train_epoch = jax.jit(train_epoch, donate_argnums=(0, 1))
            self.eval_epoch = jax.jit(eval_epoch)

        def train_step(params, opt_state, batch, key, kl_w, class_w, w_kl_w):
            (_, metrics), grads = grad_fn(params, batch, key, kl_w, class_w, w_kl_w)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def train_epochs(params, opt_state, data, val_data, key, kl_ws, class_w, w_kl_ws):
            """E epochs as ONE device program: scan over (epoch key, anneal
            weights) with the epoch body (shuffle + minibatch scan + val pass)
            inside. Returns per-epoch train/val metric arrays; best-epoch
            selection and early stopping happen on host afterwards.

            This removes even the per-epoch dispatch/host-sync of
            :meth:`train_epoch` — the right mode for fixed-epoch-count runs at
            this scale (an epoch is ~40 ms of device time).
            """
            E = kl_ws.shape[0]
            keys = jax.random.split(key, E)

            def epoch_body(carry, xs):
                params, opt_state = carry
                k, kl_w, w_kl_w = xs
                kt, kv = jax.random.split(k)
                params, opt_state, m = train_epoch(params, opt_state, data, kt, kl_w, class_w, w_kl_w)
                vm = eval_epoch(params, val_data, kv, kl_w, class_w, w_kl_w)
                return (params, opt_state), (m, vm)

            (params, opt_state), (ms, vms) = jax.lax.scan(
                epoch_body, (params, opt_state), (keys, kl_ws, w_kl_ws)
            )
            return params, opt_state, ms, vms

        self.train_epochs = jax.jit(train_epochs, donate_argnums=(0, 1))

    def train_epoch_streaming(self, params, opt_state, host_data: dict, key,
                              kl_w, class_w, w_kl_w, rng: "np.random.Generator",
                              prefetch: int = 2):
        """Host-streaming epoch for corpora that don't fit in HBM.

        Shuffles/slices batches on host and double-buffers them onto the
        device (:mod:`..data.loader`); one jitted ``train_step`` per batch.
        Semantics match :meth:`train_epoch` (shuffle -> step per minibatch);
        only the data residency differs.
        """
        from ..data.loader import batch_iterator, device_prefetch

        metrics_acc = []
        it = device_prefetch(batch_iterator(host_data, self.batch_size, rng), prefetch)
        for batch in it:
            key, k = jax.random.split(key)
            params, opt_state, m = self.train_step(params, opt_state, batch, k, kl_w, class_w, w_kl_w)
            metrics_acc.append(m)
        mean = {
            k: jnp.mean(jnp.stack([m[k] for m in metrics_acc]))
            for k in metrics_acc[0]
        }
        return params, opt_state, mean


def fit(
    trainer: Trainer,
    params,
    train_data: dict,
    val_data: dict,
    num_epochs: int,
    key,
    kl_anneal: int = 0,
    w_kl_anneal: int = 0,
    class_weight: float = 1.0,
    patience: int = 5,
    min_epoch: int = 0,
    checkpoint_path: str | None = None,
    verbose: bool = True,
    log_fn: Callable | None = None,
    opt_state=None,
    initial_epoch: int = 0,
    save_last: bool = False,
    trace_dir: str | None = None,
    streaming: bool = False,
    stream_seed: int = 0,
):
    """Run the full training schedule; returns (params, history, best_loss).

    ``min_epoch`` gates checkpointing/early-stop exactly like the reference
    (``max(kl_anneal, w_kl_anneal)+1``, ``cl_vae/train.py:38-39``). The best
    epoch minimizes val_loss over epochs >= min_epoch (``cl_vae/train.py:72``).

    Extensions over the reference: pass ``opt_state``/``initial_epoch`` (from
    :func:`.checkpoint.load_opt_state`) to resume mid-training; ``save_last``
    writes ``<run>.last.npz`` (+ optimizer state) every epoch for resume;
    ``trace_dir`` captures a ``jax.profiler`` trace of one post-compile epoch
    (the reference's TensorBoard-callback analog, SURVEY §5 tracing);
    ``streaming`` routes training through
    :meth:`Trainer.train_epoch_streaming` — ``train_data`` stays host-side
    NumPy, batches are shuffled on host and double-buffered onto the device
    (the larger-than-HBM path; the val split must still fit on device).
    """
    # train_epoch donates its params/opt_state buffers; copy so the caller's
    # arrays (and any later fit() on the same pytree) stay valid
    params = jax.tree.map(jnp.copy, params)
    if opt_state is None:
        opt_state = trainer.optimizer.init(params)
    kl_sched = AnnealSchedule(0.1, 1.0, kl_anneal)
    w_kl_sched = AnnealSchedule(0.0, 1.0, w_kl_anneal)
    stopper = EarlyStoppingAfterEpoch(min_epoch=min_epoch, patience=patience)
    ckpt = CheckpointPolicy(min_epoch=min_epoch)
    history: dict[str, list] = {}
    best_params = params
    traced = False
    stream_rng = np.random.default_rng(stream_seed) if streaming else None
    if streaming:
        train_data = {k: np.asarray(v) for k, v in train_data.items()}

    for epoch in range(initial_epoch, num_epochs):
        t0 = time.perf_counter()
        kl_w = jnp.float32(kl_sched(epoch))
        w_kl_w = jnp.float32(w_kl_sched(epoch))
        key, k_train, k_val = jax.random.split(key, 3)

        def run_epoch():
            if streaming:
                p, s, m = trainer.train_epoch_streaming(
                    params, opt_state, train_data, k_train, kl_w,
                    jnp.float32(class_weight), w_kl_w, stream_rng
                )
            else:
                p, s, m = trainer.train_epoch(
                    params, opt_state, train_data, k_train, kl_w, jnp.float32(class_weight), w_kl_w
                )
            vm = trainer.eval_epoch(p, val_data, k_val, kl_w, jnp.float32(class_weight), w_kl_w)
            jax.block_until_ready(vm)
            return p, s, m, vm

        # trace one post-compile epoch (the first epoch includes compilation)
        if trace_dir is not None and epoch > initial_epoch and not traced:
            traced = True
            with jax.profiler.trace(trace_dir):
                params, opt_state, m, vm = run_epoch()
        else:
            params, opt_state, m, vm = run_epoch()
        logs = {k: float(v) for k, v in m.items()}
        logs.update({f"val_{k}": float(v) for k, v in vm.items()})
        for k, v in logs.items():
            history.setdefault(k, []).append(v)
        if verbose:
            dt = time.perf_counter() - t0
            print(
                f"epoch {epoch + 1}/{num_epochs} loss={logs['loss']:.3f} "
                f"val_loss={logs['val_loss']:.3f} w_acc={logs.get('w_acc', 0):.3f} "
                f"kl_w={float(kl_w):.2f} ({dt:.2f}s)"
            )
        if log_fn is not None:
            log_fn(epoch, logs)
        if ckpt.should_save(epoch, logs["val_loss"]):
            # real device copies: params buffers are donated to the next epoch
            best_params = jax.tree.map(jnp.copy, params)
            if checkpoint_path is not None:
                save_checkpoint(checkpoint_path, best_params)
        if save_last and checkpoint_path is not None:
            save_checkpoint(
                checkpoint_path.replace(".npz", ".last.npz"), params, opt_state, epoch + 1
            )
        if patience > 0 and stopper.should_stop(epoch, logs["val_loss"]):
            break

    val_losses = history.get("val_loss", [])
    masked = [v if i >= min_epoch else np.inf for i, v in enumerate(val_losses)]
    best_ind = int(np.argmin(masked)) if masked else 0
    best_loss = {k: v[best_ind] for k, v in history.items() if v}
    return params, best_params, history, best_loss
