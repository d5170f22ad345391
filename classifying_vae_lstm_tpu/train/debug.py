"""Numerics debugging: fail fast on NaN/Inf with a named culprit.

SURVEY §5 notes the reference has no sanitizers and names JAX's
``checkify``/``jax.debug`` as the nearest useful analog; this module is that
analog. ``check_first_batch`` runs one un-scanned loss + grad evaluation and
raises with the exact tensor/parameter path that went non-finite — wired to
the train CLIs' ``--check_numerics`` flag so a bad init or corrupt corpus
fails in the first second, not as a NaN loss at epoch 40.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def assert_finite_pytree(tree, what: str = "pytree") -> None:
    """Raise FloatingPointError naming every non-finite leaf."""
    bad = []
    for path, leaf in _walk(tree):
        arr = jnp.asarray(leaf)
        if not bool(jnp.isfinite(arr).all()):
            n_bad = int(jnp.sum(~jnp.isfinite(arr)))
            bad.append(f"{path} ({n_bad}/{arr.size} non-finite)")
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: " + "; ".join(bad))


def check_first_batch(loss_fn, params, batch, key, *loss_args) -> dict:
    """Evaluate loss + grads once (eagerly) and assert everything is finite.

    Returns the metrics dict on success so callers can log it.
    """
    assert_finite_pytree(params, "params")
    assert_finite_pytree(batch, "batch")
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, key, *loss_args
    )
    assert_finite_pytree({"loss": loss, **metrics}, "loss/metrics")
    assert_finite_pytree(grads, "gradients")
    return {k: float(v) for k, v in metrics.items()}
