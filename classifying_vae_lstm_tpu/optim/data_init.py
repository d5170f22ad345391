"""Weight-norm data-dependent initialization.

The reference's ``data_based_init`` (utils/weightnorm.py:182-210) is a silent
no-op under its pinned Keras 2.0.0 (quirk Q4: it filters layers on the Keras-1
``.W``/``.b`` attributes, which no layer has). We provide a *working*
implementation behind an explicit flag, default **off**, so default training
dynamics match the reference's effective behavior.

For each named dense sub-pytree, given a data batch's pre-activation outputs o:
``kernel /= std(o)`` (per output unit) and ``bias := (bias - mean(o)) / std(o)``
— exactly the update the reference intended (reference :205-210).
"""

from __future__ import annotations

import jax.numpy as jnp


def data_based_init(params: dict, preactivations: dict) -> dict:
    """Rescale dense layers by data moments.

    Args:
      params: model param pytree (dict of layer dicts with 'kernel'/'bias').
      preactivations: dict mapping layer names (keys of ``params``) to the
        pre-activation outputs [batch..., out_dim] of that layer on a data batch.

    Returns a new param pytree; layers without a matching entry are untouched.
    """
    new_params = dict(params)
    for name, o in preactivations.items():
        layer = params[name]
        if not (isinstance(layer, dict) and "kernel" in layer):
            continue
        axes = tuple(range(o.ndim - 1))
        mean = jnp.mean(o, axis=axes)
        std = jnp.sqrt(jnp.var(o, axis=axes) + 1e-10)
        new_params[name] = {
            "kernel": layer["kernel"] / std.reshape((1,) * (layer["kernel"].ndim - 1) + (-1,)),
            "bias": (layer["bias"] - mean) / std,
        }
    return new_params
