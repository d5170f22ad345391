"""Weight-norm data-dependent initialization.

The reference's ``data_based_init`` (utils/weightnorm.py:182-210) is a silent
no-op under its pinned Keras 2.0.0 (quirk Q4: it filters layers on the Keras-1
``.W``/``.b`` attributes, which no layer has). We provide a *working*
implementation behind an explicit flag, default **off**, so default training
dynamics match the reference's effective behavior.

The reference's intended loop (:196-210) visits every dense layer **in order**
and applies each update through a live session, so later layers see earlier
layers' rescaled outputs; per-unit moments are taken over all but the last
axis with ``s = sqrt(var + 1e-10)`` and the update is ``W /= s``,
``b := (b - mean)/s`` (:206-209). :func:`data_based_init_cl_vae` /
:func:`data_based_init_cl_vrnn` reproduce that sequential walk for the two
model families. One deliberate divergence, documented here: the reference's
dead code would normalize each layer's *post-activation* output
(``l.get_output_at(0)``); we normalize the *pre-activation*, which is the
Salimans & Kingma (2016) §3 recipe the code was transcribing — for the linear
heads the two coincide, and the reference path never executed (Q4).

The LSTM layers are untouched in both families: even under Keras 1 attribute
names the reference's ``hasattr(l, 'W') and hasattr(l, 'b')`` filter matches
only ``Dense`` layers (Keras LSTMs expose per-gate ``W_i``/``U_i``/... names).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized(layer: dict, preact) -> dict:
    """One reference update (weightnorm.py:205-209): per-unit moments over all
    but the last axis; kernel /= s, bias := (bias - mean)/s."""
    axes = tuple(range(preact.ndim - 1))
    mean = jnp.mean(preact, axis=axes)
    s = jnp.sqrt(jnp.var(preact, axis=axes) + 1e-10)
    return {
        "kernel": layer["kernel"] / s.reshape((1,) * (layer["kernel"].ndim - 1) + (-1,)),
        "bias": (layer["bias"] - mean) / s,
    }


def data_based_init(params: dict, preactivations: dict) -> dict:
    """Rescale named dense layers by data moments (single-shot form).

    Args:
      params: model param pytree (dict of layer dicts with 'kernel'/'bias').
      preactivations: dict mapping layer names (keys of ``params``) to the
        pre-activation outputs [batch..., out_dim] of that layer on a data batch.

    Returns a new param pytree; layers without a matching entry are untouched.
    Prefer the sequential per-family functions below, which recompute each
    layer's input through the already-rescaled earlier layers (the reference's
    per-layer ``sess.run`` loop semantics).
    """
    new_params = dict(params)
    for name, o in preactivations.items():
        layer = params[name]
        if not (isinstance(layer, dict) and "kernel" in layer):
            continue
        new_params[name] = _normalized(layer, o)
    return new_params


def _pre(layer, x):
    # precision='highest' like nn.core.dense: the default TPU matmul runs
    # bf16 and would degrade the moments the init normalizes against
    return (
        jnp.dot(x, layer["kernel"], preferred_element_type=jnp.float32, precision="highest")
        + layer["bias"]
    )


def data_based_init_cl_vae(params: dict, cfg, batch: dict, key) -> dict:
    """Sequential data-dependent init of every cl_vae dense layer.

    Walks the graph in forward order (h_w -> w heads -> [h] -> z heads ->
    [decoder_h] -> x_decoded_mean), updating each layer from its pre-activation
    on ``batch`` computed through the already-updated earlier layers. The
    stochastic nodes (w, z) are sampled once with ``key`` (the reference's
    ``learning_phase=1`` feed draws the same way, weightnorm.py:192-193).
    """
    from ..nn.distributions import sample_gaussian, sample_logistic_normal

    p = {k: dict(v) for k, v in params.items()}
    x = batch["x"]
    kw, kz = jax.random.split(key)

    p["h_w"] = _normalized(p["h_w"], _pre(p["h_w"], x))
    h_w = jax.nn.relu(_pre(p["h_w"], x))
    for name in ("w_mean", "w_log_var"):
        p[name] = _normalized(p[name], _pre(p[name], h_w))
    w = sample_logistic_normal(kw, _pre(p["w_mean"], h_w), _pre(p["w_log_var"], h_w))

    xw = jnp.concatenate([x, w], axis=-1)
    if cfg.has_hidden:
        p["h"] = _normalized(p["h"], _pre(p["h"], xw))
        h = jax.nn.relu(_pre(p["h"], xw))
    else:
        h = xw
    for name in ("z_mean", "z_log_var"):
        p[name] = _normalized(p[name], _pre(p[name], h))
    z = sample_gaussian(kz, _pre(p["z_mean"], h), _pre(p["z_log_var"], h))

    xpz = jnp.concatenate([batch["x_prev"], z], axis=-1) if cfg.use_x_prev else z
    wz = jnp.concatenate([w, xpz], axis=-1)
    if cfg.has_hidden:
        p["decoder_h"] = _normalized(p["decoder_h"], _pre(p["decoder_h"], wz))
        hd = jax.nn.relu(_pre(p["decoder_h"], wz))
    else:
        hd = wz
    p["x_decoded_mean"] = _normalized(p["x_decoded_mean"], _pre(p["x_decoded_mean"], hd))
    return p


def data_based_init_cl_vrnn(params: dict, cfg, batch: dict, key) -> dict:
    """Sequential data-dependent init of every cl_vrnn dense layer.

    Dense layers in forward order: hW -> Wargs -> (encoder LSTM, untouched) ->
    Z_mean/Z_log_var -> (decoder LSTM, untouched) -> X_decoded_mean.
    """
    from ..nn.distributions import sample_gaussian, sample_logistic_normal
    from ..ops.lstm import lstm_sequence

    p = {k: dict(v) for k, v in params.items()}
    x = batch["x"]
    kw, kz = jax.random.split(key)
    K1 = cfg.n_classes - 1

    flat = x.reshape(x.shape[:-2] + (cfg.seq_length * cfg.original_dim,))
    p["hW"] = _normalized(p["hW"], _pre(p["hW"], flat))
    hW = jax.nn.relu(_pre(p["hW"], flat))
    p["Wargs"] = _normalized(p["Wargs"], _pre(p["Wargs"], hW))
    Wargs = _pre(p["Wargs"], hW)
    W = sample_logistic_normal(kw, Wargs[..., :K1], Wargs[..., K1:])

    xw = jnp.concatenate(
        [x, jnp.broadcast_to(W[:, None, :], (x.shape[0], x.shape[1], W.shape[-1]))], axis=-1
    )
    h_seq, _ = lstm_sequence(p["encoder_h"], xw)
    for name in ("Z_mean", "Z_log_var"):
        p[name] = _normalized(p[name], _pre(p[name], h_seq))
    Z = sample_gaussian(kz, _pre(p["Z_mean"], h_seq), _pre(p["Z_log_var"], h_seq))

    xpz = jnp.concatenate([batch["x_prev"], Z], axis=-1) if cfg.use_x_prev else Z
    xpz = jnp.concatenate(
        [xpz, jnp.broadcast_to(W[:, None, :], (Z.shape[0], Z.shape[1], W.shape[-1]))], axis=-1
    )
    hd_seq, _ = lstm_sequence(p["decoder_h"], xpz)
    p["X_decoded_mean"] = _normalized(p["X_decoded_mean"], _pre(p["X_decoded_mean"], hd_seq))
    return p
