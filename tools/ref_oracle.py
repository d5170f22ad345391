"""Reference-semantics oracle: a torch transcription of the Keras graphs.

An INDEPENDENT executable of the reference's training semantics, used to
prove that the JAX framework's composition (model forward + losses + autodiff
+ AdamWithWeightnorm update) reproduces reference training dynamics step for
step (VERDICT round 1, "Next round" item 1; SURVEY §4 "train-on-tiny-slice
loss-curve comparison vs reference semantics").

Transcribed from the reference source, cited per block:

* cl_vae graph + losses:   ``cl_vae/model.py:130-224``
* cl_vrnn graph + losses:  ``cl_vrnn/model.py:164-267``
* Keras 2.0 loss reductions: ``losses.binary_crossentropy`` means the clipped
  BCE over the last axis (backend epsilon 1e-7), ``categorical_crossentropy``
  renormalizes then clips; per-output scores are then averaged over every
  remaining axis and summed with the compile loss_weights
  (``cl_vae/model.py:216-219``).
* AdamWithWeightnorm:      ``utils/weightnorm.py:75-143`` with the g/V split
  of ``get_weightnorm_params_and_grads`` (:146-166) and the W write-back of
  ``add_weightnorm_param_updates`` (:169-178); Keras 2.0 Adam bias correction
  folded into the learning rate.
* Keras 2.0 LSTM cell: fused kernel [in, 4H], gate order (i, f, c, o),
  ``hard_sigmoid`` recurrent activation, ``tanh`` activation — the cell the
  reference's ``LSTM(intermediate_dim, return_sequences=True)`` lowers to
  (``cl_vrnn/model.py:196-199,225-228``).

Pure torch + NumPy — no JAX — so agreement with the JAX implementation is
evidence about the JAX code, not a tautology. Parameters are stored in the
same [in, out] / [in, 4H] layout Keras uses (which the JAX pytrees share),
so a pytree of NumPy arrays loads verbatim. Noise is injected explicitly
(``eps_w``/``eps_z`` arguments) so both implementations can be driven with
identical draws; the reference's in-graph ``K.random_normal`` nodes
(``cl_vae/model.py:152,171``) are the only places this transcription
parameterizes rather than copies.
"""

from __future__ import annotations

import numpy as np
import torch

_EPS = 1e-7  # Keras 2.0 backend _EPSILON (keras/backend/common.py: 10e-8)


def _to_params(params_np) -> dict:
    return {
        name: {k: torch.tensor(np.asarray(v), dtype=torch.float64, requires_grad=True)
               for k, v in layer.items()}
        for name, layer in params_np.items()
    }


def _bce(y_true, y_pred):
    """Keras losses.binary_crossentropy: clip then mean over the last axis."""
    p = torch.clamp(y_pred, _EPS, 1.0 - _EPS)
    return -(y_true * torch.log(p) + (1 - y_true) * torch.log(1 - p)).mean(-1)


def _cce(y_true, y_pred):
    """Keras losses.categorical_crossentropy: renormalize, clip, -sum t*log p."""
    p = y_pred / y_pred.sum(-1, keepdim=True)
    p = torch.clamp(p, _EPS, 1.0 - _EPS)
    return -(y_true * torch.log(p)).sum(-1)


class RefCLVAE:
    """cl_vae/model.py:130-224 forward + compiled loss, explicit noise."""

    def __init__(self, params_np, original_dim, intermediate_dim, latent_dim,
                 n_classes, use_x_prev=False, w_log_var_prior=0.0):
        self.p = _to_params(params_np)
        self.original_dim = original_dim
        self.intermediate_dim = intermediate_dim  # latent_dim_0
        self.latent_dim = latent_dim
        self.n_classes = n_classes
        self.use_x_prev = use_x_prev
        self.w_log_var_prior = w_log_var_prior

    def parameters(self):
        return [t for layer in self.p.values() for t in layer.values()]

    def _dense(self, name, x):
        return x @ self.p[name]["kernel"] + self.p[name]["bias"]

    def losses(self, x, y, w_true, eps_w, eps_z, x_prev=None,
               kl_weight=1.0, class_weight=1.0, w_kl_weight=1.0):
        """Total compiled loss + named terms (cl_vae/model.py:190-219)."""
        h_w = torch.relu(self._dense("h_w", x))
        w_mean = self._dense("w_mean", h_w)
        w_log_var = self._dense("w_log_var", h_w)
        # w_sampling Lambda (:146-156): logit-normal, appended zero, raw softmax
        w_norm = w_mean + torch.exp(w_log_var / 2) * eps_w
        zero = torch.zeros(w_norm.shape[0], 1, dtype=w_norm.dtype)  # explicit:
        # w_norm[:, :1] would be empty in the vanilla K=1 case (zero free logits)
        w0 = torch.cat([w_norm, zero], dim=-1)
        num = torch.exp(w0 - w0.max(-1, keepdim=True).values)  # stable, same value
        w = num / num.sum(-1, keepdim=True)

        xw = torch.cat([x, w], dim=-1)
        if self.intermediate_dim > 0:
            h = torch.relu(self._dense("h", xw))
        else:
            h = xw
        z_mean = self._dense("z_mean", h)
        z_log_var = self._dense("z_log_var", h)
        z = z_mean + torch.exp(z_log_var / 2) * eps_z  # sampling Lambda (:169-174)

        xpz = torch.cat([x_prev, z], dim=-1) if self.use_x_prev else z
        wz = torch.cat([w, xpz], dim=-1)
        if self.intermediate_dim > 0:
            hd = torch.relu(self._dense("decoder_h", wz))
        else:
            hd = wz
        x_hat = torch.sigmoid(self._dense("x_decoded_mean", hd))

        vae = (self.original_dim * _bce(y, x_hat)).mean()
        kl = (-0.5 * (1 + z_log_var - z_mean**2 - torch.exp(z_log_var)).sum(-1)).mean()
        pv = self.w_log_var_prior
        vs = 1 - pv + w_log_var - torch.exp(w_log_var) / np.exp(pv) - w_mean**2 / np.exp(pv)
        w_kl = (-0.5 * vs.sum(-1)).mean()
        w_rec = ((self.n_classes - 1) * _cce(w_true, w)).mean()
        total = vae + w_kl_weight * w_kl + class_weight * w_rec + kl_weight * kl
        return total, {"vae": vae, "kl": kl, "w_kl": w_kl, "w_rec": w_rec}


def _lstm_seq(p, x):
    """Keras 2.0 LSTM over [B, T, in]: fused [in,4H] kernel, (i,f,c,o) gates,
    hard_sigmoid recurrent activation (cl_vrnn/model.py:196-199,225-228)."""
    B, T, _ = x.shape
    H = p["recurrent_kernel"].shape[0]
    h = torch.zeros(B, H, dtype=x.dtype)
    c = torch.zeros(B, H, dtype=x.dtype)
    hs = []
    hard_sig = lambda a: torch.clamp(0.2 * a + 0.5, 0.0, 1.0)
    for t in range(T):
        z = x[:, t] @ p["kernel"] + h @ p["recurrent_kernel"] + p["bias"]
        zi, zf, zc, zo = z[:, :H], z[:, H:2*H], z[:, 2*H:3*H], z[:, 3*H:]
        i, f, o = hard_sig(zi), hard_sig(zf), hard_sig(zo)
        c = f * c + i * torch.tanh(zc)
        h = o * torch.tanh(c)
        hs.append(h)
    return torch.stack(hs, dim=1)


class RefCLVRNN:
    """cl_vrnn/model.py:164-267 forward + compiled loss, explicit noise."""

    def __init__(self, params_np, original_dim, intermediate_dim, latent_dim,
                 seq_length, n_classes, use_x_prev=False, w_log_var_prior=0.0):
        self.p = _to_params(params_np)
        self.original_dim = original_dim
        self.intermediate_dim = intermediate_dim
        self.latent_dim = latent_dim
        self.seq_length = seq_length
        self.n_classes = n_classes
        self.use_x_prev = use_x_prev
        self.w_log_var_prior = w_log_var_prior

    def parameters(self):
        return [t for layer in self.p.values() for t in layer.values()]

    def _dense(self, name, x):
        return x @ self.p[name]["kernel"] + self.p[name]["bias"]

    def losses(self, x, y, w_true, eps_w, eps_z, x_prev=None,
               kl_weight=1.0, class_weight=1.0, w_kl_weight=1.0):
        B, T, D = x.shape
        K1 = self.n_classes - 1
        hW = torch.relu(self._dense("hW", x.reshape(B, T * D)))
        Wargs = self._dense("Wargs", hW)
        W_mean, W_log_var = Wargs[:, :K1], Wargs[:, K1:]
        # sampling_w Lambda (:182-191)
        W_samp = W_mean + torch.exp(W_log_var / 2) * eps_w
        W0 = torch.cat([W_samp, torch.zeros(W_samp.shape[0], 1, dtype=W_samp.dtype)], dim=-1)
        num = torch.exp(W0 - W0.max(-1, keepdim=True).values)
        W = num / num.sum(-1, keepdim=True)

        Wr = W[:, None, :].expand(B, T, self.n_classes)
        XW = torch.cat([x, Wr], dim=-1)
        enc_h = _lstm_seq(self.p["encoder_h"], XW)
        Z_mean = self._dense("Z_mean", enc_h)
        Z_log_var = self._dense("Z_log_var", enc_h)
        Z = Z_mean + torch.exp(Z_log_var / 2) * eps_z  # sampling Lambda (:213-218)

        XpZ = torch.cat([x_prev, Z], dim=-1) if self.use_x_prev else Z
        XpZ = torch.cat([XpZ, Wr], dim=-1)
        dec_h = _lstm_seq(self.p["decoder_h"], XpZ)
        X_hat = torch.sigmoid(self._dense("X_decoded_mean", dec_h))

        vae = (self.original_dim * _bce(y, X_hat)).mean()  # mean over B and T
        kl = (-0.5 * (1 + Z_log_var - Z_mean**2 - torch.exp(Z_log_var)).sum(-1)).mean()
        pv = self.w_log_var_prior
        vs = 1 - pv + W_log_var - torch.exp(W_log_var) / np.exp(pv) - W_mean**2 / np.exp(pv)
        w_kl = (-0.5 * vs.sum(-1)).mean()
        w_rec = ((self.n_classes - 1) * _cce(w_true, W)).mean()
        total = vae + w_kl_weight * w_kl + class_weight * w_rec + kl_weight * kl
        return total, {"vae": vae, "kl": kl, "w_kl": w_kl, "w_rec": w_rec}


class RefAdamWN:
    """AdamWithWeightnorm (utils/weightnorm.py:75-143), torch, in-place.

    Rank>=2 tensors use the g/V split (:146-166) with the persistent
    ``V_scaler`` write-back (:169-178); rank-1 tensors get plain Keras Adam
    (bias correction folded into lr_t).
    """

    def __init__(self, tensors, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
        self.tensors = list(tensors)
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.t = 0
        self.state = []
        for p in self.tensors:
            s = {"m": torch.zeros_like(p), "v": torch.zeros_like(p)}
            if p.dim() > 1:
                out = p.shape[-1]
                s["m_g"] = torch.zeros(out, dtype=p.dtype)
                s["v_g"] = torch.zeros(out, dtype=p.dtype)
                s["v_scaler"] = torch.ones(out, dtype=p.dtype)
            self.state.append(s)

    @torch.no_grad()
    def step(self):
        self.t += 1
        t = self.t
        lr_t = self.lr * np.sqrt(1.0 - self.b2**t) / (1.0 - self.b1**t)
        for p, s in zip(self.tensors, self.state):
            g = p.grad
            if p.dim() > 1:
                axes = tuple(range(p.dim() - 1))
                shape = (1,) * len(axes) + (-1,)
                scaler = s["v_scaler"].reshape(shape)
                V = p / scaler
                V_norm = torch.sqrt((V**2).sum(axes))
                g_param = s["v_scaler"] * V_norm
                grad_g = (g * V).sum(axes) / V_norm
                grad_V = scaler * (g - (grad_g / V_norm).reshape(shape) * V)
                s["m_g"] = self.b1 * s["m_g"] + (1 - self.b1) * grad_g
                s["v_g"] = self.b2 * s["v_g"] + (1 - self.b2) * grad_g**2
                new_g = g_param - lr_t * s["m_g"] / (torch.sqrt(s["v_g"]) + self.eps)
                s["m"] = self.b1 * s["m"] + (1 - self.b1) * grad_V
                s["v"] = self.b2 * s["v"] + (1 - self.b2) * grad_V**2
                new_V = V - lr_t * s["m"] / (torch.sqrt(s["v"]) + self.eps)
                new_norm = torch.sqrt((new_V**2).sum(axes))
                s["v_scaler"] = new_g / new_norm
                p.copy_(s["v_scaler"].reshape(shape) * new_V)
            else:
                s["m"] = self.b1 * s["m"] + (1 - self.b1) * g
                s["v"] = self.b2 * s["v"] + (1 - self.b2) * g**2
                p.copy_(p - lr_t * s["m"] / (torch.sqrt(s["v"]) + self.eps))
            p.grad = None

    def zero_grad(self):
        for p in self.tensors:
            p.grad = None


# ---------------------------------------------------------------------------
# Generation-semantics oracle (VERDICT round 2, "Next round" item 2).
#
# Pure-NumPy f64 transcriptions of the reference generation loops:
#
# * cl_vae:  ``generate_sample`` + ``sample_x/sample_w/sample_z``
#   (``cl_vae/model.py:9-74``) through the surgery submodels
#   ``make_w_encoder``/``make_z_encoder``/``make_decoder`` (:76-128) — the
#   decoder input concat order is [w, (x_prev, z)] (:104-113) and the decoder
#   history input lags one step (``x_prev_t``, :23,40-41).
# * cl_vrnn: ``generate_sample`` + samplers (``cl_vrnn/model.py:9-96``)
#   through the STATEFUL surgery submodels (:98-162): the w head is chunked
#   over the seed (the reference bound is ``x_seed.shape[1]`` — the PITCH
#   axis, quirk Q7 — kept behind ``q7_reference``), the z-encoder LSTM of
#   ``make_z_encoder`` is freshly initialized and its weights NEVER copied
#   (quirk Q3, :116-133) — reproduced by passing ``encoder_override`` params,
#   while the default shares the trained weights (the fixed behavior this
#   framework ships), and the decoder input concat order is [(Xp,) Z, W]
#   (:142-148).
#
# Every random draw is an explicit argument (eps_w / eps_z / u / u_discrete),
# so the JAX noise-explicit samplers (`sampling/generate.py`) can be driven
# with identical draws and compared frame for frame.
# ---------------------------------------------------------------------------


def _np_dense(p, x, act=None):
    y = np.asarray(x, dtype=np.float64) @ np.asarray(p["kernel"], dtype=np.float64)
    y = y + np.asarray(p["bias"], dtype=np.float64)
    if act == "relu":
        y = np.maximum(y, 0.0)
    elif act == "sigmoid":
        y = 1.0 / (1.0 + np.exp(-y))
    return y


def _np_sample_w(w_mean, w_log_var, eps_w, add_noise):
    """sample_w, nsamps=1 branch (cl_vae/model.py:47-66): logit draw, appended
    zero, raw softmax. ``add_noise=False`` keeps the mean logits."""
    w_norm = w_mean + (np.exp(w_log_var / 2) * eps_w if add_noise else 0.0)
    w0 = np.concatenate([w_norm, np.zeros(w_norm.shape[:-1] + (1,))], axis=-1)
    return np.exp(w0) / np.sum(np.exp(w0), axis=-1, keepdims=True)


def _np_sample_w_discrete(w, u):
    """sample_w_discrete (cl_vrnn/model.py:65-69): ``np.random.choice(len(w),
    p=w/w.sum())`` is the inverse-CDF draw ``searchsorted(cumsum(p), u)``;
    the uniform is explicit here."""
    p = w / w.sum()
    idx = int(np.searchsorted(np.cumsum(p), u, side="right"))
    wn = np.zeros_like(w)
    wn[min(idx, len(w) - 1)] = 1.0
    return wn


class RefGenCLVAE:
    """cl_vae/model.py:9-42 ``generate_sample`` with explicit noise.

    ``params_np``: the same pytree layout the JAX model uses (verbatim
    Keras layer names). ``intermediate_dim==0`` selects the no-hidden
    branches of the surgery models (:93-100, :117-121).
    """

    def __init__(self, params_np, intermediate_dim, use_x_prev=False):
        self.p = jax_tree_to_np(params_np)
        self.intermediate_dim = intermediate_dim
        self.use_x_prev = use_x_prev

    def _encode_w(self, x):
        h_w = _np_dense(self.p["h_w"], x, "relu")
        return _np_dense(self.p["w_mean"], h_w), _np_dense(self.p["w_log_var"], h_w)

    def _encode_z(self, x, w):
        xw = np.concatenate([x, w], axis=-1)
        h = _np_dense(self.p["h"], xw, "relu") if self.intermediate_dim > 0 else xw
        return _np_dense(self.p["z_mean"], h), _np_dense(self.p["z_log_var"], h)

    def _decode(self, w, z, x_prev_t):
        xpz = np.concatenate([x_prev_t, z], axis=-1) if self.use_x_prev else z
        wz = np.concatenate([w, xpz], axis=-1)
        h = _np_dense(self.p["decoder_h"], wz, "relu") if self.intermediate_dim > 0 else wz
        return _np_dense(self.p["x_decoded_mean"], h, "sigmoid")

    def generate(self, x_seed, nsteps, eps_w, eps_z, u, w_val=None,
                 use_z_prior=False, w_sample=False):
        """Transcribes generate_sample (cl_vae/model.py:9-42) line for line.

        ``x_seed [D]``; ``eps_w [1, K-1]``; ``eps_z [nsteps, L]``;
        ``u [nsteps, D]`` uniforms for ``sample_x`` (:44-45, ``u <= p``).
        Returns (Xs [nsteps, D], probs [nsteps, D], w_t).
        """
        original_dim = x_seed.shape[0]
        Xs = np.zeros([nsteps, original_dim])
        probs = np.zeros([nsteps, original_dim])
        x_prev = np.asarray(x_seed, dtype=np.float64)[None, :]
        x_prev_t = x_prev
        if w_val is None:
            w_t = _np_sample_w(*self._encode_w(x_prev), eps_w, add_noise=w_sample)
        else:
            w_t = np.asarray(w_val, dtype=np.float64)[None, :]
        for t in range(nsteps):
            z_mean, z_log_var = self._encode_z(x_prev, w_t)
            if use_z_prior:  # sample_z((0*z_mean, 0*z_log_var)) (:30-31)
                z_t = 0 * z_mean + np.exp(0 * z_log_var / 2) * eps_z[t]
            else:
                z_t = z_mean + np.exp(z_log_var / 2) * eps_z[t]
            x_mean = self._decode(w_t, z_t, x_prev_t)
            x_t = 1.0 * (u[t] <= x_mean)  # sample_x (:44-45)
            Xs[t] = x_t
            probs[t] = x_mean
            x_prev_t = x_prev  # history lags one step (:40-41)
            x_prev = x_t
        return Xs, probs, w_t[0]


class _RefStatefulLSTM:
    """Keras 2.0 stateful batch-1 LSTM cell (state persists across predict
    calls, ``cl_vrnn/model.py:119,144`` ``stateful=True``)."""

    def __init__(self, p):
        self.p = {k: np.asarray(v, dtype=np.float64) for k, v in p.items()}
        H = self.p["recurrent_kernel"].shape[0]
        self.h = np.zeros((1, H))
        self.c = np.zeros((1, H))

    def reset_states(self):
        self.h[:] = 0.0
        self.c[:] = 0.0

    def step(self, x_t):
        H = self.p["recurrent_kernel"].shape[0]
        z = x_t @ self.p["kernel"] + self.h @ self.p["recurrent_kernel"] + self.p["bias"]
        hard_sig = lambda a: np.clip(0.2 * a + 0.5, 0.0, 1.0)
        i, f = hard_sig(z[:, :H]), hard_sig(z[:, H:2*H])
        o = hard_sig(z[:, 3*H:])
        self.c = f * self.c + i * np.tanh(z[:, 2*H:3*H])
        self.h = o * np.tanh(self.c)
        return self.h


class RefGenCLVRNN:
    """cl_vrnn/model.py:9-60 ``generate_sample`` with explicit noise.

    ``encoder_override``: params for the z-encoder LSTM. The reference's
    ``make_z_encoder`` builds a FRESH LSTM and never copies the trained
    weights (quirk Q3, cl_vrnn/model.py:116-133) — pass a randomly
    initialized pytree here to reproduce that behavior; default ``None``
    shares the trained weights (the fixed behavior, matching this
    framework's samplers).

    ``q7_reference``: bound the w-inference chunk loop by
    ``x_seed.shape[1]`` — the pitch axis (quirk Q7, :35-39) — instead of the
    time axis. Identical for seeds up to 88 frames.
    """

    def __init__(self, params_np, intermediate_dim, seq_length, use_x_prev=False,
                 encoder_override=None, q7_reference=True):
        self.p = jax_tree_to_np(params_np)
        self.seq_length = seq_length
        self.use_x_prev = use_x_prev
        self.q7_reference = q7_reference
        enc_p = encoder_override if encoder_override is not None else self.p["encoder_h"]
        self.enc_lstm = _RefStatefulLSTM(enc_p)
        self.dec_lstm = _RefStatefulLSTM(self.p["decoder_h"])

    def _encode_w(self, x_chunk):
        """make_w_encoder (cl_vrnn/model.py:98-114): Flatten -> hW -> Wargs."""
        flat = np.asarray(x_chunk, dtype=np.float64).reshape(1, -1)
        hW = _np_dense(self.p["hW"], flat, "relu")
        Wargs = _np_dense(self.p["Wargs"], hW)
        K1 = Wargs.shape[-1] // 2
        return Wargs[:, :K1], Wargs[:, K1:]

    def _encode_z_step(self, x_t, w):
        xw = np.concatenate([x_t, w], axis=-1)
        h = self.enc_lstm.step(xw)
        return _np_dense(self.p["Z_mean"], h), _np_dense(self.p["Z_log_var"], h)

    def _decode_step(self, z_t, x_prev, w):
        """make_decoder input order: concat([(Xp,) Z], W) (cl_vrnn/model.py:138-148)."""
        xpz = np.concatenate([x_prev, z_t], axis=-1) if self.use_x_prev else z_t
        xpz = np.concatenate([xpz, w], axis=-1)
        h = self.dec_lstm.step(xpz)
        return _np_dense(self.p["X_decoded_mean"], h, "sigmoid")

    def infer_w(self, x_seed, eps_w_chunks, w_sample=False, w_discrete=False,
                u_discrete=None):
        """w inference (cl_vrnn/model.py:34-44): mean of Logistic-Normal samples
        over seq_length chunks. ``eps_w_chunks [n_chunks, K-1]``."""
        x_seed = np.asarray(x_seed, dtype=np.float64)
        ntms = x_seed.shape[1] if self.q7_reference else x_seed.shape[0]
        w_ts, ci = [], 0
        for i in np.arange(0, ntms, self.seq_length):
            xcs = x_seed[i:i + self.seq_length]
            if xcs.shape[0] == self.seq_length:
                w_ts.append(_np_sample_w(*self._encode_w(xcs[None, :]),
                                         eps_w_chunks[ci], add_noise=w_sample))
                ci += 1
        w_t = np.vstack(w_ts).mean(axis=0)[None, :]
        if w_discrete:
            w_t = _np_sample_w_discrete(w_t[0], u_discrete)[None, :]
        return w_t

    def generate(self, x_seed, nsteps, eps_z, u, w_t):
        """The stateful loop (cl_vrnn/model.py:22-60): reset states, seed
        frames teacher-forced, then free-run; returns post-seed frames.

        ``eps_z [nseed+nsteps, L]``, ``u [nseed+nsteps, D]``; ``w_t [1, K]``
        from :meth:`infer_w` or a one-hot override (w_val, :44-45).
        """
        self.enc_lstm.reset_states()
        self.dec_lstm.reset_states()
        x_seed = np.asarray(x_seed, dtype=np.float64)
        original_dim = x_seed.shape[-1]
        nseedsteps = x_seed.shape[0] if x_seed.ndim > 1 else 0
        total = nsteps + nseedsteps
        Xs = np.zeros([total, original_dim])
        probs = np.zeros([total, original_dim])
        x_prev = x_seed[None, :] if nseedsteps == 0 else None
        for t in range(total):
            if t < nseedsteps:
                x_prev = x_seed[t][None, :]
            z_mean, z_log_var = self._encode_z_step(x_prev, w_t)
            z_t = z_mean + np.exp(z_log_var / 2) * eps_z[t]  # sample_z (:92-96)
            x_mean = self._decode_step(z_t, x_prev, w_t)
            x_t = 1.0 * (u[t] <= x_mean)  # sample_x (:62-63)
            x_prev = x_t
            Xs[t] = x_t
            probs[t] = x_mean
        return Xs[nseedsteps:], probs[nseedsteps:]


def jax_tree_to_np(params):
    """Nested dict of arrays -> nested dict of f64 NumPy arrays."""
    return {
        name: {k: np.asarray(v, dtype=np.float64) for k, v in layer.items()}
        for name, layer in params.items()
    }


def train_steps(model, opt: RefAdamWN, batches, noises, weights=(1.0, 1.0, 1.0)):
    """Run N oracle train steps; returns the per-step total losses.

    ``batches``: list of dicts with x/y/w (and optional x_prev) NumPy arrays.
    ``noises``: list of (eps_w, eps_z) NumPy arrays, one per step — feed the
    SAME draws to the JAX side for step-for-step comparison.
    """
    kl_w, class_w, w_kl_w = weights
    out = []
    for batch, (eps_w, eps_z) in zip(batches, noises):
        tt = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)
        total, _ = model.losses(
            tt(batch["x"]), tt(batch["y"]), tt(batch["w"]), tt(eps_w), tt(eps_z),
            x_prev=tt(batch["x_prev"]) if "x_prev" in batch else None,
            kl_weight=kl_w, class_weight=class_w, w_kl_weight=w_kl_w,
        )
        opt.zero_grad()
        total.backward()
        out.append(float(total.detach()))
        opt.step()
    return out
