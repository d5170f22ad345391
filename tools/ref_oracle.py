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
        w0 = torch.cat([w_norm, torch.zeros_like(w_norm[:, :1])], dim=-1)
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
        W0 = torch.cat([W_samp, torch.zeros_like(W_samp[:, :1])], dim=-1)
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
