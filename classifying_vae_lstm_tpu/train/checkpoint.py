"""Checkpointing: the reference's "args.json + weights" contract.

The reference saves three files per run (``save_model_in_pieces``,
``utils/model_utils.py:160-167``): ``<run>.yaml`` (architecture dump),
``<run>.json`` (the full argparse namespace) and ``<run>.h5`` (weights-only,
save-best-only). Loading never uses the yaml (Keras Lambda bug); it re-runs
``get_model`` from the json args and loads weights
(``cl_vae/model.py:226-239``).

We keep that contract: ``<run>.json`` is the verbatim config namespace,
``<run>.npz`` holds the flattened param pytree (np.savez — portable, no h5py
dependency), ``<run>.yaml`` is an architecture/shape dump (JSON is a YAML
subset, so the file is valid YAML). As an extension over the reference we can
also checkpoint optimizer state (``<run>.opt.npz``) for true mid-training
resume — the reference can only load-for-sampling (SURVEY §5).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_checkpoint(path_npz, params, opt_state=None, epoch: int | None = None):
    """Write params (and optionally optimizer state + epoch) as .npz.

    The opt-state file enables true mid-training resume — an extension over
    the reference, whose checkpoints are weights-only load-for-sampling
    (SURVEY §5 checkpoint/resume).
    """
    np.savez(path_npz, **_flatten(params))
    if opt_state is not None:
        flat = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(jax.tree.leaves(opt_state))}
        if epoch is not None:
            flat["__epoch__"] = np.asarray(epoch)
        np.savez(path_npz.replace(".npz", ".opt.npz"), **flat)


def load_checkpoint(path_npz):
    """Read a param pytree from .npz."""
    with np.load(path_npz) as f:
        return _unflatten({k: f[k] for k in f.files})


def load_opt_state(path_opt_npz, template_state):
    """Read optimizer state saved by :func:`save_checkpoint`.

    ``template_state`` (e.g. ``optimizer.init(params)``) provides the pytree
    structure. Returns (opt_state, epoch) where epoch is the epoch the
    checkpoint was written at (0 if unrecorded).
    """
    with np.load(path_opt_npz) as f:
        epoch = int(f["__epoch__"]) if "__epoch__" in f.files else 0
        n = len([k for k in f.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(f[f"leaf_{i}"]) for i in range(n)]
    structure = jax.tree.structure(template_state)
    return jax.tree.unflatten(structure, leaves), epoch


def save_model_in_pieces(params, args, model_dir=None, run_name=None):
    """Write ``<run>.yaml`` (arch dump) + ``<run>.json`` (args namespace).

    Mirrors ``utils/model_utils.py:160-167``; ``args`` may be an argparse
    Namespace or a plain dict.
    """
    d = vars(args) if not isinstance(args, dict) else args
    model_dir = model_dir or d["model_dir"]
    run_name = run_name or d["run_name"]
    os.makedirs(model_dir, exist_ok=True)
    arch = {k: list(np.shape(v)) for k, v in _flatten(params).items()}
    with open(os.path.join(model_dir, run_name + ".yaml"), "w") as f:
        json.dump(arch, f, indent=2)  # JSON is valid YAML
    with open(os.path.join(model_dir, run_name + ".json"), "w") as f:
        json.dump({k: v for k, v in d.items() if _json_ok(v)}, f)
    return os.path.join(model_dir, run_name + ".npz")


def _json_ok(v):
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


def save_checkpoint_orbax(path_dir, params, opt_state=None, epoch: int | None = None):
    """Orbax-backed checkpoint (optional production backend, SURVEY §5).

    Writes a versioned checkpoint directory via orbax's PyTreeCheckpointer;
    the flat-.npz contract (:func:`save_checkpoint`) remains the default for
    reference parity. Returns the checkpoint path.
    """
    import orbax.checkpoint as ocp

    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = jax.tree.map(np.asarray, opt_state)
    if epoch is not None:
        payload["epoch"] = np.asarray(epoch)
    ckptr = ocp.PyTreeCheckpointer()
    import os

    path_dir = os.path.abspath(path_dir)
    ckptr.save(path_dir, payload, force=True)
    return path_dir


def load_checkpoint_orbax(path_dir, template=None):
    """Read an orbax checkpoint written by :func:`save_checkpoint_orbax`.

    Returns the saved payload dict (params / optional opt_state / epoch).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path_dir, item=template)
    return restored


def load_model_args(model_file):
    """Read the args namespace next to a weights file (reference cl_vae/model.py:232)."""
    json_path = model_file.replace(".npz", ".json").replace(".h5", ".json")
    with open(json_path) as f:
        return json.load(f)
