"""Shared CLI plumbing: dataset assembly, model (re)construction, loading.

Keeps the reference's config contract: the argparse namespace doubles as the
model config, is serialized verbatim to ``<run>.json`` and reloaded as
``margs`` at sampling time (``cl_vae/train.py:76-121``,
``utils/model_utils.py:165-167``, ``cl_vae/model.py:226-239``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data import PianoData
from ..data.pianoroll import to_categorical
from ..models import cl_vae, cl_vrnn
from ..train.checkpoint import load_checkpoint, load_model_args, load_opt_state

DEFAULT_TRAIN_FILE = "/root/reference/data/input/JSB Chorales_Cs.pickle"


def enable_compile_cache():
    """Persistent XLA compile cache: repeat CLI runs skip recompilation."""
    import os

    import jax

    cache = os.environ.get("CVL_COMPILE_CACHE", os.path.expanduser("~/.cache/cvl_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # backend already initialized with other settings


def active_pitch_mask(P: PianoData) -> np.ndarray:
    """Boolean [88] mask of pitch columns played anywhere in ALL splits'
    x and y (reference ``cl_vae/train.py:22-24``)."""
    X = np.vstack([P.x_train, P.x_valid, P.x_test, P.y_train, P.y_valid, P.y_test])
    return X.sum(axis=0).sum(axis=0) > 0


def prune_and_flatten_cl_vae(P: PianoData, seq_length: int, ix: np.ndarray | None = None) -> int:
    """cl_vae seq-concat mode: drop never-played pitch columns, flatten windows.

    Reference ``cl_vae/train.py:21-30``; returns the new original_dim. Pass
    ``ix`` to prune with a mask computed elsewhere — evaluation must reuse the
    mask the TRAINING batching produced (batch-size truncation changes which
    windows vote), or the flattened width can disagree with the checkpoint.
    """
    if ix is None:
        ix = active_pitch_mask(P)
    for attr in ("x_train", "x_valid", "x_test", "y_train", "y_valid", "y_test"):
        a = getattr(P, attr)
        setattr(P, attr, np.ascontiguousarray(a[:, :, ix].reshape((len(a), -1))))
    return int(ix.sum()) * seq_length


def build_cl_vae_datasets(P: PianoData, n_classes: int, use_x_prev: bool):
    """Assemble device-ready train/valid dicts for the cl_vae trainer.

    The reference wires ``use_x_prev`` as inputs ``[y, x]`` — the model
    autoencodes frame t+1 with history = frame t (``cl_vae/train.py:58-63``).
    """
    w = {
        "train": to_categorical(P.train_song_keys, n_classes),
        "valid": to_categorical(P.valid_song_keys, n_classes),
        "test": to_categorical(P.test_song_keys, n_classes),
    }
    out = {}
    for split in ("train", "valid", "test"):
        x = getattr(P, f"x_{split}")
        y = getattr(P, f"y_{split}")
        d = {"y": jnp.asarray(y), "w": jnp.asarray(w[split])}
        if use_x_prev:
            d["x"] = jnp.asarray(y)
            d["x_prev"] = jnp.asarray(x)
        else:
            d["x"] = jnp.asarray(x)
        out[split] = d
    return out


def build_cl_vrnn_datasets(P: PianoData, n_classes: int, use_x_prev: bool):
    """Sequence datasets: x/y are [N, T, 88] (reference cl_vrnn/train.py:51-58)."""
    w = {
        "train": to_categorical(P.train_song_keys, n_classes),
        "valid": to_categorical(P.valid_song_keys, n_classes),
        "test": to_categorical(P.test_song_keys, n_classes),
    }
    out = {}
    for split in ("train", "valid", "test"):
        x = getattr(P, f"x_{split}")
        y = getattr(P, f"y_{split}")
        d = {"y": jnp.asarray(y), "w": jnp.asarray(w[split])}
        if use_x_prev:
            d["x"] = jnp.asarray(y)
            d["x_prev"] = jnp.asarray(x)
        else:
            d["x"] = jnp.asarray(x)
        out[split] = d
    return out


def cl_vae_config_from_args(margs: dict) -> cl_vae.Config:
    return cl_vae.Config(
        original_dim=margs["original_dim"],
        intermediate_dim=margs["intermediate_dim"],
        latent_dim=margs["latent_dim"],
        intermediate_class_dim=margs["intermediate_class_dim"],
        n_classes=margs["n_classes"],
        use_x_prev=margs.get("use_x_prev", False),
        w_log_var_prior=margs.get("w_log_var_prior", 0.0),
        gen_backend=margs.get("gen_backend", "xla"),
        bf16_compute=margs.get("bf16_compute", False),
        # absent key (pre-round-5 checkpoints) -> 'xla': old checkpoints must
        # reload onto the exact path they trained with (cf. two_cell)
        train_backend=margs.get("train_backend", "xla"),
    )


def cl_vrnn_config_from_args(margs: dict) -> cl_vrnn.Config:
    return cl_vrnn.Config(
        original_dim=margs["original_dim"],
        intermediate_dim=margs["intermediate_dim"],
        latent_dim=margs["latent_dim"],
        seq_length=margs["seq_length"],
        n_classes=margs["n_classes"],
        use_x_prev=margs.get("use_x_prev", False),
        w_log_var_prior=margs.get("w_log_var_prior", 0.0),
        lstm_backend=margs.get("lstm_backend", "xla"),
        bf16_compute=margs.get("bf16_compute", False),
        # args.json round-trips the tuple as a JSON list; re-tuple so the
        # Config stays hashable (it rides through jit as a static argument)
        fusion=tuple(margs["fusion"]) if margs.get("fusion") else None,
        # absent key (pre-round-5 checkpoints) -> False, NOT auto: an old
        # pallas checkpoint must reload onto the exact two-kernel path it
        # trained with, not silently switch to the two-cell kernel
        two_cell=margs.get("two_cell", False),
    )


def resolve_lstm_backend(cfg, choice: str = "auto"):
    """Pick the LSTM backend (evaluate/serve defaults; train opts in).

    'keep' leaves the checkpoint's setting (evaluate's default: the headline
    NLL numerics stay exactly what the checkpoint trained with). 'auto'
    picks the Pallas kernels + bf16 operands/streams at hidden>=512 on TPU —
    measured forward 1.6x over the XLA scan (85 achieved TFLOP/s at hidden
    1024, `artifacts/pallas_scale_bench.json`) and the full train step up to
    3.1x (45% MFU vs 14%, `artifacts/train_scale_bench.json`; pallas won
    every hidden>=512 config probed incl. batch 200 — the backward is a
    second Pallas kernel, see ops/pallas_lstm.py); at the reference's 88-wide
    sizes XLA's pipelined scan wins and is kept. The upper bound is
    rk_fits_vmem's measured ceiling — H2560 bf16 (rk 50 MiB resident) runs
    the proj-fused grad step at 149.0 TFLOP/s, 2.96x the XLA scan at the
    same shape (`artifacts/fused_kernel_exp.json`, h2560 phase; H2048:
    144.1 vs 44.1 — the drk/full rungs do not fit VMEM at either size, so
    resolve_fusion downgrades the triple up there); above it (H3072+,
    unprobed) the XLA scan is used. When pallas is
    picked the kernel-fusion triple is pinned to the SIZE-GATED policy
    defaults (ops/pallas_lstm.resolve_fusion(hidden_dim=...)) so args.json
    records what ran.
    """
    import dataclasses

    import jax

    if choice == "keep":
        return cfg
    if choice == "auto":
        from ..ops.pallas_lstm import rk_fits_vmem

        use_pallas = (
            cfg.intermediate_dim >= 512
            and rk_fits_vmem(cfg.intermediate_dim, bf16=True)
            and not getattr(cfg, "remat", False)  # pallas rejects remat
            and jax.default_backend() == "tpu"
        )
        if use_pallas:
            from ..ops.pallas_lstm import resolve_fusion
            from ..ops.pallas_two_cell import should_use

            new = dataclasses.replace(
                cfg, lstm_backend="pallas", bf16_compute=True,
                fusion=cfg.fusion
                or resolve_fusion(None, hidden_dim=cfg.intermediate_dim))
            if getattr(new, "two_cell", None) is None:
                # pin the two-cell decision (round 5) so args.json records it
                new = dataclasses.replace(new, two_cell=bool(should_use(new)))
            return new
        return dataclasses.replace(cfg, lstm_backend="xla")
    return dataclasses.replace(cfg, lstm_backend=choice)


def resolve_gen_backend(cfg, choice: str = "auto"):
    """Pick the cl_vae GENERATION backend (extension flag on sample/serve).

    'keep' leaves the checkpoint's setting; 'auto' picks the fused
    whole-generation Pallas kernel (:mod:`..ops.pallas_generate_vae`) on TPU
    at hidden>=512 when the weights fit VMEM — generation is the one cl_vae
    path with a serial loop XLA can't pin weights across, the same traffic
    argument as the cl_vrnn fused sampler. Measured on TPU v5e
    (`artifacts/generate_bench.json`, vae rows): 1.34x at H512 f32, 1.7x at
    H1024 bf16 (2.8x int8), 5.8x at the D976/H5120 seq-concat scale; at the
    reference's 88-wide layers it is a wash-to-loss (1.03x at D88, 0.88x at
    D976) against XLA's fully-fused dense step, so 'auto' keeps XLA there.
    The f32 kernel is frame-exact vs the XLA scan, so 'auto' never changes
    sampled output below the bf16/int8 VMEM-escalation sizes.
    """
    import dataclasses

    import jax

    if choice == "keep":
        return cfg
    if choice == "auto":
        from ..ops.pallas_generate_vae import fits

        if (cfg.intermediate_dim >= 512 and fits(cfg)
                and jax.default_backend() == "tpu"):
            return dataclasses.replace(cfg, gen_backend="pallas")
        return dataclasses.replace(cfg, gen_backend="xla")
    return dataclasses.replace(cfg, gen_backend=choice)


def make_dp_mesh(args, cfg, draw_apply_noise):
    """``--dp N`` plumbing shared by both train CLIs (SURVEY §2 parallelism).

    Returns ``(mesh, noise_fn)`` for :class:`..train.Trainer` — a 1-axis
    ``('data',)``-major mesh of N devices and the model's global-batch noise
    hook, which is what makes DP training bit-identical to single-device
    (``models.*.draw_apply_noise``). Errors clearly on invalid combinations;
    ``args.dp`` rides into args.json with the rest of the namespace.
    """
    dp = getattr(args, "dp", 0)
    if not dp:
        return None, None
    import jax

    n_dev = len(jax.devices())
    if dp > n_dev:
        raise ValueError(f"--dp {dp}: only {n_dev} devices available")
    if args.batch_size % dp != 0:
        raise ValueError(f"--dp {dp} must divide --batch_size {args.batch_size}")
    if getattr(args, "streaming", False):
        raise ValueError("--dp does not combine with --streaming (host-side batches)")
    from ..parallel import make_mesh

    mesh = make_mesh(n_data=dp, n_model=1)
    noise_fn = lambda k: draw_apply_noise(k, cfg, args.batch_size)
    print(f"data-parallel training over {dp} devices (shard_map + gradient psum)")
    return mesh, noise_fn


def make_log_fn(args):
    """--do_log sink: JSONL metrics + TensorBoard scalar events.

    The reference's ``--do_log`` wires a Keras TensorBoard callback
    (``utils/model_utils.py:149-151``); we emit both a ``<run>.jsonl`` (easy
    to grep/plot) and a real TB event file under ``<log_dir>/<run_name>/``
    (:mod:`..utils.tb_events`), viewable next to the profiler traces.
    """
    import json
    import os

    from ..utils.tb_events import ScalarEventWriter

    os.makedirs(args.log_dir, exist_ok=True)
    path = os.path.join(args.log_dir, args.run_name + ".jsonl")
    f = open(path, "a")
    tb = ScalarEventWriter(os.path.join(args.log_dir, args.run_name))

    def log_fn(epoch, logs):
        f.write(json.dumps({"epoch": epoch, **logs}) + "\n")
        f.flush()
        tb.add_scalars(epoch, {k: v for k, v in logs.items()
                               if isinstance(v, (int, float))})

    return log_fn


def maybe_resume(args, ckpt_path: str, optimizer, params):
    """Resume support (extension): load ``<run>.last.npz`` + optimizer state.

    Returns (params, fit_kwargs). With ``--resume`` and an existing last
    checkpoint, params/opt_state/epoch are restored so training continues
    exactly where it stopped — the mid-training resume the reference lacks
    (SURVEY §5: its checkpoints are weights-only load-for-sampling).
    """
    import os

    last = ckpt_path.replace(".npz", ".last.npz")
    opt_file = last.replace(".npz", ".opt.npz")
    if not getattr(args, "resume", False) or not os.path.exists(last):
        return params, {}
    params = load_checkpoint(last)
    kwargs = {}
    if os.path.exists(opt_file):
        template = optimizer.init(params)
        opt_state, epoch = load_opt_state(opt_file, template)
        kwargs = {"opt_state": opt_state, "initial_epoch": epoch}
        print(f"resuming from {last} at epoch {epoch}")
    return params, kwargs


def load_model(model_file: str, family: str, no_x_prev: bool = False):
    """args.json + weights -> (params, cfg, margs) (reference cl_vae/model.py:226-239)."""
    margs = load_model_args(model_file)
    if no_x_prev or "use_x_prev" not in margs:
        margs["use_x_prev"] = False
    if family == "cl_vae":
        cfg = cl_vae_config_from_args(margs)
    else:
        cfg = cl_vrnn_config_from_args(margs)
    weights_file = model_file if model_file.endswith(".npz") else model_file.replace(".h5", ".npz")
    params = load_checkpoint(weights_file)
    return params, cfg, margs
