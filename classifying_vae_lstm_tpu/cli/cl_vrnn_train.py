"""Train the Classifying VAE+LSTM (STORN). Flag-for-flag port of the reference
CLI (``cl_vrnn/train.py:76-118``); run as

    python -m classifying_vae_lstm_tpu.cli.cl_vrnn_train <run_name> [flags]
"""

from __future__ import annotations

import argparse
import functools

import jax
import numpy as np

from ..data import PianoData
from ..models import cl_vrnn
from ..optim import init_optimizer
from ..train import Trainer, fit, save_model_in_pieces
from . import common


def train(args):
    P = PianoData(
        args.train_file,
        batch_size=args.batch_size,
        seq_length=args.seq_length,
        step_length=1,
        return_y_next=args.predict_next or args.use_x_prev,
        return_y_hist=True,
        squeeze_x=False,
        squeeze_y=False,
    )
    args.n_classes = int(len(np.unique(P.train_song_keys)))
    print(f"Training with {args.n_classes} classes.")
    assert not (args.predict_next and args.use_x_prev), "Can't use --predict_next if using --use_x_prev"
    if args.kl_anneal > 0:
        assert args.kl_anneal <= args.num_epochs, "invalid kl_anneal"
    if args.w_kl_anneal > 0:
        assert args.w_kl_anneal <= args.num_epochs, "invalid w_kl_anneal"
    # callbacks gate on max(anneals)+1; the reference's best-epoch rule uses
    # min(anneals) (quirk Q6) — both preserved
    min_epoch_cb = max(args.kl_anneal, args.w_kl_anneal) + 1
    min_epoch_best = min(args.kl_anneal, args.w_kl_anneal)

    optimizer, was_adam_wn = init_optimizer(args.optimizer)
    args.optimizer = "adam-wn" if was_adam_wn else args.optimizer
    args.two_cell = {"auto": None, "on": True, "off": False}[args.two_cell]
    cfg = common.cl_vrnn_config_from_args(vars(args))
    if args.lstm_backend == "auto":
        cfg = common.resolve_lstm_backend(cfg, "auto")
        # args.json records the RESOLVED backend/dtype so the checkpoint
        # reloads with the numerics it trained with
        args.lstm_backend = cfg.lstm_backend
        args.bf16_compute = cfg.bf16_compute
        print(f"lstm_backend=auto -> {cfg.lstm_backend}"
              + (" (bf16 operands)" if cfg.bf16_compute else "")
              + (f" fusion={cfg.fusion}" if cfg.fusion is not None else ""))
    if cfg.lstm_backend == "pallas" and cfg.fusion is None:
        # explicit --lstm_backend pallas: pin the policy-default fusion triple
        # too, so the checkpoint's numerics don't track future policy changes
        import dataclasses

        from ..ops.pallas_lstm import resolve_fusion

        cfg = dataclasses.replace(
            cfg, fusion=resolve_fusion(None, hidden_dim=cfg.intermediate_dim))
    if cfg.lstm_backend == "pallas" and cfg.two_cell is None:
        # pin the two-cell decision for the same reason as the fusion triple
        import dataclasses

        from ..ops.pallas_two_cell import should_use

        cfg = dataclasses.replace(cfg, two_cell=bool(should_use(cfg)))
    args.two_cell = cfg.two_cell  # args.json records the resolved decision
    if cfg.lstm_backend == "pallas":
        print(f"two_cell={cfg.two_cell}")
    if cfg.fusion is not None:
        args.fusion = list(cfg.fusion)  # args.json records the resolved triple
    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_fit = jax.random.split(key, 3)
    params = cl_vrnn.init(k_init, cfg)

    ckpt_path = save_model_in_pieces(params, args)
    data = common.build_cl_vrnn_datasets(P, args.n_classes, args.use_x_prev)
    print((P.x_train.shape, P.y_train.shape))

    if args.data_init:
        # real weight-norm data-dependent init (extension; see cl_vae_train)
        from ..optim.data_init import data_based_init_cl_vrnn

        first = {k: v[:100] for k, v in data["train"].items()}
        params = data_based_init_cl_vrnn(params, cfg, first, jax.random.PRNGKey(args.seed + 1))

    params, resume_kwargs = common.maybe_resume(args, ckpt_path, optimizer, params)
    loss_fn = functools.partial(_loss, cfg)
    if args.check_numerics:
        from ..train.debug import check_first_batch
        import jax.numpy as jnp

        first = {k: v[: args.batch_size] for k, v in data["train"].items()}
        check_first_batch(loss_fn, params, first, jax.random.PRNGKey(0),
                          jnp.float32(1.0), jnp.float32(args.class_weight), jnp.float32(1.0))
        print("check_numerics: first batch loss/grads finite")
    mesh, noise_fn = common.make_dp_mesh(args, cfg, cl_vrnn.draw_apply_noise)
    trainer = Trainer(loss_fn, optimizer, batch_size=args.batch_size,
                      mesh=mesh, noise_fn=noise_fn)
    params, best_params, history, _ = fit(
        trainer,
        params,
        data["train"],
        data["valid"],
        num_epochs=args.num_epochs,
        key=k_fit,
        kl_anneal=args.kl_anneal,
        w_kl_anneal=args.w_kl_anneal,
        class_weight=args.class_weight,
        patience=args.patience,
        min_epoch=min_epoch_cb,
        checkpoint_path=ckpt_path,
        log_fn=common.make_log_fn(args) if args.do_log else None,
        save_last=args.save_last or args.resume,
        trace_dir=args.trace_dir,
        streaming=args.streaming,
        stream_seed=args.seed,
        **resume_kwargs,
    )
    val_losses = history.get("val_loss", [])
    masked = [v if i >= min_epoch_best else np.inf for i, v in enumerate(val_losses)]
    best_ind = int(np.argmin(masked)) if masked else 0
    best_loss = {k: v[best_ind] for k, v in history.items() if v}
    print({k: round(v, 4) for k, v in best_loss.items()})
    return best_params, best_loss


def _loss(cfg, params, batch, key, kl_w, class_w, w_kl_w):
    return cl_vrnn.loss_and_metrics(params, cfg, batch, key, kl_w, class_w, w_kl_w)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_name", type=str, help="tag for current run")
    parser.add_argument("--batch_size", type=int, default=200, help="batch size")
    parser.add_argument("--optimizer", type=str, default="adam-wn", help="optimizer name")
    parser.add_argument("--num_epochs", type=int, default=200, help="number of epochs")
    parser.add_argument("--original_dim", type=int, default=88, help="input dim")
    parser.add_argument("--latent_dim", type=int, default=2, help="latent dim")
    parser.add_argument("--intermediate_dim", type=int, default=88, help="intermediate dim")
    parser.add_argument("--seq_length", type=int, default=16, help="sequence length (to use as history)")
    parser.add_argument("--class_weight", type=float, default=1.0, help="relative weight on classifying key")
    parser.add_argument("--predict_next", action="store_true", help="use x_t to 'autoencode' x_{t+1}")
    parser.add_argument("--do_log", action="store_true", help="save log files")
    parser.add_argument("--w_log_var_prior", type=float, default=0.0, help="log variance prior on w")
    parser.add_argument("--kl_anneal", type=int, default=0, help="number of epochs before kl loss term is 1.0")
    parser.add_argument("--w_kl_anneal", type=int, default=0, help="number of epochs before w's kl loss term is 1.0")
    parser.add_argument("--patience", type=int, default=5, help="# of epochs, for early stopping")
    parser.add_argument("--use_x_prev", action="store_true", help="use x_{t-1} to help z_t decode x_t")
    parser.add_argument("--log_dir", type=str, default="data/logs", help="basedir for saving log files")
    parser.add_argument("--model_dir", type=str, default="data/models", help="basedir for saving model weights")
    parser.add_argument("--train_file", type=str, default=common.DEFAULT_TRAIN_FILE,
                        help="file of training data (.pickle)")
    # extensions over the reference CLI
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed (extension)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <run>.last.npz with optimizer state (extension)")
    parser.add_argument("--save_last", action="store_true",
                        help="write <run>.last.npz (+opt state) every epoch for resume (extension)")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="capture a jax.profiler trace of one epoch (extension)")
    parser.add_argument("--check_numerics", action="store_true",
                        help="fail fast on NaN/Inf in the first batch's loss/grads (extension)")
    parser.add_argument("--lstm_backend", type=str, default="xla",
                        choices=["xla", "pallas", "auto"],
                        help="LSTM sequence backend (extension); 'auto' picks the "
                             "Pallas fwd+bwd kernels + bf16 operands at hidden>=512 "
                             "on TPU (1.9-2.3x the XLA scan train step)")
    parser.add_argument("--streaming", action="store_true",
                        help="host-stream training batches with device prefetch for corpora larger than HBM (extension)")
    parser.add_argument("--data_init", action="store_true",
                        help="real weight-norm data-dependent init (extension; the reference's was a no-op)")
    parser.add_argument("--dp", type=int, default=0,
                        help="train data-parallel over N devices (shard_map + gradient "
                             "psum over the mesh); must divide --batch_size; bit-identical "
                             "to single-device training (extension)")
    parser.add_argument("--two_cell", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="fuse encoder+decoder LSTMs into ONE Pallas kernel whose "
                             "chain matmuls overlap in the MXU pipeline (extension; "
                             "pallas backend only; 'auto' gates on measured win region, "
                             "resolved value recorded in args.json)")
    return parser


def _main():
    common.enable_compile_cache()
    train(build_parser().parse_args())


if __name__ == "__main__":
    _main()
