"""Train a Classifying VAE. Flag-for-flag port of the reference CLI
(``cl_vae/train.py:76-121``); run as

    python -m classifying_vae_lstm_tpu.cli.cl_vae_train <run_name> [flags]
"""

from __future__ import annotations

import argparse
import functools

import jax
import numpy as np

from ..data import PianoData
from ..models import cl_vae
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
        squeeze_x=True,
        squeeze_y=True,
    )
    if args.seq_length > 1:
        args.original_dim = common.prune_and_flatten_cl_vae(P, args.seq_length)

    if args.vanilla:
        # vanilla VAE baseline (BASELINE config 2): no key latent — w collapses
        # to the constant [1.0] simplex point and its losses vanish
        args.n_classes = 1
        for split in ("train", "valid", "test"):
            setattr(P, f"{split}_song_keys", np.zeros_like(getattr(P, f"{split}_song_keys")))
    else:
        args.n_classes = int(len(np.unique(P.train_song_keys)))
    assert not (args.predict_next and args.use_x_prev), "Can't use --predict_next if using --use_x_prev"
    if args.kl_anneal > 0:
        assert args.kl_anneal <= args.num_epochs, "invalid kl_anneal"
    if args.w_kl_anneal > 0:
        assert args.w_kl_anneal <= args.num_epochs, "invalid w_kl_anneal"
    min_epoch = max(args.kl_anneal, args.w_kl_anneal) + 1

    optimizer, was_adam_wn = init_optimizer(args.optimizer)
    args.optimizer = "adam-wn" if was_adam_wn else args.optimizer
    cfg = common.cl_vae_config_from_args(vars(args))
    if cfg.train_backend != "xla":
        # resolve + pin the decision (cf. cl_vrnn's lstm_backend/two_cell):
        # args.json records what actually ran, so reload numerics never track
        # a future auto policy
        import dataclasses

        from ..ops.pallas_vae import should_use

        cfg = dataclasses.replace(
            cfg, train_backend="pallas" if should_use(cfg) else "xla")
        args.train_backend = cfg.train_backend
        print(f"train_backend={cfg.train_backend}")
    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_fit = jax.random.split(key, 3)
    params = cl_vae.init(k_init, cfg)

    ckpt_path = save_model_in_pieces(params, args)
    data = common.build_cl_vae_datasets(P, args.n_classes, args.use_x_prev)

    if args.data_init:
        # real weight-norm data-dependent init of every dense layer, applied
        # sequentially (reference's intended loop, weightnorm.py:196-210, is a
        # silent no-op under its pinned Keras — quirk Q4); 100-sample batch
        # matches the reference call site (cl_vae/train.py:65)
        from ..optim.data_init import data_based_init_cl_vae

        first = {k: v[:100] for k, v in data["train"].items()}
        params = data_based_init_cl_vae(params, cfg, first, jax.random.PRNGKey(args.seed + 1))

    params, resume_kwargs = common.maybe_resume(args, ckpt_path, optimizer, params)
    loss_fn = functools.partial(_loss, cfg)
    if args.check_numerics:
        from ..train.debug import check_first_batch
        import jax.numpy as jnp

        first = {k: v[: args.batch_size] for k, v in data["train"].items()}
        check_first_batch(loss_fn, params, first, jax.random.PRNGKey(0),
                          jnp.float32(1.0), jnp.float32(args.class_weight), jnp.float32(1.0))
        print("check_numerics: first batch loss/grads finite")
    mesh, noise_fn = common.make_dp_mesh(args, cfg, cl_vae.draw_apply_noise)
    trainer = Trainer(loss_fn, optimizer, batch_size=args.batch_size,
                      mesh=mesh, noise_fn=noise_fn)
    log_fn = common.make_log_fn(args) if args.do_log else None
    params, best_params, history, best_loss = fit(
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
        min_epoch=min_epoch,
        checkpoint_path=ckpt_path,
        log_fn=log_fn,
        save_last=args.save_last or args.resume,
        trace_dir=args.trace_dir,
        streaming=args.streaming,
        stream_seed=args.seed,
        **resume_kwargs,
    )
    print({k: round(v, 4) for k, v in best_loss.items()})
    return best_params, best_loss


def _loss(cfg, params, batch, key, kl_w, class_w, w_kl_w):
    return cl_vae.loss_and_metrics(params, cfg, batch, key, kl_w, class_w, w_kl_w)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_name", type=str, help="tag for current run")
    parser.add_argument("--batch_size", type=int, default=100, help="batch size")
    parser.add_argument("--optimizer", type=str, default="adam-wn", help="optimizer name")
    parser.add_argument("--num_epochs", type=int, default=200, help="number of epochs")
    parser.add_argument("--original_dim", type=int, default=88, help="input dim")
    parser.add_argument("--intermediate_dim", type=int, default=88, help="intermediate dim")
    parser.add_argument("--latent_dim", type=int, default=2, help="latent dim")
    parser.add_argument("--seq_length", type=int, default=1, help="sequence length (concat)")
    parser.add_argument("--class_weight", type=float, default=1.0, help="relative weight on classifying key")
    parser.add_argument("--w_log_var_prior", type=float, default=0.0, help="w log var prior")
    parser.add_argument("--intermediate_class_dim", type=int, default=88, help="intermediate dims for classes")
    parser.add_argument("--do_log", action="store_true", help="save log files")
    parser.add_argument("--predict_next", action="store_true", help="use x_t to 'autoencode' x_{t+1}")
    parser.add_argument("--use_x_prev", action="store_true", help="use x_{t-1} to help z_t decode x_t")
    parser.add_argument("--patience", type=int, default=5, help="# of epochs, for early stopping")
    parser.add_argument("--kl_anneal", type=int, default=0, help="number of epochs before kl loss term is 1.0")
    parser.add_argument("--w_kl_anneal", type=int, default=0, help="number of epochs before w's kl loss term is 1.0")
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
    parser.add_argument("--streaming", action="store_true",
                        help="host-stream training batches with device prefetch for corpora larger than HBM (extension)")
    parser.add_argument("--bf16_compute", action="store_true",
                        help="bf16 matmul operands (f32 accumulation) on the wide layers "
                             "for SCALED training — MXU-native mode, mirrors the cl_vrnn "
                             "auto backend's dtype; at the reference's 88-wide layers it "
                             "buys nothing (extension)")
    parser.add_argument("--data_init", action="store_true",
                        help="real weight-norm data-dependent init (extension; the reference's was a no-op)")
    parser.add_argument("--vanilla", action="store_true",
                        help="vanilla VAE: drop the key latent (extension; BASELINE config 2)")
    parser.add_argument("--dp", type=int, default=0,
                        help="train data-parallel over N devices (shard_map + gradient "
                             "psum over the mesh); must divide --batch_size; bit-identical "
                             "to single-device training (extension)")
    parser.add_argument("--train_backend", type=str, default="xla",
                        choices=["xla", "auto", "pallas"],
                        help="training-step backend (extension): 'pallas' fuses the whole "
                             "dense stack fwd+bwd into one VMEM-resident kernel per "
                             "direction (ops/pallas_vae.py); 'auto' resolves to 'xla' — "
                             "the kernel measured 0.64-0.91x XLA at every probed scale "
                             "(artifacts/vae_train_kernel_exp.json); resolved value "
                             "recorded in args.json")
    return parser


def _main():
    common.enable_compile_cache()
    train(build_parser().parse_args())


if __name__ == "__main__":
    _main()
