"""Evaluate a trained model's test NLL (importance-sampled, nats/frame).

The eval entry point the reference lacked (its ``logmeanexp``/``LL_frame``
helpers were defined but never wired to a driver, SURVEY §5). Run as

    python -m classifying_vae_lstm_tpu.cli.evaluate -i <model.npz> --family cl_vae
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PianoData
from ..evaluation.nll import iw_nll_dataset
from . import common


def evaluate(args):
    if args.family == "auto":
        # cl_vae checkpoints carry intermediate_class_dim; cl_vrnn ones don't
        from ..train.checkpoint import load_model_args

        margs_probe = load_model_args(args.model_file)
        args.family = "cl_vae" if "intermediate_class_dim" in margs_probe else "cl_vrnn"
    params, cfg, margs = common.load_model(args.model_file, args.family)
    if args.family == "cl_vrnn":
        cfg = common.resolve_lstm_backend(cfg, args.lstm_backend)
        if args.dp > 1 and cfg.lstm_backend == "pallas":
            # a pallas_call has no GSPMD partitioning rule; the sharded
            # estimator must run the XLA scan
            print("note: --dp forces lstm_backend=xla (pallas is not partitionable)")
            cfg = common.resolve_lstm_backend(cfg, "xla")
    # batch_size=1 here: PianoData truncates every split to a multiple of its
    # batch_size (utils/pianoroll.py:154-158); the estimator pads the final
    # batch itself, so the headline NLL covers 100% of test windows
    if args.family == "cl_vae":
        P = PianoData(args.train_file, batch_size=1, seq_length=margs["seq_length"],
                      return_y_next=margs.get("predict_next", False) or margs.get("use_x_prev", False),
                      squeeze_x=True, squeeze_y=True)
        if margs["seq_length"] > 1:
            # the pruning mask must match the one TRAINING computed: rebuild
            # the training-time batching (batch-size truncation changes which
            # windows vote for 'active') and reuse its mask here
            P_mask = PianoData(args.train_file, batch_size=margs.get("batch_size", 100),
                               seq_length=margs["seq_length"],
                               return_y_next=margs.get("predict_next", False)
                               or margs.get("use_x_prev", False),
                               squeeze_x=True, squeeze_y=True)
            dim = common.prune_and_flatten_cl_vae(
                P, margs["seq_length"], common.active_pitch_mask(P_mask))
            if dim != margs["original_dim"]:
                raise ValueError(
                    f"pruned width {dim} != checkpoint original_dim "
                    f"{margs['original_dim']} — was the model trained on a "
                    f"different --train_file?")
        if margs["n_classes"] == 1:  # vanilla VAE: key labels collapse to 0
            for split in ("train", "valid", "test"):
                setattr(P, f"{split}_song_keys", np.zeros_like(getattr(P, f"{split}_song_keys")))
        data = common.build_cl_vae_datasets(P, margs["n_classes"], cfg.use_x_prev)["test"]
    else:
        P = PianoData(args.train_file, batch_size=1, seq_length=margs["seq_length"],
                      return_y_next=margs.get("predict_next", False) or margs.get("use_x_prev", False),
                      return_y_hist=True, squeeze_x=False, squeeze_y=False)
        data = common.build_cl_vrnn_datasets(P, margs["n_classes"], cfg.use_x_prev)["test"]

    data = {k: v for k, v in data.items() if k in ("x", "y", "x_prev")}
    if args.dp > 1:
        # shard the (embarrassingly parallel) estimator over a data mesh
        from ..evaluation.nll import iw_nll_dataset_dp
        from ..parallel import make_mesh

        mesh = make_mesh(n_data=args.dp, n_model=1)
        nlls = np.asarray(
            iw_nll_dataset_dp(params, cfg, data, jax.random.PRNGKey(args.seed),
                              args.n_samples, args.batch_size, args.family, mesh)
        )
    else:
        nlls = np.asarray(
            iw_nll_dataset(params, cfg, data, jax.random.PRNGKey(args.seed),
                           args.n_samples, args.batch_size, args.family)
        )
    out = {
        "test_nll_nats_per_frame": round(float(nlls.mean()), 4),
        "n_importance_samples": args.n_samples,
        "n_test_examples": int(len(nlls)),
        "family": args.family,
        "train_file": args.train_file,
    }
    print(json.dumps(out))
    return out


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--model_file", type=str, required=True)
    parser.add_argument("--family", type=str, default="auto",
                        choices=["auto", "cl_vae", "cl_vrnn"])
    parser.add_argument("--n_samples", type=int, default=64, help="importance samples per datapoint")
    parser.add_argument("--batch_size", type=int, default=200)
    parser.add_argument("--train_file", type=str, default=common.DEFAULT_TRAIN_FILE)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dp", type=int, default=1,
                        help="shard the NLL estimator over this many devices "
                             "(data-parallel; identical numerics)")
    parser.add_argument("--lstm_backend", type=str, default="keep",
                        choices=["keep", "auto", "xla", "pallas"],
                        help="LSTM backend override for this forward-dominated path; "
                             "'keep' = checkpoint's setting (exact numerics), 'auto' = "
                             "Pallas fused kernel + bf16 at hidden>=512 on TPU (measured "
                             "1.2-1.4x over the XLA scan, artifacts/pallas_scale_bench.json)")
    return parser


def _main():
    common.enable_compile_cache()
    evaluate(build_parser().parse_args())


if __name__ == "__main__":
    _main()
