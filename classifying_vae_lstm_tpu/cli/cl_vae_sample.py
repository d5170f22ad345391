"""Generate music from a trained Classifying VAE. Flag-for-flag port of the
reference CLI (``cl_vae/sample.py:35-61``); run as

    python -m classifying_vae_lstm_tpu.cli.cl_vae_sample <run_name> -i <model.npz> [flags]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PianoData, write_sample, write_sample_wav
from ..data.pianoroll import to_categorical
from ..sampling.generate import generate_cl_vae_batch
from . import common


def gather_seeds(P, margs, args, key):
    """(seeds [n, D], w_vals [n, K] | None): random test frames with true-key
    one-hots, or inferred w (reference ``cl_vae/sample.py:8-15``). A user
    ``--seed_midi`` contributes its last frame n times (w always inferred —
    the true key is unknown)."""
    n, D = args.n, margs["original_dim"]
    if args.seed_midi:
        from ..data.midi import midi_to_roll

        roll = midi_to_roll(args.seed_midi)
        if len(roll) == 0:
            raise ValueError(f"{args.seed_midi} contains no notes")
        return np.tile(roll[-1][:D], (n, 1)).astype(np.float32), None
    inds = np.asarray(jax.random.randint(key, (n,), 0, len(P.x_test)))
    seeds = np.stack([P.x_test[i][0] for i in inds]).astype(np.float32)
    if args.infer_w:
        return seeds, None
    w_vals = to_categorical([P.test_song_keys[i] for i in inds], margs["n_classes"])
    return seeds, jnp.asarray(w_vals)


def sample(args):
    # resolve <model_dir>/<run_name>.npz when -i is not given (extension: the
    # reference accepts --model_dir, cl_vae/sample.py:52, but never reads it)
    model_file = args.model_file or os.path.join(args.model_dir, args.run_name + ".npz")
    params, cfg, margs = common.load_model(model_file, "cl_vae", no_x_prev=args.no_x_prev)
    cfg = common.resolve_gen_backend(cfg, args.gen_backend)
    if args.gen_backend == "auto":
        print(f"gen_backend=auto -> {cfg.gen_backend}")
    P = PianoData(args.train_file, batch_size=1, seq_length=args.t, squeeze_x=True)
    os.makedirs(args.sample_dir, exist_ok=True)
    k_seed, k_gen = jax.random.split(jax.random.PRNGKey(args.seed))
    seeds, w_vals = gather_seeds(P, margs, args, k_seed)
    # all n songs in ONE device program (w inference, noise draws, and the
    # generation scan — or the fused Pallas kernel when cfg opts in); the
    # reference generates one frame at a time per song from Python
    samples = generate_cl_vae_batch(
        params, cfg, jnp.asarray(seeds), args.t, k_gen, w_vals=w_vals,
        use_z_prior=args.use_z_prior)
    for i in range(args.n):
        write_sample(np.asarray(samples[i]), args.sample_dir, f"{args.run_name}_{i}", True)
        if args.write_wav:
            write_sample_wav(np.asarray(samples[i]), args.sample_dir, f"{args.run_name}_{i}", True)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_name", type=str, help="tag for current run")
    parser.add_argument("-n", type=int, default=1, help="number of samples")
    parser.add_argument("--use_z_prior", action="store_true",
                        help="sample z from standard normal at each timestep")
    parser.add_argument("-t", type=int, default=32, help="number of timesteps per sample")
    parser.add_argument("--infer_w", action="store_true", help="infer w when generating")
    parser.add_argument("--no_x_prev", action="store_true", help="override use_x_prev")
    parser.add_argument("--sample_dir", type=str, default="data/samples",
                        help="basedir for saving output midi files")
    parser.add_argument("--model_dir", type=str, default="data/models",
                        help="basedir for saving model weights")
    parser.add_argument("-i", "--model_file", type=str, default="",
                        help="preload model weights (no training)")
    parser.add_argument("--train_file", type=str, default=common.DEFAULT_TRAIN_FILE,
                        help="file of training data (.pickle)")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed (extension)")
    parser.add_argument("--write_wav", action="store_true",
                        help="also render samples to .wav (extension; BASELINE config 5)")
    parser.add_argument("--seed_midi", type=str, default=None,
                        help="seed generation from the last frame of this .mid file "
                             "(extension; any SMF)")
    parser.add_argument("--gen_backend", type=str, default="auto",
                        choices=["auto", "keep", "xla", "pallas"],
                        help="generation backend (extension): 'pallas' = fused "
                             "whole-generation kernel; 'auto' (default) = pallas "
                             "on TPU at hidden>=512 when the model fits VMEM "
                             "(1.3-5.8x measured, artifacts/generate_bench.json; "
                             "NOTE: at hidden sizes where f32 weights overflow "
                             "VMEM, auto escalates to bf16/int8-resident kernels "
                             "— fast but no longer bit-identical to 'xla'); "
                             "'keep' = checkpoint setting")
    return parser


def _main():
    common.enable_compile_cache()
    sample(build_parser().parse_args())


if __name__ == "__main__":
    _main()
