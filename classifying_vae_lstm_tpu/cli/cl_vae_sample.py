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
from ..sampling import generate_cl_vae
from . import common


def make_sample(P, params, cfg, margs, args, key, run_name):
    """Seed from a random test window; w = true key one-hot or inferred
    (reference ``cl_vae/sample.py:8-15``)."""
    k_seed, k_gen = jax.random.split(key)
    if args.seed_midi:
        # extension: seed from the last frame of a user .mid (true key is
        # unknown, so w is inferred from the seed frame)
        from ..data.midi import midi_to_roll

        roll = midi_to_roll(args.seed_midi)
        if len(roll) == 0:
            raise ValueError(f"{args.seed_midi} contains no notes")
        x_seed = roll[-1][: margs["original_dim"]]
        w_val = None
    else:
        seed_ind = int(jax.random.randint(k_seed, (), 0, len(P.x_test)))
        x_seed = P.x_test[seed_ind][0]
        w_val = None
        if not args.infer_w:
            seed_key_ind = P.test_song_keys[seed_ind]
            w_val = jnp.asarray(to_categorical([seed_key_ind], margs["n_classes"])[0])
    sample = generate_cl_vae(
        params, cfg, jnp.asarray(x_seed), args.t, k_gen, w_val=w_val, use_z_prior=args.use_z_prior
    )
    write_sample(np.asarray(sample), args.sample_dir, run_name, True)
    if args.write_wav:
        write_sample_wav(np.asarray(sample), args.sample_dir, run_name, True)


def sample(args):
    # resolve <model_dir>/<run_name>.npz when -i is not given (extension: the
    # reference accepts --model_dir, cl_vae/sample.py:52, but never reads it)
    model_file = args.model_file or os.path.join(args.model_dir, args.run_name + ".npz")
    params, cfg, margs = common.load_model(model_file, "cl_vae", no_x_prev=args.no_x_prev)
    P = PianoData(args.train_file, batch_size=1, seq_length=args.t, squeeze_x=True)
    os.makedirs(args.sample_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for i in range(args.n):
        key, k = jax.random.split(key)
        make_sample(P, params, cfg, margs, args, k, f"{args.run_name}_{i}")


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
    return parser


def _main():
    common.enable_compile_cache()
    sample(build_parser().parse_args())


if __name__ == "__main__":
    _main()
