"""Generate music from a trained Classifying VAE+LSTM. Flag-for-flag port of
the reference CLI (``cl_vrnn/sample.py:49-70``); run as

    python -m classifying_vae_lstm_tpu.cli.cl_vrnn_sample <run_name> -i <model.npz> [flags]

Writes both the generated sample and its seed as MIDI, doubling the frame
rate for JSB corpora (reference ``cl_vrnn/sample.py:25-28``). Seeds can be
filtered by key with ``-c`` via the inverted key map (reference :10-15).
Generation for all ``-n`` samples is batched into one device program.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PianoData, write_sample, write_sample_wav
from ..data.pianoroll import to_categorical
from ..sampling import infer_w_cl_vrnn
from ..sampling.generate import generate_cl_vrnn_batch
from . import common


def gen_samples(P, params, cfg, margs, args):
    if args.seed_midi:
        return gen_from_midi(P, params, cfg, margs, args)
    key_map = {v: k for k, v in P.key_map.items()}
    inds = np.arange(len(P.test_song_keys))
    if args.c is not None:  # user-specified seed key
        kys = np.array([key_map[k] for k in P.test_song_keys])
        inds = inds[kys == args.c]
    rng = np.random.default_rng(args.seed)
    rng.shuffle(inds)
    inds = inds[: args.n]
    if len(inds) == 0:
        print("no matching test seeds")
        return

    key = jax.random.PRNGKey(args.seed)
    seeds = jnp.asarray(np.stack([P.x_test[i] for i in inds]))
    ws = []
    for j, i in enumerate(inds):
        key, kw = jax.random.split(key)
        if args.infer_w:
            ws.append(infer_w_cl_vrnn(params, cfg, seeds[j], kw, w_discrete=args.discrete_w))
        else:
            ws.append(jnp.asarray(to_categorical([P.test_song_keys[i]], margs["n_classes"])[0]))
    key, kg = jax.random.split(key)
    samples = generate_cl_vrnn_batch(params, cfg, seeds, args.t, kg, jnp.stack(ws))

    is_jsb = "jsb" in args.train_file.lower()
    os.makedirs(args.sample_dir, exist_ok=True)
    for j, i in enumerate(inds):
        write_sample(np.asarray(samples[j]), args.sample_dir, f"{args.run_name}_{j}", is_jsb)
        write_sample(np.asarray(seeds[j]), args.sample_dir, f"{args.run_name}{j}_seed_{i}", is_jsb)
        if args.write_wav:
            write_sample_wav(np.asarray(samples[j]), args.sample_dir, f"{args.run_name}_{j}", is_jsb)


def gen_from_midi(P, params, cfg, margs, args):
    """Seed generation from a user-supplied .mid file (extension).

    The file is parsed with the general SMF parser, quantized to eighth
    notes, and the last ``-t`` frames become the teacher-forced seed; the key
    latent is inferred from the seed unless ``-c`` names one.
    """
    from ..data.midi import midi_to_roll

    roll = midi_to_roll(args.seed_midi)
    if len(roll) == 0:
        raise ValueError(f"{args.seed_midi} contains no notes")
    t = args.t
    seed = np.zeros((t, cfg.original_dim), np.float32)
    take = min(t, len(roll))
    seed[-take:] = roll[-take:, : cfg.original_dim]
    key = jax.random.PRNGKey(args.seed)
    seeds = jnp.asarray(np.repeat(seed[None], args.n, axis=0))
    if args.c is not None:
        idx = P.key_map.get(args.c)
        if idx is None:
            raise ValueError(f"unknown key {args.c!r}; known: {sorted(P.key_map)}")
        ws = jnp.broadcast_to(
            jax.nn.one_hot(idx, margs["n_classes"]), (args.n, margs["n_classes"]))
    else:
        key, kw = jax.random.split(key)
        w = infer_w_cl_vrnn(params, cfg, seeds[0], kw, w_discrete=args.discrete_w)
        ws = jnp.broadcast_to(w, (args.n, margs["n_classes"]))
    key, kg = jax.random.split(key)
    samples = generate_cl_vrnn_batch(params, cfg, seeds, t, kg, ws)
    is_jsb = "jsb" in args.train_file.lower()
    os.makedirs(args.sample_dir, exist_ok=True)
    for j in range(args.n):
        write_sample(np.asarray(samples[j]), args.sample_dir, f"{args.run_name}_{j}", is_jsb)
        if args.write_wav:
            write_sample_wav(np.asarray(samples[j]), args.sample_dir, f"{args.run_name}_{j}", is_jsb)


def sample(args):
    model_file = args.model_file or os.path.join(args.model_dir, args.run_name + ".npz")
    params, cfg, margs = common.load_model(model_file, "cl_vrnn")
    P = PianoData(args.train_file, batch_size=1, seq_length=args.t, squeeze_x=False)
    gen_samples(P, params, cfg, margs, args)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_name", type=str, help="tag for current run")
    parser.add_argument("--infer_w", action="store_true", help="infer w when generating")
    parser.add_argument("--discrete_w", action="store_true", help="sample discrete w when generating")
    parser.add_argument("-t", type=int, default=32, help="number of timesteps per sample")
    parser.add_argument("-n", type=int, default=1, help="number of samples")
    parser.add_argument("-c", type=str, help="set key of seed sample")
    parser.add_argument("--sample_dir", type=str, default="data/samples",
                        help="basedir for saving output midi files")
    parser.add_argument("--model_dir", type=str, default="data/models",
                        help="basedir for saved model weights; <model_dir>/<run_name>.npz is "
                             "loaded when -i is not given (extension: the reference "
                             "cl_vrnn/sample.py has no --model_dir; cl_vae/sample.py:52 does)")
    parser.add_argument("-i", "--model_file", type=str, default="",
                        help="preload model weights (no training)")
    parser.add_argument("--train_file", type=str, default=common.DEFAULT_TRAIN_FILE,
                        help="file of training data (.pickle)")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed (extension)")
    parser.add_argument("--write_wav", action="store_true",
                        help="also render samples to .wav (extension; BASELINE config 5)")
    parser.add_argument("--seed_midi", type=str, default=None,
                        help="seed generation from this .mid file instead of a test "
                             "window (extension; any SMF, quantized to eighth notes)")
    return parser


def _main():
    common.enable_compile_cache()
    sample(build_parser().parse_args())


if __name__ == "__main__":
    _main()
