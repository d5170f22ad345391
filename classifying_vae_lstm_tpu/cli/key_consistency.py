"""Measure key-conditioning consistency of a trained cl_vrnn model.

    python -m classifying_vae_lstm_tpu.cli.key_consistency -i <model.npz>

Generates songs conditioned on each key (seeds drawn from same-key test
songs, like the reference's ``-c`` filter) and reports the in-scale fraction
for the conditioned key vs mismatched keys (see
:mod:`..evaluation.key_consistency`). A positive margin means the w latent
steers the output — the paper's core claim, quantified.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PianoData
from ..evaluation.key_consistency import in_scale_fraction, key_consistency_report
from ..sampling.generate import generate_cl_vrnn_batch
from . import common


def run(args):
    params, cfg, margs = common.load_model(args.model_file, "cl_vrnn")
    P = PianoData(args.train_file, batch_size=1, seq_length=args.seed_len, squeeze_x=False)
    inv = {v: k for k, v in P.key_map.items()}
    keys = sorted(P.key_map)
    rng = np.random.default_rng(args.seed)

    rolls, conds = [], []
    for key_name in keys:
        kidx = P.key_map[key_name]
        pool = np.where(P.test_song_keys == kidx)[0]
        if len(pool) == 0:
            continue
        picks = rng.choice(pool, size=args.n, replace=len(pool) < args.n)
        seeds = jnp.asarray(P.x_test[picks])
        ws = jax.nn.one_hot(jnp.full(args.n, kidx), margs["n_classes"])
        out = generate_cl_vrnn_batch(params, cfg, seeds, args.t, jax.random.PRNGKey(kidx), ws)
        for r in np.asarray(out):
            rolls.append(r)
            conds.append(key_name)

    rep = key_consistency_report(rolls, conds, all_keys=keys)
    ceiling = [
        in_scale_fraction(np.asarray(P.x_test[i]), inv[P.test_song_keys[i]])
        for i in range(0, len(P.x_test), max(len(P.x_test) // 200, 1))
    ]
    rep["corpus_ceiling"] = float(np.nanmean(ceiling))
    rep["n_songs"] = len(rolls)
    print(json.dumps({k: round(float(v), 4) for k, v in rep.items()}))
    return rep


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--model_file", type=str, required=True)
    parser.add_argument("-n", type=int, default=8, help="songs per key")
    parser.add_argument("-t", type=int, default=64, help="generated frames per song")
    parser.add_argument("--seed_len", type=int, default=32, help="seed window length")
    parser.add_argument("--train_file", type=str, default=common.DEFAULT_TRAIN_FILE)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def _main():
    common.enable_compile_cache()
    run(build_parser().parse_args())


if __name__ == "__main__":
    _main()
