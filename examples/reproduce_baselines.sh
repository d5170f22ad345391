#!/usr/bin/env bash
# Reproduce the five BASELINE.json configs end to end on the attached device.
# Usage: bash examples/reproduce_baselines.sh [output_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-data/repro}"
mkdir -p "$OUT"
JSB_CS="/root/reference/data/input/JSB Chorales_Cs.pickle"
JSB_ALL="/root/reference/data/input/JSB Chorales_all.pickle"
# Piano-midi pickles are missing from this mount (.MISSING_LARGE_BLOBS) and
# the public corpus (piano-midi.de) is unreachable offline (no DNS egress).
# To run configs 3/5 on the real corpus, build the pickles from its MIDI
# files with tools/make_pianomidi_pickle.py and point PM_ALL at the result:
#   python tools/make_pianomidi_pickle.py --midi_dir <dir> \
#       --out "data/input/Piano-midi_all.pickle" --transpose_to_c
# Until then this script substitutes JSB-all (same schema) where they appear.
PM_ALL="${PM_ALL:-data/input/Piano-midi_all.pickle}"
if [ -f "$PM_ALL" ]; then JSB_SUB="$PM_ALL"; else JSB_SUB="$JSB_ALL"; fi

echo "== config 1: Classifying VAE on JSB Chorales_Cs (latent 4, --use_x_prev): train + sample"
python -m classifying_vae_lstm_tpu.cli.cl_vae_train c1 --latent_dim 4 --use_x_prev \
    --num_epochs 60 --kl_anneal 5 --w_kl_anneal 3 --patience 10 \
    --model_dir "$OUT" --train_file "$JSB_CS"
python -m classifying_vae_lstm_tpu.cli.cl_vae_sample c1 -i "$OUT/c1.npz" -n 3 -t 64 \
    --sample_dir "$OUT" --train_file "$JSB_CS"

echo "== config 2: Vanilla VAE baseline (no key latent), ELBO parity check"
python -m classifying_vae_lstm_tpu.cli.cl_vae_train c2 --latent_dim 4 --vanilla \
    --num_epochs 60 --kl_anneal 5 --patience 10 \
    --model_dir "$OUT" --train_file "$JSB_ALL"
python -m classifying_vae_lstm_tpu.cli.evaluate -i "$OUT/c2.npz" --family cl_vae \
    --n_samples 64 --batch_size 500 --train_file "$JSB_ALL"

echo "== config 3: Classifying VAE, inferred-key vs given-key conditioning"
python -m classifying_vae_lstm_tpu.cli.cl_vae_train c3 --latent_dim 4 --use_x_prev \
    --num_epochs 60 --kl_anneal 5 --w_kl_anneal 3 --patience 10 \
    --model_dir "$OUT" --train_file "$JSB_SUB"
python -m classifying_vae_lstm_tpu.cli.cl_vae_sample c3_infer -i "$OUT/c3.npz" -n 2 -t 64 \
    --infer_w --sample_dir "$OUT" --train_file "$JSB_SUB"
python -m classifying_vae_lstm_tpu.cli.cl_vae_sample c3_true -i "$OUT/c3.npz" -n 2 -t 64 \
    --sample_dir "$OUT" --train_file "$JSB_SUB"

echo "== config 4: Classifying VAE+LSTM: scan-based sequence training + generation"
python -m classifying_vae_lstm_tpu.cli.cl_vrnn_train c4 --use_x_prev \
    --num_epochs 80 --kl_anneal 5 --w_kl_anneal 3 --patience 10 \
    --model_dir "$OUT" --train_file "$JSB_ALL"
python -m classifying_vae_lstm_tpu.cli.cl_vrnn_sample c4 -i "$OUT/c4.npz" -n 2 -t 64 \
    --infer_w --sample_dir "$OUT" --train_file "$JSB_ALL"

echo "== config 5: cl_vrnn on Piano-midi all-keys: batched multi-song sampling + WAV export"
if [ "$JSB_SUB" = "$JSB_ALL" ]; then
    C5_MODEL="$OUT/c4.npz"  # JSB substitution: reuse the config-4 model
else
    python -m classifying_vae_lstm_tpu.cli.cl_vrnn_train c5m --use_x_prev \
        --num_epochs 80 --kl_anneal 5 --w_kl_anneal 3 --patience 10 \
        --model_dir "$OUT" --train_file "$JSB_SUB"
    C5_MODEL="$OUT/c5m.npz"
fi
python -m classifying_vae_lstm_tpu.cli.cl_vrnn_sample c5 -i "$C5_MODEL" -n 6 -t 64 \
    --infer_w --write_wav --sample_dir "$OUT" --train_file "$JSB_SUB"

echo "== test NLLs"
python -m classifying_vae_lstm_tpu.cli.evaluate -i "$OUT/c1.npz" --family cl_vae \
    --n_samples 64 --batch_size 500 --train_file "$JSB_CS"
python -m classifying_vae_lstm_tpu.cli.evaluate -i "$OUT/c4.npz" --family cl_vrnn \
    --n_samples 64 --batch_size 200 --train_file "$JSB_ALL"
if [ "$C5_MODEL" != "$OUT/c4.npz" ]; then
    python -m classifying_vae_lstm_tpu.cli.evaluate -i "$C5_MODEL" --family cl_vrnn \
        --n_samples 64 --batch_size 200 --train_file "$JSB_SUB"
fi
echo "done; outputs in $OUT"
