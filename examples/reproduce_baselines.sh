#!/usr/bin/env bash
# Reproduce the five BASELINE.json configs end to end on the attached device.
# Usage: bash examples/reproduce_baselines.sh [output_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-data/repro}"
mkdir -p "$OUT"
JSB_CS="/root/reference/data/input/JSB Chorales_Cs.pickle"
JSB_ALL="/root/reference/data/input/JSB Chorales_all.pickle"
# Piano-midi pickles are missing from this mount (.MISSING_LARGE_BLOBS); the
# loader accepts the same schema, so substitute JSB-all where they appear.

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
    --model_dir "$OUT" --train_file "$JSB_ALL"
python -m classifying_vae_lstm_tpu.cli.cl_vae_sample c3_infer -i "$OUT/c3.npz" -n 2 -t 64 \
    --infer_w --sample_dir "$OUT" --train_file "$JSB_ALL"
python -m classifying_vae_lstm_tpu.cli.cl_vae_sample c3_true -i "$OUT/c3.npz" -n 2 -t 64 \
    --sample_dir "$OUT" --train_file "$JSB_ALL"

echo "== config 4: Classifying VAE+LSTM: scan-based sequence training + generation"
python -m classifying_vae_lstm_tpu.cli.cl_vrnn_train c4 --use_x_prev \
    --num_epochs 80 --kl_anneal 5 --w_kl_anneal 3 --patience 10 \
    --model_dir "$OUT" --train_file "$JSB_ALL"
python -m classifying_vae_lstm_tpu.cli.cl_vrnn_sample c4 -i "$OUT/c4.npz" -n 2 -t 64 \
    --infer_w --sample_dir "$OUT" --train_file "$JSB_ALL"

echo "== config 5: batched multi-song sampling + WAV export"
python -m classifying_vae_lstm_tpu.cli.cl_vrnn_sample c5 -i "$OUT/c4.npz" -n 6 -t 64 \
    --infer_w --write_wav --sample_dir "$OUT" --train_file "$JSB_ALL"

echo "== test NLLs"
python -m classifying_vae_lstm_tpu.cli.evaluate -i "$OUT/c1.npz" --family cl_vae \
    --n_samples 64 --batch_size 500 --train_file "$JSB_CS"
python -m classifying_vae_lstm_tpu.cli.evaluate -i "$OUT/c4.npz" --family cl_vrnn \
    --n_samples 64 --batch_size 200 --train_file "$JSB_ALL"
echo "done; outputs in $OUT"
