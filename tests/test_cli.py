"""CLI smoke tests: flag parity + end-to-end train -> checkpoint -> sample -> eval
on a tiny slice of the real JSB-Cs corpus."""

import json
import os

import numpy as np
import pytest

from classifying_vae_lstm_tpu.cli import (
    cl_vae_sample,
    cl_vae_train,
    cl_vrnn_sample,
    cl_vrnn_train,
    evaluate,
)

REFERENCE_FLAGS_VAE_TRAIN = [
    "--batch_size", "--optimizer", "--num_epochs", "--original_dim",
    "--intermediate_dim", "--latent_dim", "--seq_length", "--class_weight",
    "--w_log_var_prior", "--intermediate_class_dim", "--do_log", "--predict_next",
    "--use_x_prev", "--patience", "--kl_anneal", "--w_kl_anneal", "--log_dir",
    "--model_dir", "--train_file",
]
REFERENCE_FLAGS_VRNN_TRAIN = [
    "--batch_size", "--optimizer", "--num_epochs", "--original_dim", "--latent_dim",
    "--intermediate_dim", "--seq_length", "--class_weight", "--predict_next",
    "--do_log", "--w_log_var_prior", "--kl_anneal", "--w_kl_anneal", "--patience",
    "--use_x_prev", "--log_dir", "--model_dir", "--train_file",
]


def _option_strings(parser):
    out = set()
    for a in parser._actions:
        out.update(a.option_strings)
    return out


def test_cl_vae_train_flag_parity():
    opts = _option_strings(cl_vae_train.build_parser())
    for flag in REFERENCE_FLAGS_VAE_TRAIN:
        assert flag in opts, f"missing reference flag {flag}"


def test_cl_vrnn_train_flag_parity():
    opts = _option_strings(cl_vrnn_train.build_parser())
    for flag in REFERENCE_FLAGS_VRNN_TRAIN:
        assert flag in opts, f"missing reference flag {flag}"


def test_cl_vae_sample_flag_parity():
    opts = _option_strings(cl_vae_sample.build_parser())
    for flag in ["-n", "--use_z_prior", "-t", "--infer_w", "--no_x_prev",
                 "--sample_dir", "--model_dir", "-i", "--model_file", "--train_file"]:
        assert flag in opts


def test_cl_vrnn_sample_flag_parity():
    opts = _option_strings(cl_vrnn_sample.build_parser())
    for flag in ["--infer_w", "--discrete_w", "-t", "-n", "-c", "--sample_dir",
                 "-i", "--model_file", "--train_file"]:
        assert flag in opts


def test_train_defaults_match_reference():
    a = cl_vae_train.build_parser().parse_args(["run"])
    assert (a.batch_size, a.optimizer, a.num_epochs) == (100, "adam-wn", 200)
    assert (a.original_dim, a.intermediate_dim, a.latent_dim, a.seq_length) == (88, 88, 2, 1)
    b = cl_vrnn_train.build_parser().parse_args(["run"])
    assert (b.batch_size, b.seq_length, b.intermediate_dim) == (200, 16, 88)


@pytest.mark.slow
def test_cl_vae_end_to_end(jsb_cs_path, tmp_path):
    args = cl_vae_train.build_parser().parse_args([
        "e2e", "--num_epochs", "2", "--latent_dim", "2", "--patience", "0",
        "--model_dir", str(tmp_path), "--train_file", jsb_cs_path, "--use_x_prev",
    ])
    _, best_loss = cl_vae_train.train(args)
    assert np.isfinite(best_loss["val_loss"])
    # the three-file checkpoint contract
    for ext in (".json", ".yaml", ".npz"):
        assert os.path.exists(tmp_path / f"e2e{ext}")
    margs = json.load(open(tmp_path / "e2e.json"))
    assert margs["n_classes"] == 2 and margs["use_x_prev"]

    sargs = cl_vae_sample.build_parser().parse_args([
        "e2e", "-i", str(tmp_path / "e2e.npz"), "-n", "1", "-t", "8",
        "--sample_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vae_sample.sample(sargs)
    assert os.path.exists(tmp_path / "e2e_0.mid")

    eargs = evaluate.build_parser().parse_args([
        "-i", str(tmp_path / "e2e.npz"), "--family", "cl_vae",
        "--n_samples", "4", "--batch_size", "500", "--train_file", jsb_cs_path,
    ])
    out = evaluate.evaluate(eargs)
    assert 0 < out["test_nll_nats_per_frame"] < 100


@pytest.mark.slow
def test_cl_vrnn_end_to_end(jsb_cs_path, tmp_path):
    args = cl_vrnn_train.build_parser().parse_args([
        "e2ev", "--num_epochs", "2", "--patience", "0", "--seq_length", "8",
        "--intermediate_dim", "16", "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    _, best_loss = cl_vrnn_train.train(args)
    assert np.isfinite(best_loss["val_loss"])

    sargs = cl_vrnn_sample.build_parser().parse_args([
        "e2ev", "-i", str(tmp_path / "e2ev.npz"), "-n", "1", "-t", "16",
        "--infer_w", "--sample_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vrnn_sample.sample(sargs)
    assert os.path.exists(tmp_path / "e2ev_0.mid")
    seeds = [f for f in os.listdir(tmp_path) if "_seed_" in f]
    assert seeds  # the seed roll is written too (cl_vrnn/sample.py:27)


@pytest.mark.slow
def test_cl_vrnn_sample_key_filter(jsb_cs_path, tmp_path):
    args = cl_vrnn_train.build_parser().parse_args([
        "kf", "--num_epochs", "2", "--patience", "0", "--seq_length", "8",
        "--intermediate_dim", "8", "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vrnn_train.train(args)
    sargs = cl_vrnn_sample.build_parser().parse_args([
        "kf", "-i", str(tmp_path / "kf.npz"), "-n", "1", "-t", "16", "-c", "C",
        "--sample_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vrnn_sample.sample(sargs)
    assert os.path.exists(tmp_path / "kf_0.mid")


@pytest.mark.slow
def test_cl_vae_seq_concat_mode(jsb_cs_path, tmp_path):
    """--seq_length > 1: silent pitch columns pruned, windows flattened
    (reference cl_vae/train.py:21-30)."""
    args = cl_vae_train.build_parser().parse_args([
        "sq", "--num_epochs", "2", "--patience", "0", "--seq_length", "4",
        "--intermediate_dim", "32", "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    _, best_loss = cl_vae_train.train(args)
    assert np.isfinite(best_loss["val_loss"])
    margs = json.load(open(tmp_path / "sq.json"))
    assert margs["original_dim"] % 4 == 0
    assert margs["original_dim"] < 88 * 4  # some pitch columns were pruned


@pytest.mark.slow
def test_cl_vae_vanilla_mode(jsb_cs_path, tmp_path):
    """--vanilla: n_classes == 1, w losses identically zero (BASELINE config 2)."""
    args = cl_vae_train.build_parser().parse_args([
        "vn", "--num_epochs", "2", "--patience", "0", "--vanilla",
        "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    _, best_loss = cl_vae_train.train(args)
    assert json.load(open(tmp_path / "vn.json"))["n_classes"] == 1
    assert best_loss["w_loss"] == 0.0 and best_loss["w2_loss"] == 0.0


@pytest.mark.slow
def test_cl_vae_predict_next_mode(jsb_cs_path, tmp_path):
    """--predict_next: encode x_t, reconstruct x_{t+1} (reference flag)."""
    args = cl_vae_train.build_parser().parse_args([
        "pn", "--num_epochs", "2", "--patience", "0", "--predict_next",
        "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    _, best_loss = cl_vae_train.train(args)
    assert np.isfinite(best_loss["val_loss"])
    assert json.load(open(tmp_path / "pn.json"))["predict_next"]


@pytest.mark.slow
def test_cli_resume_continues_from_last(jsb_cs_path, tmp_path):
    base = ["rs", "--patience", "0", "--model_dir", str(tmp_path),
            "--train_file", jsb_cs_path, "--save_last"]
    args = cl_vae_train.build_parser().parse_args(base + ["--num_epochs", "2"])
    cl_vae_train.train(args)
    assert os.path.exists(tmp_path / "rs.last.npz")
    # resume to epoch 4: only 2 more epochs run (initial_epoch restored)
    args2 = cl_vae_train.build_parser().parse_args(base + ["--num_epochs", "4", "--resume"])
    _, best_loss = cl_vae_train.train(args2)
    assert np.isfinite(best_loss["val_loss"])


@pytest.mark.slow
def test_evaluate_family_autodetect(jsb_cs_path, tmp_path):
    args = cl_vae_train.build_parser().parse_args([
        "fa", "--num_epochs", "2", "--patience", "0",
        "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vae_train.train(args)
    eargs = evaluate.build_parser().parse_args([
        "-i", str(tmp_path / "fa.npz"), "--n_samples", "2",
        "--batch_size", "500", "--train_file", jsb_cs_path,
    ])
    out = evaluate.evaluate(eargs)
    assert out["family"] == "cl_vae"


@pytest.mark.slow
def test_key_consistency_cli(jsb_cs_path, tmp_path):
    from classifying_vae_lstm_tpu.cli import key_consistency

    args = cl_vrnn_train.build_parser().parse_args([
        "kc", "--num_epochs", "2", "--patience", "0", "--seq_length", "8",
        "--intermediate_dim", "8", "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vrnn_train.train(args)
    kargs = key_consistency.build_parser().parse_args([
        "-i", str(tmp_path / "kc.npz"), "-n", "2", "-t", "16",
        "--seed_len", "8", "--train_file", jsb_cs_path,
    ])
    rep = key_consistency.run(kargs)
    assert "margin" in rep and rep["n_songs"] == 4  # 2 keys x 2 songs


@pytest.mark.slow
def test_load_model_no_x_prev_override(jsb_cs_path, tmp_path):
    """--no_x_prev forces use_x_prev off at load (reference cl_vae/model.py:235)."""
    from classifying_vae_lstm_tpu.cli import common

    args = cl_vae_train.build_parser().parse_args([
        "nx", "--num_epochs", "2", "--patience", "0",
        "--model_dir", str(tmp_path), "--train_file", jsb_cs_path,
    ])
    cl_vae_train.train(args)
    _, cfg, margs = common.load_model(str(tmp_path / "nx.npz"), "cl_vae", no_x_prev=True)
    assert not cfg.use_x_prev and not margs["use_x_prev"]
