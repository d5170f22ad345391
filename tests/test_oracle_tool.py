"""Smoke test for the converged-parity tool (tools/run_oracle_parity.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_run_oracle_parity_config1_one_epoch():
    from tools.run_oracle_parity import run_config

    out = run_config("1", epochs=1, n_iw=8)
    assert out["family"] == "cl_vae" and out["config"] == "1"
    # one epoch from the same init: the two NLLs must already be close
    assert abs(out["delta_nats_per_frame"]) < 0.5
    assert out["test_nll_jax"] > 0 and out["test_nll_reference_oracle"] > 0


@pytest.mark.slow
def test_run_oracle_parity_vanilla_config2_one_epoch():
    """Config 2 (vanilla, n_classes == 1): zero-width w heads must work in
    BOTH implementations and the deltas stay close from the same init."""
    from tools.run_oracle_parity import run_config

    out = run_config("2", epochs=1, n_iw=8)
    assert out["config"] == "2"
    assert abs(out["delta_nats_per_frame"]) < 0.5
