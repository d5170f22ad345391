"""Smoke test for the converged-parity tool (tools/run_oracle_parity.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_run_oracle_parity_cl_vae_one_epoch():
    from tools.run_oracle_parity import run_family

    out = run_family("cl_vae", epochs=1, n_iw=8)
    assert out["family"] == "cl_vae"
    # one epoch from the same init: the two NLLs must already be close
    assert abs(out["delta_nats_per_frame"]) < 0.5
    assert out["test_nll_jax"] > 0 and out["test_nll_reference_oracle"] > 0
