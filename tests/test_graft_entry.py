"""Driver entry points: entry() is jittable; dryrun runs on the 8-device mesh."""

import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_jittable():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (200, 16, 88)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
