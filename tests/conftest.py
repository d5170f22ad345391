"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY §4, this is the JAX fake-cluster idiom standing in for the fake
backends the reference never had — the data-parallel sharding path is tested
on 8 host devices without TPU hardware.
"""

import os

# The ambient axon TPU plugin pre-imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so env vars set here are too late for the import-time
# config read — but the backend isn't initialized yet, so config.update works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data/input")
JSB_ALL = REFERENCE_DATA / "JSB Chorales_all.pickle"
JSB_CS = REFERENCE_DATA / "JSB Chorales_Cs.pickle"


@pytest.fixture(scope="session")
def jsb_all_path():
    if not JSB_ALL.exists():
        pytest.skip("JSB Chorales_all.pickle not available")
    return str(JSB_ALL)


@pytest.fixture(scope="session")
def jsb_cs_path():
    if not JSB_CS.exists():
        pytest.skip("JSB Chorales_Cs.pickle not available")
    return str(JSB_CS)
