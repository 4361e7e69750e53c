"""Test harness: force an 8-fake-device CPU mesh BEFORE jax is imported.

This is the standard JAX substitute for a multi-device rig (SURVEY.md §4
"Distributed (no cluster)"): `--xla_force_host_platform_device_count=8` gives
8 independent CPU devices, so real `Mesh`es and real collectives run in CI
without TPU hardware. Benchmarks (bench.py) run on the real chip instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the remote-TPU tunnel) via
# /root/.axon_site; compiles through the tunnel take tens of seconds, so force
# the test suite onto the 8 fake CPU devices explicitly after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {devs}"
    return devs
