"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the JAX-native analogue of a fake distributed backend (SURVEY.md §4):
multi-chip sharding logic is validated on a host-only mesh; the real TPU is
reserved for bench.py.
"""

import os

# NOTE: this environment bakes JAX_PLATFORMS=axon (TPU tunnel) into the env;
# plain env vars don't override it, jax.config.update before backend init does.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from dalle2_video_tpu.parallel.mesh import create_mesh

    return create_mesh(data=4, model=2)
