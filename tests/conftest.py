"""Test configuration.

Tests run on a virtual 8-device CPU mesh (standing in for a TPU slice), per
the multi-backend testing strategy the reference uses with its `test_device!`
macro (diffusion_rs_common/src/core/test_utils.rs:4-27) — except our "devices"
are emulated XLA hosts so sharding paths are exercised without hardware.
"""

import os

# Force-assign (not setdefault): the environment may pre-set
# JAX_PLATFORMS=axon (tunneled TPU) at interpreter start; unit tests must
# run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which beats the env var; force it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
