"""Test configuration: run on a virtual 8-device CPU mesh.

In this image the axon TPU platform ignores ``JAX_PLATFORMS=cpu``, so we
force the host platform device count and pin every test to the CPU backend
via an autouse ``jax.default_device`` fixture. Real-TPU benchmarking
happens via bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin registers a backend factory at interpreter start
# (sitecustomize imports jax, so JAX_PLATFORMS is already bound) and
# initializes even when tests only want CPU; when its relay tunnel is
# down the first jax.devices() call blocks forever. Tests are CPU-only
# by design — deregister the factory and repin jax_platforms before any
# backend initializes so the suite never depends on the tunnel's health.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax as _jax  # noqa: E402

_jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Model-level programs take minutes to XLA-optimize on CPU; tests only
# check correctness on tiny shapes, so skip most optimization passes
# (bench.py runs fully optimized on the TPU).
jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Pin everything (including module-scoped fixtures) to the CPU backend.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def rng():
    return np.random.default_rng(0)
