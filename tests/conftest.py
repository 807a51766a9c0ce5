"""Test configuration: CPU backend, 8 virtual devices, float64.

The reference tests assert at TESTS_TOL = 1e-4 (tests/osqp_tester.h:9)
against double-precision golden data, so the suite runs in x64 on the
CPU backend; sharding tests use the virtual 8-device mesh.  TPU runs use
float32 (the DFLOAT build analogue) and are exercised by bench.py.
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU) and a
# sitecustomize imports jax at interpreter start, so the env var alone is
# too late — use jax.config as well.  Tests run on the CPU backend in x64
# with 8 virtual devices for the sharding suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

TESTS_TOL = 1e-4  # tests/osqp_tester.h:9


@pytest.fixture
def tol():
    return TESTS_TOL


def assert_allclose(a, b, tol=TESTS_TOL):
    __tracebackhide__ = True
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=tol)
