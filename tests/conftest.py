"""Test configuration: CPU backend, 8 virtual devices, float64.

The reference tests assert at TESTS_TOL = 1e-4 (tests/osqp_tester.h:9)
against double-precision golden data, so the suite runs in x64 on the
CPU backend; sharding tests use the virtual 8-device mesh.  TPU runs use
float32 (the DFLOAT build analogue) and are exercised by bench.py.
"""

import os

# f32-on-device leg (the reference CI's DFLOAT configuration,
# main.yml flag matrix): OSQP_TPU_TEST_F32=1 keeps the DEFAULT backend
# (the real TPU in the bench environment) in float32 and runs only the
# tests marked ``f32`` at f32-grade tolerances — the production
# configuration gets a correctness gate, not just a throughput number.
F32_DEVICE = os.environ.get("OSQP_TPU_TEST_F32", "0") == "1"

# The environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU) and a
# sitecustomize imports jax at interpreter start, so the env var alone is
# too late — use jax.config as well.  Tests run on the CPU backend in x64
# with 8 virtual devices for the sharding suite.
if not F32_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not F32_DEVICE and "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite compiles hundreds of distinct programs in one process; with
# the default parallel codegen split (32 LLVM JIT modules per program)
# XLA:CPU eventually segfaults in backend_compile_and_load after ~400
# programs (JIT code-memory exhaustion).  One module per program keeps
# the suite stable and compiles are disk-cached anyway.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

import jax

if not F32_DEVICE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles hundreds of programs
# (each distinct StaticConfig is a fresh executable); caching them on
# disk makes re-runs start-to-green in well under a minute and halves
# first-run compile pressure on XLA:CPU.
_cache_dir = os.environ.get("OSQP_TPU_TEST_CACHE", "/tmp/osqp_tpu_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# jax's file cache writes entries NON-atomically (lru_cache.py put():
# plain write_bytes) — a run killed mid-write (timeout/Ctrl-C) leaves a
# truncated executable that SEGFAULTS the deserializer on the next run's
# cache *read*.  Patch put() to write-to-temp + os.replace (atomic on
# the same filesystem): a killed write leaves only an ignored temp file.
import tempfile

from jax._src import lru_cache as _lru


def _atomic_put(self, key, val):
    if not key:
        raise ValueError("key cannot be empty")
    cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
    if cache_path.exists():
        return
    fd, tmp = tempfile.mkstemp(dir=str(self.path), prefix=".inflight-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(val)
        os.replace(tmp, str(cache_path))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


_lru.LRUCache.put = _atomic_put

# Sanitizer mode (the reference CI's valgrind-memcheck analogue, SURVEY
# §5): JAX_SANITIZE=1 runs tests with jax_debug_nans — any NaN appearing
# in a jitted computation's output aborts with a located traceback.
# Tests that produce NaNs BY DESIGN (infeasibility certificates,
# non-convex divergence, NaN-filled store_solution) carry the ``nanok``
# marker and are skipped in this mode.
SANITIZE = os.environ.get("JAX_SANITIZE", "0") == "1"
if SANITIZE:
    jax.config.update("jax_debug_nans", True)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    if F32_DEVICE:
        skip_f32 = pytest.mark.skip(
            reason="not part of the f32-on-device leg (mark with f32)"
        )
        for item in items:
            if "f32" not in item.keywords:
                item.add_marker(skip_f32)
    if not SANITIZE:
        return
    skip = pytest.mark.skip(reason="produces NaNs by design (nanok)")
    for item in items:
        if "nanok" in item.keywords:
            item.add_marker(skip)


# Loaded-executable pressure: every distinct StaticConfig is a separate
# compiled+loaded executable and XLA:CPU's JIT eventually segfaults when
# hundreds stay loaded in one process (observed ~140 tests in, both in
# fresh compiles and in cache-deserialize).  Dropping jax's in-memory
# caches periodically lets dead executables unload; the on-disk compile
# cache makes the subsequent reloads cheap.
_CLEAR_EVERY = 40
_test_count = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_executable_unload():
    yield
    _test_count["n"] += 1
    if _test_count["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()


# tests/osqp_tester.h:9 — in the f32 device leg the golden comparisons
# relax to f32-grade accuracy (the DFLOAT build tolerance class).
TESTS_TOL = 5e-3 if F32_DEVICE else 1e-4


@pytest.fixture
def tol():
    return TESTS_TOL


def assert_allclose(a, b, tol=TESTS_TOL):
    __tracebackhide__ = True
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=tol)
