"""TPU kernel-level ops for the hot paths.

* :mod:`.spd_inverse` — batched SPD inversion as pure GEMMs (recursive
  blocked Cholesky with closed-form leaves); the default factorization
  route of the ``dense_inv`` backend.
* :mod:`.fused_iter` — single-kernel Pallas ADMM iteration (opt-in via
  ``OSQP_TPU_FUSED=1``; XLA's own fusion currently wins — see
  docs/performance.md).
"""

from . import fused_iter, spd_inverse  # noqa: F401
