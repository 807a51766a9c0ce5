"""TPU kernel-level ops for the hot paths.

* :mod:`.spd_inverse` — batched SPD inversion as pure GEMMs (recursive
  blocked Cholesky with closed-form leaves); the default factorization
  route of the ``dense_inv`` backend.
"""

from . import spd_inverse  # noqa: F401
