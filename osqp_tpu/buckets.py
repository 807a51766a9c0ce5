"""Heterogeneous-shape QP batching via shape-bucketed padding.

XLA programs have static shapes, so QPs of different (n, m) cannot share
a compiled batch directly.  This module rounds shapes up to buckets
(powers of two), embeds each QP in the padded shape, and scatters the
batched results back.

The padding is *exact*, not approximate:

* extra variables get P = I, q = 0 and appear in no constraint row, so
  their optimum is exactly 0 with zero objective/residual contribution;
* extra constraint rows are all-zero with (-inf, +inf) bounds, which the
  rho classifier treats as loose (auxil.c:82-86) and whose residuals are
  identically zero.

Note: padding changes Ruiz scaling slightly (the cost scalar averages
over padded columns), so iteration counts may differ from an unpadded
solve — solutions agree within tolerances.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np

from .batch import solve_batch
from .constants import (
    OSQP_DUAL_INFEASIBLE,
    OSQP_DUAL_INFEASIBLE_INACCURATE,
    OSQP_INFTY,
    OSQP_PRIMAL_INFEASIBLE,
    OSQP_PRIMAL_INFEASIBLE_INACCURATE,
)


def _next_bucket(v: int, minimum: int = 8) -> int:
    b = minimum
    while b < v:
        b *= 2
    return b


@dataclass
class ProblemResult:
    name: str
    status_val: int
    iter: int
    obj_val: float
    pri_res: float
    dua_res: float
    x: np.ndarray
    y: np.ndarray
    n: int
    m: int
    prim_inf_cert: np.ndarray | None = None  # set on primal-infeasible exits
    dual_inf_cert: np.ndarray | None = None  # set on dual-infeasible exits


def pad_problem(P, q, A, l, u, N: int, M: int):
    """Embed an (n, m) dense QP into padded (N, M) arrays."""
    n, m = q.shape[0], l.shape[0]
    Pp = np.eye(N)
    Pp[:n, :n] = P
    qp_ = np.zeros(N)
    qp_[:n] = q
    Ap = np.zeros((M, N))
    Ap[:m, :n] = A
    lp = np.full(M, -OSQP_INFTY)
    up = np.full(M, OSQP_INFTY)
    lp[:m] = np.clip(l, -OSQP_INFTY, OSQP_INFTY)
    up[:m] = np.clip(u, -OSQP_INFTY, OSQP_INFTY)
    return Pp, qp_, Ap, lp, up


def solve_problems(
    problems: Sequence[tuple[str, Any, Any, Any, Any, Any]],
    **settings,
) -> list[ProblemResult]:
    """Solve a list of (name, P, q, A, l, u) QPs of arbitrary shapes.

    P may be scipy sparse upper-triangular or dense symmetric; A scipy
    sparse or dense.  Problems are grouped into shape buckets; each
    bucket is one batched device solve.  Returns results in input order.
    """
    import scipy.sparse as sp

    from .sparse import to_upper_csc, triu_to_full

    prepared = []
    for idx, (name, P, q, A, l, u) in enumerate(problems):
        q = np.asarray(q, np.float64).ravel()
        n = q.shape[0]
        Pd = triu_to_full(to_upper_csc(P, n))
        Ad = (
            np.asarray(A.todense(), np.float64)
            if sp.issparse(A)
            else np.asarray(A, np.float64)
        )
        l = np.asarray(l, np.float64).ravel()
        u = np.asarray(u, np.float64).ravel()
        prepared.append((idx, name, Pd, q, Ad, l, u))

    buckets: dict[tuple[int, int], list] = defaultdict(list)
    for item in prepared:
        _, _, Pd, q, Ad, l, u = item
        key = (_next_bucket(q.shape[0]), _next_bucket(max(l.shape[0], 1)))
        buckets[key].append(item)

    results: list[ProblemResult | None] = [None] * len(prepared)
    for (N, M), items in buckets.items():
        Ps, qs, As, ls, us = [], [], [], [], []
        for _, _, Pd, q, Ad, l, u in items:
            Pp, qp_, Ap, lp, up = pad_problem(Pd, q, Ad, l, u, N, M)
            Ps.append(Pp)
            qs.append(qp_)
            As.append(Ap)
            ls.append(lp)
            us.append(up)
        res = solve_batch(
            np.stack(Ps), np.stack(qs), np.stack(As), np.stack(ls), np.stack(us),
            **settings,
        )
        x = np.asarray(res.x)
        y = np.asarray(res.y)
        sv = np.asarray(res.status_val)
        it = np.asarray(res.iter)
        obj = np.asarray(res.obj_val)
        pri = np.asarray(res.pri_res)
        dua = np.asarray(res.dua_res)
        pic = np.asarray(res.prim_inf_cert)
        dic = np.asarray(res.dual_inf_cert)
        _PINF = (OSQP_PRIMAL_INFEASIBLE, OSQP_PRIMAL_INFEASIBLE_INACCURATE)
        _DINF = (OSQP_DUAL_INFEASIBLE, OSQP_DUAL_INFEASIBLE_INACCURATE)
        for b, (idx, name, Pd, q, Ad, l, u) in enumerate(items):
            n, m = q.shape[0], l.shape[0]
            results[idx] = ProblemResult(
                name=name,
                status_val=int(sv[b]),
                iter=int(it[b]),
                obj_val=float(obj[b]),
                pri_res=float(pri[b]),
                dua_res=float(dua[b]),
                x=x[b, :n],
                y=y[b, :m],
                n=n,
                m=m,
                prim_inf_cert=pic[b, :m] if int(sv[b]) in _PINF else None,
                dual_inf_cert=dic[b, :n] if int(sv[b]) in _DINF else None,
            )
    return results  # type: ignore[return-value]
