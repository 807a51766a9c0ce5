"""Fingerprint-verify the regenerated Maros-Meszaros encodings.

Solves each encoding from tools/maros_sif.py tightly in f64 (CPU) and
compares the objective against the repository's published optimum.  An
encoding that reproduces the published value to many significant digits
IS the real problem (the optimum acts as a fingerprint of the exact
problem data); a mismatch means the encoding (or the recalled published
value) is wrong and the problem must not enter the corpus.

Usage: python tools/verify_mm.py [names...]   (default: all available)
"""

from __future__ import annotations

import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def to_osqp_form(prob):
    """Canonical bound-appending mapping (tools/maros_sif.py) — shared
    with the corpus writer so verifier and writer cannot drift."""
    import maros_sif as ms

    A_full, l_full, u_full = ms.to_osqp_form(prob)
    return prob["P"], prob["q"], A_full, l_full, u_full


def solve_tight(prob, eps=1e-9, max_iter=200_000, sparse=None):
    import osqp_tpu

    P, q, A, l, u = to_osqp_form(prob)
    n, m = q.shape[0], A.shape[0]
    use_sparse = sparse if sparse is not None else max(n, m) > 2000
    kw = dict(eps_abs=eps, eps_rel=eps, max_iter=max_iter, polish=True,
              verbose=False, dtype="float64")
    if use_sparse:
        res = osqp_tpu.solve_sparse(P, q, A, l, u, **kw)
        obj = float(np.asarray(res.obj_val)[0])
        status = int(np.asarray(res.status_val)[0])
        it = int(np.asarray(res.iter)[0])
        pol = int(np.asarray(res.status_polish)[0])
    else:
        s = osqp_tpu.Solver(P=P, q=q, A=A, l=l, u=u, **kw)
        r = s.solve()
        obj, status, it, pol = (r.info.obj_val, r.info.status_val,
                                r.info.iter, r.info.status_polish)
    return obj + prob["obj_const"], status, it, pol


def fingerprint(prob, eps=1e-9, **kw):
    obj, status, it, pol = solve_tight(prob, eps=eps, **kw)
    pub = prob["published"]
    rel = abs(obj - pub) / max(1.0, abs(pub)) if pub is not None else None
    return dict(
        name=prob["name"], n=prob["q"].shape[0], obj=obj, published=pub,
        rel_err=rel, status=status, iter=it, polish=pol,
        match=(rel is not None and rel < 1e-5),
    )


def main():
    import maros_sif as ms

    probs = ms.make_all_small()
    names = set(sys.argv[1:])
    ok = 0
    for p in probs:
        if names and p["name"] not in names:
            continue
        r = fingerprint(p)
        ok += bool(r["match"])
        print(
            f"{r['name']:<10} n={r['n']:<6} obj={r['obj']:+.8e} "
            f"pub={r['published']:+.8e} rel={r['rel_err']:.2e} "
            f"status={r['status']} polish={r['polish']} "
            f"{'MATCH' if r['match'] else '*** MISMATCH ***'}"
        )
    print(f"{ok} matches")


if __name__ == "__main__":
    main()
