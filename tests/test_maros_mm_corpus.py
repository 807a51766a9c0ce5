"""Regenerated Maros-Meszaros corpus integrity.

Every corpus QPS must parse through the real reader, and the small
problems must solve to their PUBLISHED repository optima (the
fingerprint criterion — values from the Maros-Meszaros distribution,
not from this repo's own solves).  See tools/maros_sif.py for the
regeneration + verification methodology.
"""

import json
import os

import numpy as np
import pytest

import osqp_tpu
from osqp_tpu.io.qps import load_qps

CORPUS = os.path.join(os.path.dirname(__file__), "data", "maros_mm")


def _index():
    with open(os.path.join(CORPUS, "MM_INDEX.json")) as f:
        return json.load(f)


def test_index_accounts_for_all_138():
    idx = _index()
    c = idx["counts"]
    assert c["verified"] + c["unavailable"] + c["pending"] == 138
    assert c["verified"] == len(idx["problems"])
    # no problem listed twice
    assert not set(idx["problems"]) & set(idx["unavailable"])


def test_all_corpus_files_parse():
    idx = _index()
    for name, meta in idx["problems"].items():
        qp = load_qps(os.path.join(CORPUS, f"{name}.qps"))
        assert qp.n == meta["n"], name
        assert qp.m == meta["m"], name


SMALL = ["HS21", "HS35", "HS35MOD", "HS51", "HS52", "HS53", "HS76",
         "TAME", "GENHS28", "ZECEVIC2", "QPTEST", "CVXQP1_S",
         "CVXQP2_S", "CVXQP3_S"]


@pytest.mark.parametrize("name", SMALL)
def test_small_problem_reproduces_published_optimum(name):
    idx = _index()
    pub = idx["problems"][name]["published"]
    qp = load_qps(os.path.join(CORPUS, f"{name}.qps"))
    s = osqp_tpu.Solver(P=qp.P, q=qp.q, A=qp.A, l=qp.l, u=qp.u,
                        eps_abs=1e-9, eps_rel=1e-9, polish=True,
                        max_iter=200000, verbose=False)
    r = s.solve()
    assert r.info.status == "solved", (name, r.info.status)
    obj = r.info.obj_val + qp.obj_constant
    assert abs(obj - pub) / max(1.0, abs(pub)) < 1e-5, (name, obj, pub)
