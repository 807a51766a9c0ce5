"""Build the regenerated Maros-Meszaros QPS corpus.

Writes every fingerprint-VERIFIED encoding from tools/maros_sif.py as a
QPS file under tests/data/maros_mm/ (through the package's own QPS
writer, so the harness exercises the real parser path end-to-end), plus
``MM_INDEX.json`` holding each problem's published optimum, provenance
and sizes, and the explicit list of repository problems that CANNOT be
regenerated (empirical data) with the reason.

Usage: python tools/build_mm_corpus.py [--verify]
  --verify  re-run the f64 fingerprint for every problem before writing
            (slow; the fast path trusts the recorded verification).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


# The canonical 138 problem names of the repository (paper Table 1).
CANONICAL_138 = (
    "AUG2D AUG2DC AUG2DCQP AUG2DQP AUG3D AUG3DC AUG3DCQP AUG3DQP "
    "BOYD1 BOYD2 CONT-050 CONT-100 CONT-101 CONT-200 CONT-201 CONT-300 "
    "CVXQP1_S CVXQP1_M CVXQP1_L CVXQP2_S CVXQP2_M CVXQP2_L "
    "CVXQP3_S CVXQP3_M CVXQP3_L DPKLO1 DTOC3 DUAL1 DUAL2 DUAL3 DUAL4 "
    "DUALC1 DUALC2 DUALC5 DUALC8 EXDATA GENHS28 GOULDQP2 GOULDQP3 "
    "HS118 HS21 HS268 HS35 HS35MOD HS51 HS52 HS53 HS76 HUES-MOD "
    "HUESTIS KSIP LASER LISWET1 LISWET2 LISWET3 LISWET4 LISWET5 "
    "LISWET6 LISWET7 LISWET8 LISWET9 LISWET10 LISWET11 LISWET12 "
    "LOTSCHD MOSARQP1 MOSARQP2 POWELL20 PRIMAL1 PRIMAL2 PRIMAL3 "
    "PRIMAL4 PRIMALC1 PRIMALC2 PRIMALC5 PRIMALC8 Q25FV47 QADLITTL "
    "QAFIRO QBANDM QBEACONF QBORE3D QBRANDY QCAPRI QE226 QETAMACR "
    "QFFFFF80 QFORPLAN QGFRDXPN QGROW15 QGROW22 QGROW7 QISRAEL "
    "QPCBLEND QPCBOEI1 QPCBOEI2 QPCSTAIR QPILOTNO QPTEST QRECIPE "
    "QSC205 QSCAGR25 QSCAGR7 QSCFXM1 QSCFXM2 QSCFXM3 QSCORPIO QSCRS8 "
    "QSCSD1 QSCSD6 QSCSD8 QSCTAP1 QSCTAP2 QSCTAP3 QSEBA QSHARE1B "
    "QSHARE2B QSHELL QSHIP04L QSHIP04S QSHIP08L QSHIP08S QSHIP12L "
    "QSHIP12S QSIERRA QSTAIR QSTANDAT S268 STADAT1 STADAT2 STADAT3 "
    "STCQP1 STCQP2 TAME UBH1 VALUES YAO ZECEVIC2"
).split()
assert len(CANONICAL_138) == 138, len(CANONICAL_138)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "maros_mm")

# The canonical 138-problem repository listing, partitioned by
# regenerability.  "data" = the QPS is empirical data with no generating
# formula (netlib LP bases with added quadratics, measured datasets,
# random instances whose numbers are baked into the SIF); these cannot
# be reproduced without the files themselves.
_CONT_REASON = (
    "elliptic Dirichlet boundary-control QP; structure and target "
    "y_d=1+2(x1+x2) identified by scan (rel ~1e-2, tools/cont_scan.py) "
    "but the alpha/quadrature convention pair is not identifiable to "
    "the <1e-5 fingerprint gate without the SIF"
)

UNAVAILABLE = {
    "BOYD1": "empirical data (contributed instance)",
    "BOYD2": "empirical data (contributed instance)",
    "DPKLO1": "data-defined SIF",
    "DUAL1": "random data baked into SIF",
    "DUAL2": "random data baked into SIF",
    "DUAL3": "random data baked into SIF",
    "DUAL4": "random data baked into SIF",
    "DUALC1": "random data baked into SIF",
    "DUALC2": "random data baked into SIF",
    "DUALC5": "random data baked into SIF",
    "DUALC8": "random data baked into SIF",
    "EXDATA": "experimental dataset",
    # LISWET2-6: same K=2 convex-regression structure as the verified
    # LISWET1/7-12 (m = 10000 = N-2 pins K=2), but the published optima
    # 24.9957..25.0343 straddle the mild-convex-g noise floor 24.99997
    # and a 28-candidate exact-IPM scan (tools/liswet_scan.py,
    # tools/liswet_scan_k.py) found no g reproducing them beyond 2e-5
    # rel — far weaker than the 1e-6..1e-9 fingerprints that verified
    # the rest of the family, so no assignment is claimed.  Round 4
    # (tools/liswet_scan26.py, 26 candidates + exact-PAVA K=1 test):
    # every convex g lands in [24.99979, 25.00000] — narrower than the
    # published spread 24.9957..25.0343 — and K=1 (isotonic) gives
    # 24.905; the variants must modify data beyond (g, K).
    "LISWET2": "g not identified (fingerprint scan inconclusive)",
    "LISWET3": "g not identified (fingerprint scan inconclusive)",
    "LISWET4": "g not identified (fingerprint scan inconclusive)",
    "LISWET5": "g not identified (fingerprint scan inconclusive)",
    "LISWET6": "g not identified (fingerprint scan inconclusive)",
    "LASER": "empirical dataset",
    # KSIP: structure known (degree-19 polynomial dominating a target
    # on a 1001-point grid, Kortanek-No semi-infinite QP) but the exact
    # cost/target pair is not identifiable: a 168-candidate fingerprint
    # scan (tools/ksip_scan.py: 7 costs x 12 targets x 2 runs) got no
    # closer than 5.3e-2 rel to the published 0.57579794.
    "KSIP": "cost/target not identified (fingerprint scan inconclusive)",
    # UBH1: dimensions pin a 3-D double-integrator control QP (9 vars x
    # 2001 points, 6x2000 dynamics rows, min 1/2 int ||u||^2), but the
    # horizon/BC conventions are not identifiable: a 384-candidate
    # exact-KKT scan (tools/ubh1_scan.py) got no closer than 4.4e-2 rel
    # to the published 1.1160008.
    "UBH1": "horizon/BCs not identified (fingerprint scan inconclusive)",
    # Formula-defined SIFs whose data conventions cannot be recovered
    # in this environment (no network, SIF text unavailable) and for
    # which no credible structural hypothesis emerged to scan:
    "GOULDQP2": "SIF loop data not recoverable without the file",
    "GOULDQP3": "SIF loop data not recoverable without the file",
    "HUES-MOD": "SIF data not recoverable without the file",
    "HUESTIS": "SIF data not recoverable without the file",
    "STCQP1": "SIF index formulas not recoverable without the file",
    "STCQP2": "SIF index formulas not recoverable without the file",
    "LOTSCHD": "empirical data",
    "MOSARQP1": "SIF pseudo-random data (generator not pinned)",
    "MOSARQP2": "SIF pseudo-random data (generator not pinned)",
    "PRIMAL1": "random data baked into SIF",
    "PRIMAL2": "random data baked into SIF",
    "PRIMAL3": "random data baked into SIF",
    "PRIMAL4": "random data baked into SIF",
    "PRIMALC1": "random data baked into SIF",
    "PRIMALC2": "random data baked into SIF",
    "PRIMALC5": "random data baked into SIF",
    "PRIMALC8": "random data baked into SIF",
    "STADAT1": "empirical data",
    "STADAT2": "empirical data",
    "STADAT3": "empirical data",
    "VALUES": "empirical data",
    "CONT-050": _CONT_REASON,
    "CONT-100": _CONT_REASON,
    "CONT-101": _CONT_REASON + " (x01 variants add 3N state-constraint rows)",
    "CONT-200": _CONT_REASON,
    "CONT-201": _CONT_REASON + " (x01 variants add 3N state-constraint rows)",
    "CONT-300": _CONT_REASON,
    "AUG2DQP": "bound structure not identified (exact active-set scan "
               "over uniform/subset/box bound hypotheses in "
               "tools/aug2d_qp_scan.py; box bounds provably infeasible, "
               "uniform-level root-finds land at non-structural values)",
    "AUG2DCQP": "bound structure not identified (same scan; closest "
                "candidate AUG2D + x>=-1 within 2.5e-5 rel, short of "
                "the <1e-5 fingerprint gate)",
    # AUG3D itself is now pinned (rel 7.6e-9 at the 10^3 grid,
    # tools/aug3d_scan.py) and lives in the corpus; its variants resist
    # the same scans that cracked the base problem:
    "AUG3DC": "PD-corrected convention not identified (tools/"
              "aug3d_scan.py: the verified AUG2DC recipe — boundary "
              "faces pulled to 1 with Dirichlet-corrected divergence — "
              "gives 1025.73 vs published 771.26 at the pinned 10^3 "
              "grid; scans over target value, correction scale, "
              "direction subsets, boundary weights and non-cubic grids "
              "all root-find at non-structural values)",
    "AUG3DQP": "bound structure not identified (active-set scans over "
               "uniform/subset/box bounds on the pinned AUG3D base; "
               "uniform-level crossing at non-structural x >= ~-1.7, "
               "mirroring the AUG2DQP finding that the QP variants "
               "also modify the divergence data)",
    "AUG3DCQP": "blocked on AUG3DC (base 'C' convention unidentified)",
}
# netlib-derived Q* problems — all empirical LP bases
for nm in ("Q25FV47 QADLITTL QAFIRO QBANDM QBEACONF QBORE3D QBRANDY "
           "QCAPRI QE226 QETAMACR QFFFFF80 QFORPLAN QGFRDXPN QGROW15 "
           "QGROW22 QGROW7 QISRAEL QPCBLEND QPCBOEI1 QPCBOEI2 QPCSTAIR "
           "QPILOTNO QRECIPE QSC205 QSCAGR25 QSCAGR7 QSCFXM1 QSCFXM2 "
           "QSCFXM3 QSCORPIO QSCRS8 QSCSD1 QSCSD6 QSCSD8 QSCTAP1 "
           "QSCTAP2 QSCTAP3 QSEBA QSHARE1B QSHARE2B QSHELL QSHIP04L "
           "QSHIP04S QSHIP08L QSHIP08S QSHIP12L QSHIP12S QSIERRA "
           "QSTAIR QSTANDAT").split():
    UNAVAILABLE[nm] = "netlib LP basis + quadratic (empirical data)"


def to_osqp_form(prob):
    """Canonical bound-appending mapping — single implementation in
    tools/maros_sif.py, shared with the fingerprint verifier."""
    import maros_sif as ms

    return ms.to_osqp_form(prob)


def verified_problems():
    """All fingerprint-verified generators (each reproduced its
    published optimum in f64 — see tools/verify_mm.py)."""
    import maros_sif as ms

    probs = list(ms.make_all_small())
    probs += [ms.hs118(), ms.hs268(), ms.s268()]
    for v, sz, n in ((1, "S", 100), (1, "M", 1000), (1, "L", 10000),
                     (2, "S", 100), (2, "M", 1000), (2, "L", 10000),
                     (3, "S", 100), (3, "M", 1000), (3, "L", 10000)):
        probs.append(ms.cvxqp(v, n, f"CVXQP{v}_{sz}"))
    probs.append(ms.aug2d())
    probs.append(ms.aug2dc())
    probs.append(ms.aug3d())
    probs.append(ms.qptest())
    probs.append(ms.powell20())
    probs.append(ms.dtoc3())
    for k in sorted(ms._LISWET_G):
        probs.append(ms.liswet(k))
    probs.append(ms.yao())
    return probs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    from osqp_tpu.io.qps_write import write_qps
    from osqp_tpu.io.qps import load_qps

    os.makedirs(OUT, exist_ok=True)
    index = {}
    for p in verified_problems():
        if args.verify:
            from verify_mm import fingerprint

            r = fingerprint(p)
            assert r["match"], (p["name"], r)
        A_full, l_full, u_full = to_osqp_form(p)
        path = os.path.join(OUT, f"{p['name']}.qps")
        write_qps(p["name"], p["P"], p["q"], A_full, l_full, u_full,
                  obj_constant=p["obj_const"], path=path)
        qp = load_qps(path)  # round-trip sanity through the real parser
        assert qp.n == p["q"].shape[0], (p["name"], qp.n)
        assert abs(qp.obj_constant - p["obj_const"]) < 1e-9 * (
            1 + abs(p["obj_const"])), p["name"]
        index[p["name"]] = dict(
            published=p["published"], source=p["source"],
            n=int(qp.n), m=int(qp.m),
        )
        print(f"{p['name']:<12} n={qp.n:<7} m={qp.m:<7} "
              f"pub={p['published']:+.7e}")

    pending = sorted(
        set(CANONICAL_138) - set(index) - set(UNAVAILABLE)
    )
    covered = dict(problems=index, unavailable=UNAVAILABLE,
                   pending_formula=pending,
                   counts=dict(verified=len(index),
                               unavailable=len(UNAVAILABLE),
                               pending=len(pending), total=138))
    extra = set(index) | set(UNAVAILABLE)
    assert extra <= set(CANONICAL_138), extra - set(CANONICAL_138)
    with open(os.path.join(OUT, "MM_INDEX.json"), "w") as f:
        json.dump(covered, f, indent=1, sort_keys=True)
    print(f"{len(index)} verified -> {OUT}; {len(UNAVAILABLE)} "
          f"unavailable (data); {len(pending)} formula-defined pending")


if __name__ == "__main__":
    main()
