"""f32-on-device correctness leg (the reference CI's DFLOAT config).

Runs the ``f32``-marked subset of the pytest suite on the DEFAULT
backend (the real TPU in the bench environment) in float32 at f32-grade
tolerances, and records the outcome in F32_DEVICE_r03.json.  Mirrors
the reference's DFLOAT CI configuration (main.yml flag matrix): the
production precision gets a correctness gate, not just a throughput
number.

Usage: python tools/run_f32_leg.py [--out F32_DEVICE_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="F32_DEVICE_r03.json")
    args = ap.parse_args()

    env = dict(os.environ)
    env["OSQP_TPU_TEST_F32"] = "1"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "f32",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    out = proc.stdout + proc.stderr
    tail = "\n".join(out.strip().splitlines()[-12:])
    print(tail)
    m = re.search(r"(\d+) passed", out)
    s = re.search(r"(\d+) skipped", out)
    f = re.search(r"(\d+) failed", out)
    art = dict(
        mode="OSQP_TPU_TEST_F32=1 (default backend, float32)",
        passed=int(m.group(1)) if m else 0,
        failed=int(f.group(1)) if f else 0,
        skipped=int(s.group(1)) if s else 0,
        returncode=proc.returncode,
        wall_time=round(time.perf_counter() - t0, 1),
        summary_tail=tail,
    )
    with open(os.path.join(REPO, args.out), "w") as fjson:
        json.dump(art, fjson, indent=1)
    print(json.dumps({k: art[k] for k in ("passed", "failed", "skipped",
                                          "returncode", "wall_time")}))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
