#!/usr/bin/env python3
"""Round-6 soak (round-5 verdict task 5): run the FULL gate set once at
sf0.1 and once on the 3x key-shifted soak slice (soakdata/sf0.3, built
by gen_soak.py), and record the scaling ratio per gate. A gate whose
cost is ~linear in data lands near 3x; an O(n^2) surprise lands >>4x
(the judge's "no query >4x its sf0.1-scaled expectation" reads
ratio <= 4 given the 3x data). Sub-second sf0.1 gates are noise-prone;
the ratio bar is applied to gates with sf0.1 >= 0.5s and the rest are
recorded for completeness.

Round 7 adds a skew mode: point soak_dir at soakdata/sf0.3skew (built
by gen_soak.py --skew) — same 3x volume, adversarial key distribution
(mega-source, hot gram, hot join key). A skew-safe gate still lands
~3x; a skew-broken one funnels most of the corpus through one task.

Usage: tools/run_soak.py [out_json] [gates_csv] [soak_dir]
(run from the repo root)
"""
import json
import os
import re
import subprocess
import sys
import time

GATES = sys.argv[2] if len(sys.argv) > 2 else ""  # empty = all gates
OUT = sys.argv[1] if len(sys.argv) > 1 else "SOAK_r6.json"
SOAK_DIR = sys.argv[3] if len(sys.argv) > 3 else "soakdata/sf0.3"
# round provenance must be EXPLICIT (the r12 soak artifacts shipped a
# stale hard-coded round) -- pass it as the 4th arg
ROUND = int(sys.argv[4]) if len(sys.argv) > 4 else None


def run_bench(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_REPS="1", SPARK_GRAFT_CPUS="32")
    if GATES:
        env["SPARK_GRAFT_ONLY"] = GATES
    t0 = time.time()
    p = subprocess.run(["sbt", "runMain graft.Bench"], env=env,
                       capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    # sbt prefixes stdout lines with "[info] " — parse from the first brace
    line = next((ln[ln.index("{"):] for ln in p.stdout.splitlines()
                 if "{" in ln and '"queries"' in ln), None)
    if line is None:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-3000:] + "\n")
        raise SystemExit(f"no bench JSON line for {sf_dir} (rc={p.returncode})")
    return json.loads(line), wall


def main():
    base, base_wall = run_bench("/root/testdata/sf0.1")
    soak, soak_wall = run_bench(SOAK_DIR)
    rows = {}
    worst = (None, 0.0)
    for q, b in base["queries"].items():
        s = soak["queries"].get(q, -1.0)
        ratio = round(s / b, 2) if b > 0 and s >= 0 else None
        rows[q] = {"sf0.1_sec": b, "sf0.3_sec": s, "ratio": ratio}
        # the ratio bar applies where the sf0.1 time is above noise
        if ratio is not None and b >= 0.5 and ratio > worst[1]:
            worst = (q, ratio)
    out = {
        "round": ROUND,
        "soak_dir": SOAK_DIR,
        "data_scale": 3.0,
        "gates": rows,
        "worst": {"query": worst[0], "ratio": worst[1]},
        "pass": worst[1] <= 4.0,
        "base_wall_sec": round(base_wall, 1),
        "soak_wall_sec": round(soak_wall, 1),
        "note": "FULL gate set; soak slice = 3 key-shifted copies of "
                "sf0.1 (tools/gen_soak.py); reps=1; ratio = sf0.3/sf0.1 "
                "wall — linear gates land ~3x, pass bar is 4x on gates "
                "with sf0.1 >= 0.5s (sub-second gates are noise-bound)",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"worst": worst, "pass": out["pass"]}))


if __name__ == "__main__":
    main()
