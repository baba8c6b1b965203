#!/usr/bin/env python3
"""Diff two bench results per query: geomean ratio, regressions,
improvements. Accepts either the driver's BENCH_r{N}.json (with a
"tail" fragment) or a raw graft.Bench JSON line / file containing one.

Usage: tools/compare_bench.py OLD NEW [--reg-threshold 1.5]
"""
import json
import math
import re
import sys


def load_queries(path):
    txt = open(path).read()
    # driver format: {"tail": "...\"queries\":{...}"} possibly escaped
    try:
        d = json.loads(txt)
        if isinstance(d, dict) and "queries" in d:
            return d["queries"]
        if isinstance(d, dict) and "tail" in d:
            return {m.group(1): float(m.group(2)) for m in
                    re.finditer(r'\\?"?([a-z0-9_]+)\\?"?:([0-9.]+)', d["tail"])}
    except json.JSONDecodeError:
        pass
    line = next(l for l in txt.splitlines() if '"queries"' in l)
    return json.loads(line[line.index("{"):])["queries"]


def main():
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    thr = float(sys.argv[sys.argv.index("--reg-threshold") + 1]) \
        if "--reg-threshold" in sys.argv else 1.5
    common = [(q, old[q], new[q]) for q in new if q in old and old[q] > 0]
    if not common:
        raise SystemExit("no common queries")
    gm = math.exp(sum(math.log(n / o) for _, o, n in common) / len(common))
    print(f"old total {sum(old.values()):.1f}s/{len(old)}q  "
          f"new total {sum(new.values()):.1f}s/{len(new)}q  "
          f"common {len(common)}  geomean {gm:.2f}x")
    regs = sorted((x for x in common if x[2] > x[1] * thr and x[2] > 0.5),
                  key=lambda x: -(x[2] - x[1]))
    if regs:
        print(f"regressions (> {thr}x and > 0.5s — re-measure ISOLATED "
              "before believing any of these):")
        for q, o, n in regs:
            print(f"  {q:26s} {o:7.2f} -> {n:7.2f}  ({n / o:.2f}x)")
    imps = sorted((x for x in common if x[1] > x[2] * thr and x[1] > 0.5),
                  key=lambda x: -(x[1] - x[2]))
    if imps:
        print("improvements:")
        for q, o, n in imps:
            print(f"  {q:26s} {o:7.2f} -> {n:7.2f}  ({n / o:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only gates ({len(only_new)}): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
