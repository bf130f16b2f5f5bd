#!/usr/bin/env python3
"""Bench regression tripwire: diff two driver bench artifacts per query.

Usage:
    python3 dev/bench_compare.py [OLD.json NEW.json]

With no args, picks the two most recent BENCH_r*.json in the repo root.
Flags queries slower than REGRESSION_X (default 1.5x, override via env
GRAFT_BENCH_REGRESSION_X) in the new artifact, prints the total delta, and
separates "new queries" (cost growth that is scope, not regression) from
"common queries" (true per-query drift). Exit code 1 only when a common
query regressed past the threshold WHILE the fleet median stayed stable
(<= 1.2x) — that points at a per-query plan-level cause. When the median
itself drifted, the flagged queries share a global cause (box contention
or an engine-wide change), which is reported but exits 0.

The driver artifact shape is {"parsed": {"value": sec, "queries": {...}}};
a raw Bench stdout line {"metric": "total", ...} is accepted too.
"""
import glob
import json
import os
import re
import statistics
import sys

REGRESSION_X = float(os.environ.get("GRAFT_BENCH_REGRESSION_X", "1.5"))
MIN_SECONDS = 0.3  # ignore sub-300ms queries: pure noise band


def load(path):
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    return float(d["value"]), {k: float(v) for k, v in d["queries"].items()}


def main():
    # --flagged: machine mode for dev/bench_quiet.sh — print only the flagged
    # query names (one per line), no prose, always exit 0
    argv = [a for a in sys.argv[1:] if a != "--flagged"]
    flagged_only = len(argv) != len(sys.argv) - 1
    if flagged_only:
        if len(argv) == 2:
            old_p, new_p = argv
        else:
            arts = sorted(glob.glob("BENCH_r*.json"),
                          key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
            if len(arts) < 2:
                return 0
            old_p, new_p = arts[-2], arts[-1]
        old_total, old_q = load(old_p)
        new_total, new_q = load(new_p)
        common = set(old_q) & set(new_q)
        for q in sorted(common):
            if (max(old_q[q], new_q[q]) >= MIN_SECONDS and old_q[q] > 0
                    and new_q[q] / old_q[q] > REGRESSION_X):
                print(q)
        return 0
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(glob.glob("BENCH_r*.json"),
                      key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if len(arts) < 2:
            print("need two BENCH_r*.json artifacts")
            return 0
        old_p, new_p = arts[-2], arts[-1]
    old_total, old_q = load(old_p)
    new_total, new_q = load(new_p)

    common = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))

    print(f"{old_p}: {old_total:.1f}s / {len(old_q)} queries")
    print(f"{new_p}: {new_total:.1f}s / {len(new_q)} queries "
          f"(delta {new_total - old_total:+.1f}s)")
    if added:
        print(f"new queries (+{sum(new_q[q] for q in added):.1f}s, scope "
              f"not regression): {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")

    # noise filter on the LARGER side only: a 0.2s query regressing to 10s
    # must still flag; only tiny-to-tiny jitter is excluded
    ratios = {q: new_q[q] / old_q[q] for q in common
              if max(old_q[q], new_q[q]) >= MIN_SECONDS and old_q[q] > 0}
    if not ratios:
        print("no comparable common queries")
        return 0
    med = statistics.median(ratios.values())
    print(f"common-query median ratio: {med:.2f}x "
          f"({'fleet-wide drift — box contention or global change' if med > 1.2 else 'stable'})")

    flagged = {q: r for q, r in ratios.items() if r > REGRESSION_X}
    for q in sorted(flagged, key=flagged.get, reverse=True):
        print(f"  REGRESSED {q}: {old_q[q]:.2f}s -> {new_q[q]:.2f}s "
              f"({flagged[q]:.2f}x) — check `sbt \"runMain graft.PlanAudit "
              f"/root/testdata/sf0.001 {q}\"` against the previous round")
    if not flagged:
        print(f"no common query past {REGRESSION_X}x")
        return 0
    # a fleet-wide drift means the flagged queries share a global cause
    # (contention / engine-wide change): report, exit 0; a stable median
    # with outliers is a per-query plan regression: exit 1
    if med > 1.2:
        print("note: median also drifted — flagged queries are likely the same "
              "global cause (contention), not per-query plan regressions")
        return 0
    print("FAIL: per-query regression with a stable fleet median "
          "(plan-level cause likely)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
