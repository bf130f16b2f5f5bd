#!/usr/bin/env python3
"""Bench regression tripwire: diff two driver bench artifacts per query.

Usage:
    python3 dev/bench_compare.py [OLD.json NEW.json] [--quiet QUIET.json]

With no args, picks the two most recent BENCH_r*.json in the repo root.
Flags queries slower than REGRESSION_X (default 1.5x, override via env
GRAFT_BENCH_REGRESSION_X) in the new artifact, prints the total delta, and
separates "new queries" (cost growth that is scope, not regression) from
"common queries" (true per-query drift). Exit code 1 only when a common
query regressed past the threshold WHILE the fleet median stayed stable
(<= 1.2x) — that points at a per-query plan-level cause. When the median
itself drifted, the flagged queries share a global cause (box contention
or an engine-wide change), which is reported but exits 0.

Noise adjudication is part of the machinery, not the judge: before failing,
a flagged query is checked against the newest committed quiet-isolation
artifact (`BENCH_QUIET_r*.json`, written by `dev/bench_quiet.sh`: per-query
MINIMA over N nice/taskset re-runs). A flagged query whose quiet minimum is
within REGRESSION_X of its OLD cost demonstrably still runs at the old cost
when the box is quiet — the bench-artifact slowness was contention, and the
query is reported as NOISE instead of failing. A flagged query whose quiet
minimum is still past the threshold (or that the quiet artifact does not
cover) stays a failure. Only quiet artifacts from the NEW artifact's round
or later are consulted — a quiet record can only attest noise for an
artifact built from the same code it measured, so a stale record cannot
whitewash a regression introduced after it; `--quiet` overrides discovery
(for tests).

The driver artifact shape is {"parsed": {"value": sec, "queries": {...}}};
a raw Bench stdout line {"metric": "total", ...} is accepted too. The quiet
artifact shape is {"metric": "quiet_min", "queries": {...}}.
"""
import glob
import json
import os
import re
import statistics
import sys

REGRESSION_X = float(os.environ.get("GRAFT_BENCH_REGRESSION_X", "1.5"))
MIN_SECONDS = 0.3  # ignore sub-300ms queries: pure noise band
# A quiet minimum this small cannot evidence a plan regression no matter the
# ratio: when a query's OLD cost sits at/below the MIN_SECONDS noise band,
# any ratio against it is dominated by fixed per-query overhead (session
# warmup, JIT), so the adjudication needs an absolute floor too — twice the
# band the tripwire itself declares pure noise.
QUIET_FLOOR = 2 * MIN_SECONDS


def load(path):
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    return float(d["value"]), {k: float(v) for k, v in d["queries"].items()}


def artifact_round(path):
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None


def newest_artifacts():
    arts = sorted(glob.glob("BENCH_r*.json"), key=artifact_round)
    return (arts[-2], arts[-1]) if len(arts) >= 2 else None


def find_quiet(new_round):
    """Newest committed quiet-isolation record usable against NEW.

    A quiet record can only attest noise for an artifact built from the SAME
    code it measured, so only the record from the NEW artifact's exact round
    is consulted (the round-N sweep is measured on round-N code, the code
    that produces BENCH_rN). An earlier round's record would auto-clear a
    genuine regression introduced after it was measured; a LATER round's
    record is measured on changed code and could just as silently whitewash
    an rN regression that round N+1 happens to fix — neither may adjudicate.
    """
    quiets = [(artifact_round(p), p) for p in glob.glob("BENCH_QUIET_r*.json")
              if re.fullmatch(r"BENCH_QUIET_r\d+\.json", os.path.basename(p))]
    quiets = [(r, p) for r, p in quiets if r is not None]
    if new_round is None:
        return max(quiets)[1] if quiets else None
    exact = [p for r, p in quiets if r == new_round]
    if exact:
        return exact[0]
    later = [p for r, p in quiets if r > new_round]
    if later:
        print("note: no BENCH_QUIET_r%d.json; ignoring later-round quiet "
              "record(s) %s (measured on different code)"
              % (new_round, ", ".join(sorted(later))), file=sys.stderr)
    return None


def load_quiet(path):
    try:
        d = json.load(open(path))
        # provenance breadcrumb (records written by bench_quiet.sh since r17
        # carry the tree they measured — minima are only comparable across
        # identical code, and "same round" is weaker than "same tree")
        if d.get("tree"):
            print("quiet record %s measured tree %s" % (path, d["tree"]),
                  file=sys.stderr)
        return {k: float(v) for k, v in d.get("queries", {}).items()}
    except Exception:
        return {}


def main():
    # --flagged: machine mode for dev/bench_quiet.sh — print only the flagged
    # query names (one per line), no prose, no quiet adjudication (the quiet
    # run exists to MEASURE these queries), always exit 0
    argv = list(sys.argv[1:])
    flagged_only = "--flagged" in argv
    quiet_p = None
    if "--quiet" in argv:
        i = argv.index("--quiet")
        quiet_p = argv[i + 1]
        del argv[i:i + 2]
    argv = [a for a in argv if a != "--flagged"]
    if len(argv) == 2:
        old_p, new_p = argv
    elif not argv:
        pair = newest_artifacts()
        if pair is None:
            if not flagged_only:
                print("need two BENCH_r*.json artifacts")
            return 0
        old_p, new_p = pair
    else:
        print(f"usage: {sys.argv[0]} [OLD.json NEW.json] "
              f"[--quiet QUIET.json] [--flagged]")
        return 2
    old_total, old_q = load(old_p)
    new_total, new_q = load(new_p)

    if flagged_only:
        for q in sorted(set(old_q) & set(new_q)):
            if (max(old_q[q], new_q[q]) >= MIN_SECONDS and old_q[q] > 0
                    and new_q[q] / old_q[q] > REGRESSION_X):
                print(q)
        return 0

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
    if not flagged:
        print(f"no common query past {REGRESSION_X}x")
        return 0

    if quiet_p is None:
        quiet_p = find_quiet(artifact_round(new_p))
    quiet_q = load_quiet(quiet_p) if quiet_p else {}

    real = {}
    for q in sorted(flagged, key=flagged.get, reverse=True):
        qmin = quiet_q.get(q)
        if qmin is not None and qmin <= max(REGRESSION_X * old_q[q],
                                            QUIET_FLOOR):
            print(f"  NOISE {q}: {old_q[q]:.2f}s -> {new_q[q]:.2f}s "
                  f"({flagged[q]:.2f}x) but quiet minimum {qmin:.2f}s "
                  f"({quiet_p}) is within {REGRESSION_X}x of the old cost "
                  f"(or under the {QUIET_FLOOR:.1f}s noise floor) "
                  f"— contention, not a plan regression")
            continue
        real[q] = flagged[q]
        why = (f"quiet minimum {qmin:.2f}s ({quiet_p}) is ALSO past "
               f"{REGRESSION_X}x" if qmin is not None
               else "no quiet re-measurement covers it"
               + (f" in {quiet_p}" if quiet_p else
                  " (no BENCH_QUIET_r*.json from the new artifact's round)"))
        print(f"  REGRESSED {q}: {old_q[q]:.2f}s -> {new_q[q]:.2f}s "
              f"({flagged[q]:.2f}x; {why}) — check `sbt \"runMain "
              f"graft.PlanAudit /root/testdata/sf0.001 {q}\"` against the "
              f"previous round, or re-measure with `dev/bench_quiet.sh`")
    if not real:
        print("all flagged queries adjudicated as contention noise by quiet "
              "minima — no plan-level regression")
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
