#!/usr/bin/env python3
"""Differential-vector generator for XY-cut reading-order sorting (dev-only).

Runs the REFERENCE `sort_bboxes_by_xy_cut` (`partition/utils/sorting.py`,
`xycut.py` — numba stubbed to plain Python, semantics unchanged) over seeded
random page layouts and pins (boxes, direction, shrink_factor, order) rows.
`XyCutDifferentialSpec` replays each through `graft.operators.Sorting`.
"""
import json
import os
import random
import sys
import types

sys.path.insert(0, "/root/reference")

numba = types.ModuleType("numba")


def njit(*a, **k):
    if len(a) == 1 and callable(a[0]):
        return a[0]
    return lambda f: f


numba.njit = njit
sys.modules["numba"] = numba

from unstructured.partition.utils.sorting import sort_bboxes_by_xy_cut  # noqa: E402

rng = random.Random(40271)


def layout_random(n):
    out = []
    for _ in range(n):
        x1 = rng.randint(0, 900)
        y1 = rng.randint(0, 1200)
        w = rng.randint(0, 300)
        h = rng.randint(0, 80)
        out.append([x1, y1, x1 + w, y1 + h])
    return out


def layout_columns(n):
    out = []
    for i in range(n):
        col = i % 2
        x1 = 60 + col * 480 + rng.randint(-10, 10)
        y1 = 80 + (i // 2) * 90 + rng.randint(-8, 8)
        out.append([x1, y1, x1 + 380 + rng.randint(-30, 30), y1 + 60])
    return out


def layout_rows(n):
    out = []
    for i in range(n):
        y1 = 40 + i * 70
        x1 = 50 + rng.randint(0, 40)
        out.append([x1, y1, x1 + 700, y1 + 50])
    return out


def layout_nested(n):
    out = [[50, 50, 850, 1150]]
    for _ in range(n - 1):
        x1 = rng.randint(80, 600)
        y1 = rng.randint(80, 900)
        out.append([x1, y1, x1 + rng.randint(20, 200), y1 + rng.randint(10, 120)])
    return out


def main():
    cases = []
    mk = [layout_random, layout_columns, layout_rows, layout_nested]
    i = 0
    for rep in range(30):
        for f in mk:
            n = rng.randint(1, 14)
            boxes = f(max(1, n))
            rng.shuffle(boxes)
            for direction in ("x", "y"):
                shrink = rng.choice([0.9, 0.9, 1.0, 0.5])
                order = sort_bboxes_by_xy_cut(
                    boxes, shrink_factor=shrink, xy_cut_primary_direction=direction)
                cases.append({"case": i, "boxes": boxes, "direction": direction,
                              "shrink": shrink, "order": [int(x) for x in order]})
                i += 1
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/xycut_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    print("wrote", len(cases), "cases")


if __name__ == "__main__":
    main()
