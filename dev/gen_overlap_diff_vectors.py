#!/usr/bin/env python3
"""Differential-vector generator for bbox overlap/nesting diagnostics (dev-only).

Runs the REFERENCE `identify_overlapping_or_nesting_case` (`utils.py:461-644`)
over seeded random (box pair, label pair, text pair) cases and pins the case
string, percentages, and n-gram share. `OverlapDifferentialSpec` replays each
through `graft.operators.LayoutOps.overlappingPairsWithText`.
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference")

from unstructured.utils import (  # noqa: E402
    identify_overlapping_or_nesting_case,
    is_parent_box,
)

rng = random.Random(777001)

TYPES = ["Title", "Text", "Table", "Image", "NarrativeText"]
VOCAB = ["fox", "dog", "lane", "bear", "walk", "red", "big", "end", "met", "friendly"]


def rand_box():
    x1 = rng.randint(0, 500)
    y1 = rng.randint(0, 700)
    return [x1, y1, x1 + rng.randint(0, 240), y1 + rng.randint(0, 120)]


def nested_box(outer, tol_ok):
    x1, y1, x2, y2 = outer
    dx = rng.randint(-4, 30) if tol_ok else rng.randint(8, 40)
    return [x1 + dx, y1 + rng.randint(-4, 20),
            max(x1 + dx, x2 - rng.randint(-4, 20)), max(y1, y2 - rng.randint(-4, 20))]


def rand_text():
    r = rng.random()
    if r < 0.15:
        return ""
    n = rng.randint(1, 12)
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def to_points(b):
    x1, y1, x2, y2 = b
    return [(x1, y1), (x1, y2), (x2, y2), (x2, y1)]


def main():
    cases = []
    for i in range(300):
        box1 = rand_box()
        r = rng.random()
        if r < 0.30:
            box2 = nested_box(box1, tol_ok=rng.random() < 0.7)
        elif r < 0.45:
            # shifted copy -> partial overlaps around the 10% threshold
            dx = rng.randint(1, max(2, (box1[2] - box1[0])))
            box2 = [box1[0] + dx, box1[1] + rng.randint(0, 40),
                    box1[2] + dx, box1[3] + rng.randint(0, 40)]
        else:
            box2 = rand_box()
        t1 = rand_text()
        t2 = rand_text()
        if rng.random() < 0.2 and t1:
            t2 = t1 if rng.random() < 0.5 else ("pre " + t1 + " post")
        type1, type2 = rng.choice(TYPES), rng.choice(TYPES)
        # real pipeline label shape: f"{ix}. {category}" (utils.py:587)
        label1, label2 = f"0. {type1}", f"1. {type2}"
        (elements, parent, case, pct, pct_total, ngram_pct,
         max_area, min_area, total_area) = identify_overlapping_or_nesting_case(
            (to_points(box1), to_points(box2)), (label1, label2), (t1, t2),
            nested_error_tolerance_px=5, sm_overlap_threshold=10.0)
        b1c = (box1[0], box1[1], box1[2], box1[3])
        b2c = (box2[0], box2[1], box2[2], box2[3])
        cases.append({
            "case": i, "box1": box1, "box2": box2,
            "nested_2_in_1": is_parent_box(b1c, b2c, add=5),
            "nested_1_in_2": is_parent_box(b2c, b1c, add=5),
            "type1": type1, "type2": type2, "text1": t1, "text2": t2,
            "overlap_case": case, "pct": pct, "pct_total": pct_total,
            "ngram_pct": ngram_pct})
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/overlap_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    n_overlap = sum(1 for c in cases if c["overlap_case"])
    print("wrote", len(cases), "cases,", n_overlap, "with overlap")


if __name__ == "__main__":
    main()
