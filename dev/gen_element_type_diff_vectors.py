#!/usr/bin/env python3
"""Differential vectors for calculate_element_type_percent_match (dev-only).

Runs the REFERENCE scorer (`metrics/element_type.py:43-94`) over seeded random
(output, source) frequency histograms and pins the percent match.
`ElementTypeDifferentialSpec` replays each through
`MetricsOps.elementTypePercentMatch`.
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference")

from unstructured.metrics.element_type import (  # noqa: E402
    calculate_element_type_percent_match,
)

rng = random.Random(550123)

TYPES = ["Title", "NarrativeText", "ListItem", "Table", "UncategorizedText", "Header"]
DEPTHS = [None, 0, 1, 2]


def rand_freq():
    n = rng.randint(0, 10)
    d = {}
    for _ in range(n):
        k = (rng.choice(TYPES), rng.choice(DEPTHS))
        d[k] = rng.randint(1, 12)
    return d


def main():
    cases = []
    for i in range(200):
        out = rand_freq()
        src = rand_freq()
        if rng.random() < 0.3 and src:
            # overlap-heavy: output derived from source with noise
            out = {k: max(1, v + rng.randint(-3, 3)) for k, v in src.items()
                   if rng.random() < 0.8}
            for _ in range(rng.randint(0, 3)):
                out[(rng.choice(TYPES), rng.choice(DEPTHS))] = rng.randint(1, 5)
        weight = rng.choice([0.5, 0.5, 0.5, 0.25, 1.0])
        pct = calculate_element_type_percent_match(out, src, category_depth_weight=weight)
        def ser(d):
            return [{"t": k[0], "d": k[1], "n": v} for k, v in d.items()]
        cases.append({"case": i, "output": ser(out), "source": ser(src),
                      "weight": weight, "pct": pct})
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/element_type_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    print("wrote", len(cases), "cases")


if __name__ == "__main__":
    main()
