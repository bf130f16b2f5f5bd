#!/usr/bin/env python3
"""Differential vectors for coordinate-system conversion (dev-only).

Runs the REFERENCE `convert_coordinates_to_new_system`
(`documents/coordinates.py`) over seeded random points between
PixelSpace/PointSpace/RelativeCoordinateSystem instances and pins the results.
`CoordinatesDifferentialSpec` replays through `graft.functions.Coordinates`.
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference")

from unstructured.documents.coordinates import (  # noqa: E402
    PixelSpace,
    PointSpace,
    RelativeCoordinateSystem,
)

rng = random.Random(909011)


def rand_system():
    kind = rng.choice(["pixel", "point", "relative"])
    if kind == "relative":
        return kind, None, None, RelativeCoordinateSystem()
    w = rng.choice([612, 792, 1000, 1700, 2200, 100])
    h = rng.choice([612, 792, 1000, 1700, 2200, 100])
    return kind, w, h, (PixelSpace if kind == "pixel" else PointSpace)(width=w, height=h)


def main():
    cases = []
    for i in range(200):
        fk, fw, fh, fsys = rand_system()
        tk, tw, th, tsys = rand_system()
        if fk == "relative":
            x, y = rng.random(), rng.random()
        else:
            x, y = rng.uniform(-10, fw + 10), rng.uniform(-10, fh + 10)
        nx, ny = fsys.convert_coordinates_to_new_system(tsys, x, y)
        cases.append({"case": i, "from_kind": fk, "from_w": fw, "from_h": fh,
                      "to_kind": tk, "to_w": tw, "to_h": th,
                      "x": x, "y": y, "nx": nx, "ny": ny})
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/coordinates_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    print("wrote", len(cases), "cases")


if __name__ == "__main__":
    main()
