#!/usr/bin/env python3
"""Differential vectors for the chunk->reconstruct table round trip (dev-only).

Runs the REFERENCE pipeline — `chunk_elements([Table(text)])` followed by
`reconstruct_table_from_chunks` (`chunking/dispatch.py:146-325`) — over seeded
random table texts and window sizes, pinning both the intermediate TableChunk
texts and the reconstructed table. `TableReconstructDifferentialSpec` replays
through `Chunker.chunkDoc` + `Chunker.reconstructTable`.
"""
import json
import os
import random
import sys
import types

sys.path.insert(0, "/root/reference")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_stub("emoji", is_emoji=lambda c: False)
_stub("psutil")


class _PE(Exception):
    pass


def _no(*a, **k):
    raise RuntimeError("lxml called")


_stub("lxml")
_stub("lxml.etree", ParserError=_PE, tostring=_no)
_stub("lxml.html", fragment_fromstring=_no, HtmlElement=object)

from unstructured.chunking.basic import chunk_elements  # noqa: E402
from unstructured.chunking.dispatch import reconstruct_table_from_chunks  # noqa: E402
from unstructured.documents.elements import Table  # noqa: E402

rng = random.Random(881100)

WORDS = ["r1a", "r1b", "val", "123", "x-9", "naïve", "日本語", "emoji🙂", "end.",
         "cell", "sum", "Q4", "±3", "n/a"]


def rand_table_text():
    n = rng.randint(3, 160)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(WORDS))
        if rng.random() < 0.06:
            parts.append("\n")
    return " ".join(parts)


def main():
    cases = []
    for i in range(120):
        text = rand_table_text()
        maxc = rng.choice([30, 50, 80, 120, 200])
        chunks = chunk_elements([Table(text)], max_characters=maxc,
                                include_orig_elements=False)
        rec = reconstruct_table_from_chunks(list(chunks))
        cases.append({
            "case": i, "text": text, "max_characters": maxc,
            "chunks": [{"type": c.category, "text": c.text,
                        "chunk_index": c.metadata.chunk_index} for c in chunks],
            "reconstructed": [{"type": e.category, "text": e.text} for e in rec]})
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/table_reconstruct_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c, ensure_ascii=False) + "\n")
    print("wrote", len(cases), "cases")


if __name__ == "__main__":
    main()
