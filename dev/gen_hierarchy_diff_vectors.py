#!/usr/bin/env python3
"""Differential vectors for set_element_hierarchy (dev-only).

Runs the REFERENCE stack sweep (`partition/common/metadata.py:99-147`,
`HIERARCHY_RULE_SET`) over seeded random element streams and pins each
element's parent as a source INDEX (the reference assigns random UUID ids, so
identity is mapped back by object). `HierarchyDifferentialSpec` replays each
stream through `MetadataOps.setElementHierarchy`.
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
_stub("iso639", Lang=object)


class _DF:
    seed = 0


_lde = types.ModuleType("langdetect.lang_detect_exception")


class LangDetectException(Exception):
    pass


_lde.LangDetectException = LangDetectException
_stub("langdetect", DetectorFactory=_DF, detect_langs=lambda t: [],
      lang_detect_exception=_lde)
sys.modules["langdetect.lang_detect_exception"] = _lde

from unstructured.documents.elements import (  # noqa: E402
    Address,
    CheckBox,
    ElementMetadata,
    EmailAddress,
    FigureCaption,
    Footer,
    Header,
    ListItem,
    NarrativeText,
    PageBreak,
    Table,
    Text,
    Title,
)
from unstructured.partition.common.metadata import set_element_hierarchy  # noqa: E402

rng = random.Random(660088)

CTORS = {
    "Title": Title, "NarrativeText": NarrativeText, "ListItem": ListItem,
    "UncategorizedText": Text, "Header": Header, "Footer": Footer,
    "FigureCaption": FigureCaption, "Table": Table, "Address": Address,
    "EmailAddress": EmailAddress, "PageBreak": PageBreak,
}
KINDS = list(CTORS)


def main():
    cases = []
    for i in range(150):
        n = rng.randint(0, 18)
        desc = []
        els = []
        for j in range(n):
            kind = rng.choice(KINDS)
            depth = rng.choice([None, None, 0, 0, 1, 1, 2, 3])
            # occasionally pre-set a parent_id, which the sweep must preserve
            preset = rng.random() < 0.05
            meta = {}
            if depth is not None:
                meta["category_depth"] = depth
            if preset:
                meta["parent_id"] = "preset-%d" % j
            desc.append({"type": kind, "depth": depth,
                         "preset": "preset-%d" % j if preset else None})
            if kind == "CheckBox":
                els.append(CheckBox(metadata=ElementMetadata(**meta)))
            else:
                els.append(CTORS[kind]("t%d" % j, metadata=ElementMetadata(**meta)))
        out = set_element_hierarchy(els)
        id_to_ix = {}
        for ix, e in enumerate(out):
            id_to_ix[e.id] = ix
        parents = []
        for e in out:
            pid = e.metadata.parent_id
            if pid is None:
                parents.append(None)
            elif pid.startswith("preset-"):
                parents.append(pid)
            else:
                parents.append(id_to_ix.get(pid, "?"))
        cases.append({"case": i, "elements": desc, "parents": parents})
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/hierarchy_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    print("wrote", len(cases), "cases")


if __name__ == "__main__":
    main()
