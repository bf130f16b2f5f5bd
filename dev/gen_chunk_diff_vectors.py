#!/usr/bin/env python3
"""Differential-vector generator for the chunking kernel (dev-only, not shipped).

Runs the REFERENCE chunker (`/root/reference/unstructured/chunking/`) on a seeded
pseudo-random corpus of element streams x option sets and pins (input, options,
expected chunks) as NDJSON under src/test/resources/graft/refvec/. The Scala
`ChunkerDifferentialSpec` replays every case through `Chunker.chunkDoc` and
asserts byte-identical text, categories, continuation flags, and consolidated
metadata. Pure-Python modules only — third-party imports the exercised code
paths never reach (emoji/psutil/lxml) are stubbed at name level; any case that
would actually hit a stubbed call raises and aborts generation.
"""
import json
import random
import sys
import types
import base64
import os
import zlib

sys.path.insert(0, "/root/reference")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _ParserError(Exception):
    pass


def _unavailable(*a, **k):
    raise RuntimeError("stubbed third-party call reached")


_stub("emoji", is_emoji=lambda c: False)
_stub("psutil")
_stub("lxml")
_stub("lxml.etree", ParserError=_ParserError, tostring=_unavailable)
_stub("lxml.html", fragment_fromstring=_unavailable, HtmlElement=object)

from unstructured.chunking.basic import chunk_elements  # noqa: E402
from unstructured.chunking.title import chunk_by_title  # noqa: E402
from unstructured.documents.elements import (  # noqa: E402
    CheckBox,
    ElementMetadata,
    ListItem,
    NarrativeText,
    PageBreak,
    Table,
    Text,
    Title,
)

rng = random.Random(20260814)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "naïve", "café", "日本語", "δοκιμή", "Тест", "emoji🙂mid", "O'Neill",
    'he said "hi"', "tab\tsep", "trailing  double", "semi;colon", "percent%",
    # whitespace Python recognizes but Java's Character.isWhitespace does not:
    # NEL, NBSP, figure space, narrow NBSP — plus ideographic space (both do)
    "nelsep", "nbsp join", "fig sp", "narrow nb",
    "ideo　sp", " lead", "tail",
]

CTORS = {
    "Title": Title,
    "NarrativeText": NarrativeText,
    "ListItem": ListItem,
    "UncategorizedText": Text,
    "PageBreak": PageBreak,
    # text-only Table (no text_as_html): exercises the table-isolation and
    # text-mode TableChunk splitting paths without touching lxml
    "Table": Table,
    "CheckBox": CheckBox,
}


def rand_text(kind):
    """Element text with splitter-hostile shapes."""
    r = rng.random()
    if kind in ("PageBreak", "CheckBox"):
        return ""
    if r < 0.05:
        return ""  # empty text
    if r < 0.12:
        # one long unbroken token -> forces mid-word hard cuts
        return "x" * rng.randint(40, 260)
    n = rng.randint(1, 45)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(WORDS))
        q = rng.random()
        if q < 0.08:
            parts.append("\n")
        elif q < 0.10:
            parts.append("\n\n")
    sep = " "
    text = sep.join(parts)
    if rng.random() < 0.1:
        text = "  " + text + " "
    return text


def rand_meta(page):
    kw = {}
    if page is not None:
        kw["page_number"] = page
    if rng.random() < 0.3:
        k = rng.randint(1, 3)
        kw["emphasized_text_contents"] = [rng.choice(WORDS) for _ in range(k)]
        kw["emphasized_text_tags"] = [rng.choice(["b", "i", "bi"]) for _ in range(k)]
    if rng.random() < 0.2:
        k = rng.randint(1, 2)
        kw["link_texts"] = [rng.choice(WORDS) for _ in range(k)]
        kw["link_urls"] = ["https://example.com/%d" % rng.randint(0, 99) for _ in range(k)]
    if rng.random() < 0.25:
        kw["languages"] = rng.sample(["eng", "deu", "fra", "spa"], rng.randint(1, 2))
    return kw


def gen_elements():
    n = rng.randint(0, 22)
    use_pages = rng.random() < 0.6
    page = 1 if use_pages else None
    out = []
    for _ in range(n):
        kind = rng.choices(
            ["NarrativeText", "Title", "ListItem", "UncategorizedText", "PageBreak",
             "Table", "CheckBox"],
            weights=[42, 13, 13, 9, 9, 10, 4],
        )[0]
        if use_pages and rng.random() < 0.15:
            page += 1
        text = rand_text(kind)
        meta = rand_meta(page)
        out.append((kind, text, meta))
    return out


def gen_opts(by_title):
    max_characters = rng.choice([20, 35, 50, 80, 120, 200, 500])
    opts = {"max_characters": max_characters}
    if rng.random() < 0.6:
        opts["new_after_n_chars"] = rng.randint(0, max_characters)
    if rng.random() < 0.5:
        opts["overlap"] = rng.randint(1, max(1, max_characters // 3))
        opts["overlap_all"] = rng.random() < 0.5
    opts["include_orig_elements"] = rng.random() < 0.3
    # table knobs (exposed by both strategies)
    if rng.random() < 0.25:
        opts["isolate_table"] = False
    elif rng.random() < 0.15:
        opts["skip_table_chunking"] = True
    if rng.random() < 0.2:
        opts["repeat_table_headers"] = False
    if by_title:
        if rng.random() < 0.6:
            cap = opts.get("new_after_n_chars", max_characters)
            hi = max_characters
            opts["combine_text_under_n_chars"] = rng.randint(0, hi)
        opts["multipage_sections"] = rng.random() < 0.5
    return opts


def decode_orig(meta):
    if meta.orig_elements is None:
        return None
    # the reference wire uses zlib (not gzip) framing despite the function name
    raw = zlib.decompress(base64.b64decode(meta.to_dict()["orig_elements"]))
    arr = json.loads(raw)
    return {
        "types": [d["type"] for d in arr],
        "texts": [d.get("text", "") for d in arr],
    }


def run_case(i, by_title):
    els_desc = gen_elements()
    opts = gen_opts(by_title)
    elements = []
    for kind, text, meta in els_desc:
        if kind == "CheckBox":  # CheckBox's first positional arg is element_id
            elements.append(CheckBox(metadata=ElementMetadata(**meta)))
        else:
            elements.append(CTORS[kind](text, metadata=ElementMetadata(**meta)))
    fn = chunk_by_title if by_title else chunk_elements
    chunks = fn(elements, **opts)
    out_chunks = []
    for c in chunks:
        m = c.metadata
        out_chunks.append(
            {
                "type": c.category,
                "text": c.text,
                "is_continuation": bool(getattr(m, "is_continuation", False) or False),
                "page_number": m.page_number,
                "emphasized_text_contents": m.emphasized_text_contents,
                "emphasized_text_tags": m.emphasized_text_tags,
                "link_texts": m.link_texts,
                "link_urls": m.link_urls,
                "languages": m.languages,
                "orig": decode_orig(m),
            }
        )
    return {
        "case": i,
        "strategy": "by_title" if by_title else "basic",
        "opts": opts,
        "elements": [
            {"type": k, "text": t, "meta": meta} for (k, t, meta) in els_desc
        ],
        "chunks": out_chunks,
    }


def main():
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/chunker_diff.ndjson",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    n_cases = 160
    with open(out_path, "w", encoding="utf-8") as f:
        for i in range(n_cases):
            case = run_case(i, by_title=(i % 2 == 1))
            f.write(json.dumps(case, ensure_ascii=False) + "\n")
    print("wrote", n_cases, "cases to", out_path)


if __name__ == "__main__":
    main()
