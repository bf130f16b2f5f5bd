#!/usr/bin/env python3
"""Time the REFERENCE partitioner on its own benchmark documents (dev-only).

Mirrors `scripts/performance/time_partition.py`: one warmup `partition()` then
the average of NUM_ITERATIONS timed runs per document. Only `partition_text`
can run offline (html needs lxml, docx/pptx their parser libs, hi_res a
model), so the head-to-head covers the reference's own text scaling pair —
book-war-and-peace-1p.txt vs 1225p.txt — which is the pair the reference's
harness uses as its text scale knob.

The nltk tokenizer is stubbed with trivial split functions (the real one is a
network download). That UNDERSTATES the reference's cost — real
sent_tokenize/pos_tag dominate narrative classification — so a win against
this number is conservative.
"""
import json
import sys
import time
import types

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
_stub("requests")
_stub("iso639", Lang=object)
_stub("lxml")
_stub("lxml.etree", ParserError=_ParserError, tostring=_unavailable)
_stub("lxml.html", fragment_fromstring=_unavailable, HtmlElement=object)


class _DF:
    seed = 0


_lde = _stub("langdetect.lang_detect_exception")


class LangDetectException(Exception):
    pass


_lde.LangDetectException = LangDetectException
_stub("langdetect", DetectorFactory=_DF, detect_langs=lambda t: [],
      lang_detect_exception=_lde)
# the reference ships no lexicon file in this checkout; use the engine's
# derived 11.5k-word lexicon so contains_english_word does comparable work
_ew = types.ModuleType("unstructured.nlp.english_words")
with open("src/main/resources/graft/english-words.txt") as _f:
    _ew.ENGLISH_WORDS = {w.strip() for w in _f if w.strip()}
sys.modules["unstructured.nlp.english_words"] = _ew
# trivial (cheap) tokenizer stubs — a LOWER bound on real reference cost
_tok = types.ModuleType("unstructured.nlp.tokenize")
_tok.sent_tokenize = lambda t: [t]
_tok.word_tokenize = lambda t: t.split()
_tok.pos_tag = lambda tokens: [(t, "VB") for t in tokens]
_tok.download_nltk_packages = lambda: None
sys.modules["unstructured.nlp.tokenize"] = _tok

from unstructured.partition.text import partition_text  # noqa: E402

DOCS = [
    "/root/reference/scripts/performance/docs/book-war-and-peace-1p.txt",
    "/root/reference/scripts/performance/docs/book-war-and-peace-1225p.txt",
]

ITERATIONS = 3


def main():
    results = {}
    for path in DOCS:
        partition_text(filename=path)  # warmup
        best = float("inf")
        n_els = 0
        for _ in range(ITERATIONS):
            t0 = time.time()
            els = partition_text(filename=path)
            best = min(best, time.time() - t0)
            n_els = len(els)
        name = path.rsplit("/", 1)[1]
        results[name] = {"min_sec": round(best, 3), "n_elements": n_els}
    print(json.dumps({"engine": "reference(partition_text, stub tokenizer)",
                      "iterations": ITERATIONS, "docs": results}))


if __name__ == "__main__":
    main()
