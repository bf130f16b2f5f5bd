#!/usr/bin/env python3
"""Golden vector for partition_text on the reference's largest text document
(dev-only): runs the REFERENCE partitioner over book-war-and-peace-1225p.txt
and pins one line per element — category + utf-8 sha256 prefix of the text —
so any drift in paragraph splitting, broken-paragraph grouping or the
classifier cascade on REAL narrative data fails `BookGoldenSpec` with the
exact first diverging element.

Classification caveat: sent_tokenize/pos_tag are stubbed (nltk is a network
download) with `[t]` / every-word-is-a-verb — under that stub
`is_possible_narrative_text`'s sentence-or-verb gate always passes, which the
engine's replay mirrors via `verbAlwaysTrue`. Everything upstream of the gate
(splitting, grouping, bullets, email/address/numbered-list regexes, cap and
alpha ratios) is the REAL reference code path.
"""
import hashlib
import sys
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
_ew = types.ModuleType("unstructured.nlp.english_words")
with open("src/main/resources/graft/english-words.txt") as _f:
    _ew.ENGLISH_WORDS = {w.strip() for w in _f if w.strip()}
sys.modules["unstructured.nlp.english_words"] = _ew
_tok = types.ModuleType("unstructured.nlp.tokenize")
_tok.sent_tokenize = lambda t: [t]
_tok.word_tokenize = lambda t: t.split()
_tok.pos_tag = lambda tokens: [(t, "VB") for t in tokens]
_tok.download_nltk_packages = lambda: None
sys.modules["unstructured.nlp.tokenize"] = _tok

from unstructured.partition.text import partition_text  # noqa: E402

BOOK = "/root/reference/example-docs/book-war-and-peace-1225p.txt"
OUT = "src/test/resources/graft/refvec/book_golden.txt"


def main():
    els = partition_text(filename=BOOK)
    with open(OUT, "w") as f:
        for e in els:
            h = hashlib.sha256(e.text.encode("utf-8")).hexdigest()[:16]
            f.write(f"{e.category}\t{h}\n")
    print(f"wrote {len(els)} element lines -> {OUT}")


if __name__ == "__main__":
    main()
