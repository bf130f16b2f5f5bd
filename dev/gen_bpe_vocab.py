#!/usr/bin/env python3
"""Derive a byte-level BPE merge table from the reference's public-domain corpus.

The reference counts tokens with tiktoken (`chunking/base.py:54-78`), whose
vocabularies are model downloads unavailable offline. This trains a standard
byte-pair-encoding merge list — the same algorithm family — on the reference's
own public-domain example docs (War and Peace + the English .txt/.html docs),
so token-mode chunking can run against a REAL merge-rule tokenizer offline.
Counts differ from any OpenAI vocabulary (documented seam); the merge table
itself is deterministic: fixed sources, fixed pre-tokenizer, fixed merge count,
lexicographic tie-break.

Pre-tokenizer: the cl100k-style split pattern (public, from the tiktoken
repository, MIT license), simplified to the pieces Java regex shares with
Python's `regex` module.

Output: src/main/resources/graft/bpe-merges.txt — one merge per line,
"left right" with bytes 0x00-0xFF mapped to U+0100+b for the printable-file
encoding (the GPT-2 byte-to-unicode trick, also public).
"""
import collections
import html
import re

SOURCES = [
    "/root/reference/example-docs/book-war-and-peace-1225p.txt",
    "/root/reference/example-docs/fake-text.txt",
    "/root/reference/example-docs/norwich-city.txt",
    "/root/reference/example-docs/example-10k-1p.html",
]

OUT = "src/main/resources/graft/bpe-merges.txt"
N_MERGES = 4000

# the published cl100k whitespace clause \s+(?!\S) verbatim; letter/number
# classes stay on the \w family (Python re lacks \p{L}) — kept IDENTICAL to
# the Java runtime pattern in operators/TokenCounter.scala
SPLIT = re.compile(
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
    r"|[^\r\n\w\d]?[^\W\d_]+"
    r"|\d{1,3}"
    r"| ?[^\s\w\d]+[\r\n]*"
    r"|\s*[\r\n]+"
    r"|\s+(?!\S)"
    r"|\s+",
)


def byte_char(b: int) -> str:
    """Printable stand-in for byte b (stable, collision-free)."""
    return chr(0x100 + b)


def main():
    piece_counts = collections.Counter()
    for p in SOURCES:
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        if p.endswith(".html"):
            text = html.unescape(re.sub(r"<[^>]+>", " ", text))
        for piece in SPLIT.findall(text):
            if piece:
                piece_counts[piece] += 1

    # word -> tuple of byte symbols
    words = {
        tuple(byte_char(b) for b in piece.encode("utf-8")): c
        for piece, c in piece_counts.items()
    }

    merges = []
    for _ in range(N_MERGES):
        pairs = collections.Counter()
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # deterministic: highest count, then lexicographically smallest pair
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_words = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words

    with open(OUT, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"{len(merges)} merges -> {OUT}")


if __name__ == "__main__":
    main()
