#!/usr/bin/env python3
"""Cross-language differential vectors for the BPE pre-tokenizer split.

Segments a set of adversarial inputs (NFD combining marks, ZWJ emoji
sequences, mixed scripts, digit runs, contraction forms, whitespace runs)
with the PYTHON pattern the merge-table generator uses, and emits them as a
tab-separated vector file the Scala spec replays against the Java pattern —
proving the two engines segment identically (the premise the committed merge
table and the independent Python oracle rest on).

Output: src/test/resources/graft/bpe-split-vectors.txt — per line:
  <input>TAB<piece1> SOH <piece2>... — fields uXXXX-escaped (no raw control chars).
  tabs/newlines inside fields never occur.
"""
import re

SPLIT = re.compile(
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
    r"|[^\r\n\w\d]?[^\W\d_]+"
    r"|\d{1,3}"
    r"| ?[^\s\w\d]+[\r\n]*"
    r"|\s*[\r\n]+"
    r"|\s+(?!\S)"
    r"|\s+",
)

INPUTS = [
    "hello world",
    "café au lait",              # NFD combining acute
    "café au lait",               # NFC precomposed
    "áb̂c̃",           # marks after every letter
    "é̂̃clair",        # stacked marks
    "zero‌width‍join",       # ZWNJ / ZWJ between words
    "́leading mark",              # mark with no base
    "don't can't we've I'm you'll he'd",
    "1234567 12 1,234.56",
    "  leading spaces",
    "trailing spaces   ",
    "inner   runs    here",
    "tabs\tand\nnewlines\r\nmixed",
    "under_score snake_case_name",
    "MixedCASE Worte und Wörter",
    "中文分词 test",   # CJK + latin
    "a-b a--b a---b",
    "!!!??? ... (parens) [brackets]",
    "x́ + ŷ = z̃",     # math with marked vars
    "emoji \U0001f600‍\U0001f680 seq",
]


def esc(s: str) -> str:
    out = []
    for c in s:
        o = ord(c)
        if 0x20 <= o < 0x7F and c != "\\":
            out.append(c)
        elif o > 0xFFFF:  # astral: emit the UTF-16 surrogate pair Java sees
            v = o - 0x10000
            out.append(f"\\u{0xD800 + (v >> 10):04x}\\u{0xDC00 + (v & 0x3FF):04x}")
        else:
            out.append(f"\\u{o:04x}")
    return "".join(out)


def main():
    out_path = "src/test/resources/graft/bpe-split-vectors.txt"
    with open(out_path, "w", encoding="ascii") as f:
        for text in INPUTS:
            pieces = [p for p in SPLIT.findall(text) if p]
            f.write(esc(text) + "\t" + "\x01".join(esc(p) for p in pieces) + "\n")
    print(f"{len(INPUTS)} vectors -> {out_path}")


if __name__ == "__main__":
    main()
