#!/usr/bin/env python3
"""Independent BPE oracle for q_chunk_tokens_bpe: re-implements the published
BPE spec (cl100k-style split regex + greedy lowest-rank merges) in Python over
the COMMITTED merge table and prints the expected (chunk_seq, n_tokens, text)
VALUES rows for the oracle SQL in PipelineQueries.scala. Run after any
regeneration of bpe-merges.txt to confirm (or refresh) the pinned constants.

Chunk boundaries mirror the reference's token-mode fold with max_tokens=24
over the three canonical elements: elements combine while the joined text
(separator "\n\n") measures within budget; an oversized element word-walks
greedily to the rightmost space that still fits.
"""
import re

MERGES = "src/main/resources/graft/bpe-merges.txt"
MAX_TOKENS = 24

ELEMENTS = [
    "Well, Prince, so Genoa and Lucca are now just family estates.",
    "It was in July, 1805, and the speaker was the well-known Anna Pavlovna.",
    "Heavens! what a virulent attack! replied the prince, not in the "
    "least disconcerted by this reception.",
]

# IDENTICAL to operators/TokenCounter.scala SplitRe and dev/gen_bpe_vocab.py
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
    return chr(0x100 + b)


RANKS = {}
for i, line in enumerate(open(MERGES, encoding="utf-8")):
    parts = line.rstrip("\n").split(" ", 1)
    if len(parts) == 2:
        RANKS[(parts[0], parts[1])] = i


def encode_piece(piece: str):
    syms = [byte_char(b) for b in piece.encode("utf-8")]
    while len(syms) > 1:
        best, best_i = None, -1
        for i in range(len(syms) - 1):
            r = RANKS.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best_i < 0:
            return syms
        syms = syms[:best_i] + [syms[best_i] + syms[best_i + 1]] + syms[best_i + 2:]
    return syms


def count_tokens(text: str) -> int:
    return sum(len(encode_piece(p)) for p in SPLIT.findall(text) if p)


def split_oversized(text: str):
    """Rightmost-space split keeping the fragment within MAX_TOKENS."""
    frags = []
    while text:
        if count_tokens(text) <= MAX_TOKENS:
            frags.append(text)
            break
        cut = len(text)
        while True:
            sp = text.rfind(" ", 0, cut)
            if sp <= 0:
                break  # no fitting space: hard cut would apply (not hit here)
            if count_tokens(text[:sp]) <= MAX_TOKENS:
                cut = sp
                break
            cut = sp
        frags.append(text[:cut])
        text = text[cut + 1:]
    return frags


def main():
    chunks = []
    acc = ""
    for el in ELEMENTS:
        joined = el if not acc else acc + "\n\n" + el
        if count_tokens(joined) <= MAX_TOKENS:
            acc = joined
        else:
            if acc:
                chunks.append(acc)
            if count_tokens(el) <= MAX_TOKENS:
                acc = el
            else:
                frags = split_oversized(el)
                chunks.extend(frags[:-1])
                acc = frags[-1]
    if acc:
        chunks.append(acc)
    for i, c in enumerate(chunks):
        print(f"  ({i}, {count_tokens(c)}, '{c}'),")


if __name__ == "__main__":
    main()
