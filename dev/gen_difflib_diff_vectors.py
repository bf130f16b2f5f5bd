#!/usr/bin/env python3
"""Differential-vector generator for the difflib kernel under the table
metrics (dev-only, not shipped).

`metrics/table/table_eval.py:76` scores cell-level extraction with
`difflib.SequenceMatcher(None, a, b).ratio()` and
`metrics/table/table_alignment.py:47,113` aligns tables/cells with
`difflib.get_close_matches(word, candidates, n=1, cutoff)` followed by
`candidates.index(match)`. Both are STDLIB — this generator executes the
real reference kernel (no substitutions at all) over a seeded adversarial
corpus and pins:

  {"kind":"ratio", "a":…, "b":…, "ratio":…}
  {"kind":"closest", "word":…, "cands":[…], "cutoff":…, "index":…}

The corpus stresses the divergence traps of a JVM port: code points vs
UTF-16 units (two different astral chars share a high surrogate —
unit-level matching would half-match them), the autojunk popularity rule
(fires only at len(b) >= 200, thresholds counted in code points), and
get_close_matches tie-breaks (heapq.nlargest compares the CANDIDATE string
on ratio ties — the larger string wins, then .index takes its first
occurrence).

`DifflibDifferentialSpec` replays each through
`graft.operators.TableEval.{sequenceRatio, closestIndex}`.
"""
import difflib
import random

OUT = ("src/test/resources/graft/refvec/difflib_diff.ndjson")

ASTRAL = ["\U0001f980", "\U0001f600", "\U0001f601", "\U0001d11e",
          "\U00020000", "\U0001f676"]
HIGH_BMP = ["", "�", "ﬁ", "あ"]
POOLS = [
    "abcdefg ",
    "abc" + "".join(ASTRAL),
    "aab bcc " + "".join(HIGH_BMP),
    "r1c 2x 　",
]


def esc(s):
    units = s.encode("utf-16-be")
    return '"' + "".join("\\u%04x" % int.from_bytes(units[i:i + 2], "big")
                         for i in range(0, len(units), 2)) + '"'


def rand_text(rng, n, pool=None):
    p = pool or rng.choice(POOLS)
    return "".join(rng.choice(p) for _ in range(n))


def mutate(rng, s):
    chars = list(s)
    for _ in range(rng.randrange(0, 3)):
        if not chars:
            break
        i = rng.randrange(len(chars))
        op = rng.randrange(3)
        if op == 0:
            chars[i] = rng.choice("xyz" + "".join(ASTRAL))
        elif op == 1:
            del chars[i]
        else:
            chars.insert(i, rng.choice("qw \U0001f980"))
    return "".join(chars)


def ratio_cases():
    rng = random.Random(20260818)
    hand = [
        ("", ""), ("", "a"), ("abc", "abc"),
        ("\U0001f600", "\U0001f601"),          # shared high surrogate, ratio 0
        ("\U0001f980ab", "ab\U0001f980"),
        ("a\U0001d11eb", "ab"),
        ("r1c1 r1c2", "r1c1 r1c2"),
        # autojunk: b >= 200 code points, ' ' popular (>1%) -> junked in b2j
        ("the cat sat " * 20, ("the cat sat " * 17) + "x" * 14),
        # autojunk boundary: exactly 199 vs 200 code points of b
        ("ab" * 60, "ab" * 100 + "cd" * 0),
        ("ab" * 60, "ab" * 99 + "a"),
        # astral-heavy long b: autojunk length must count CODE POINTS
        ("\U0001f980" * 120, "\U0001f980" * 150 + "x" * 30),
    ]
    out = list(hand)
    for _ in range(220):
        pool = rng.choice(POOLS) if rng.random() < 0.5 else None
        a = rand_text(rng, rng.randrange(0, 40), pool)
        b = mutate(rng, a) if rng.random() < 0.6 else rand_text(
            rng, rng.randrange(0, 40), pool)
        out.append((a, b))
    for _ in range(30):  # long, popularity-rule territory
        a = rand_text(rng, rng.randrange(150, 320), "ab cde")
        b = mutate(rng, a)
        out.append((a, b))
    return out


def closest_cases():
    rng = random.Random(20260819)
    out = []
    # hand ties: equal-ratio different strings -> nlargest picks the LARGER
    out.append(("ab", ["ax", "ay", "az"], 0.3))
    out.append(("ab", ["az", "ay", "ax"], 0.3))
    out.append(("ab", ["ax", "ax", "ay"], 0.3))   # dup winner -> first index
    out.append(("\U0001f600x", ["\U0001f601x", "x"], 0.1))
    out.append(("word", [], 0.6))
    out.append(("word", ["unrelated", "strings"], 0.9))
    for _ in range(120):
        word = rand_text(rng, rng.randrange(1, 20))
        cands = [mutate(rng, word) if rng.random() < 0.7
                 else rand_text(rng, rng.randrange(0, 20))
                 for _ in range(rng.randrange(1, 8))]
        cutoff = rng.choice([0.1, 0.4, 0.6, 0.8])
        out.append((word, cands, cutoff))
    return out


def main():
    n = 0
    with open(OUT, "w") as fh:
        for a, b in ratio_cases():
            r = difflib.SequenceMatcher(None, a, b).ratio()
            fh.write('{"kind": "ratio", "a": %s, "b": %s, "ratio": %r}\n'
                     % (esc(a), esc(b), r))
            n += 1
        for word, cands, cutoff in closest_cases():
            m = difflib.get_close_matches(word, cands, n=1, cutoff=cutoff)
            idx = cands.index(m[0]) if m else -1
            fh.write('{"kind": "closest", "word": %s, "cands": [%s], '
                     '"cutoff": %r, "index": %d}\n'
                     % (esc(word), ", ".join(esc(c) for c in cands),
                        cutoff, idx))
            n += 1
    print(f"wrote {n} vectors -> {OUT}")


if __name__ == "__main__":
    main()
