#!/usr/bin/env python3
"""Differential-vector generator for calculate_edit_distance/calculate_accuracy
(dev-only, not shipped).

Executes the REFERENCE pipeline (`metrics/text_extraction.py:69-130`:
prepare_str whitespace collapse -> standardize_quotes translate -> weighted
Levenshtein -> division-safe bounded score) over a seeded adversarial corpus
and pins (output, source, weights, standardize_whitespaces, distance, score)
vectors. `EditDistanceDifferentialSpec` replays each through
`graft.operators.TextExtractionMetrics` and asserts identical results.

The one non-reference piece: rapidfuzz (the C Levenshtein kernel) is not
installed in this container, so `rapidfuzz.distance.Levenshtein` is
monkeypatched with a clean-room pure-Python weighted DP implementing its
documented cost model (weights = (insertion, deletion, substitution), distance
= min-cost edit of s1 INTO s2, computed over CODE POINTS — Python strings are
code-point sequences natively). Everything around the kernel — prepare_str,
standardize_quotes (incl. the astral U+1F676..78 quote ornaments),
`len(source)` bounding, the score formula — is the reference's own code.

The corpus deliberately stresses the places a JVM port can silently diverge:
astral code points (UTF-16 surrogate pairs make String.length() != code-point
count), Python str.split() whitespace (\\x1c-\\x1f, NBSP, U+2028... — wider
than Java regex \\s), and the quote-translation table.
"""
import json
import os
import random
import sys
import types

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/refvec/editdist_diff.ndjson")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _Lev:
    """Clean-room weighted Levenshtein over code points (rapidfuzz's documented
    semantics: weights=(insertion, deletion, substitution); transform s1 into
    s2; inserting a char of s2 costs ins, deleting a char of s1 costs del)."""

    @staticmethod
    def distance(s1, s2, weights=(1, 1, 1)):
        ins, dele, sub = weights
        a, b = list(s1), list(s2)
        n, m = len(a), len(b)
        if n == 0:
            return ins * m
        if m == 0:
            return dele * n
        prev = [ins * j for j in range(m + 1)]
        for i in range(1, n + 1):
            cur = [dele * i] + [0] * m
            ca = a[i - 1]
            for j in range(1, m + 1):
                cur[j] = min(prev[j - 1] + (0 if ca == b[j - 1] else sub),
                             prev[j] + dele,
                             cur[j - 1] + ins)
            prev = cur
        return prev[m]


_stub("emoji", is_emoji=lambda c: False)
_stub("psutil")
_stub("rapidfuzz")
_stub("rapidfuzz.distance", Levenshtein=_Lev)

from unstructured.metrics.text_extraction import (  # noqa: E402
    calculate_accuracy,
    calculate_edit_distance,
    prepare_str,
    standardize_quotes,
)

random.seed(20260817)

# Python str.split() whitespace, wider than Java regex \s — the JVM port must
# match this exact set.
PY_WS = ("\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0 "
         + "".join(chr(c) for c in range(0x2000, 0x200B))
         + "    　")

QUOTES = "\"“”„«»\U0001f676\U0001f677\U0001f678" \
         "⠦〝＂'‘’‚‹❛「﹁＇"
ASTRAL = "\U0001f980\U0001f600\U0001d11e\U00020000\U0001f676"
BASE = ("the quick brown fox", "hello, world", "a", "", "  ", "päper—draft",
        "中文 内容 行", "משפט בעברית", "x" * 40)


def rand_text(rng, n):
    pools = [
        "abcdefghij ",
        "abc" + PY_WS,
        "ab" + QUOTES,
        "a " + ASTRAL,
        "".join(chr(rng.randrange(0x20, 0x3000)) for _ in range(8)) + "  ",
    ]
    pool = rng.choice(pools)
    return "".join(rng.choice(pool) for _ in range(n))


def mutate(rng, s):
    """Produce an 'output' plausibly OCR-corrupted from 'source'."""
    chars = list(s)
    for _ in range(rng.randrange(0, 4)):
        if not chars:
            break
        op = rng.randrange(3)
        i = rng.randrange(len(chars))
        if op == 0:
            chars[i] = rng.choice("§?~“\U0001f980 ")
        elif op == 1:
            del chars[i]
        else:
            chars.insert(i, rng.choice(" \xa0　e\U0001f600"))
    return "".join(chars)


def cases():
    rng = random.Random(7)
    out = []
    # hand-picked edges: astral length accounting, whitespace sets, quotes,
    # empty/None sides, output==source after standardization
    hand = [
        ("", ""), (None, ""), ("", None), (None, None),
        ("\U0001f980", ""), ("", "\U0001f980"),
        ("\U0001f980\U0001f980", "\U0001f980"),
        ("a\U0001d11eb", "ab"),
        ("\U0001f676quoted\U0001f677", '"quoted"'),
        ("“hello”", '"hello"'),
        ("a\x1cb\x1dc", "a b c"),
        ("a\xa0\xa0b", "a b"),
        ("a b c", "a\nb c"),
        ("　lead and trail　", "lead and trail"),
        ("tab\tsep", "tab sep"),
        ("\x1f\x1e\x1d", ""),
        ("e e e", "eee"),
        ("long " * 30, "long " * 29 + "wrong"),
        ("\U0001f600 emoji mid \U0001f600", "emoji mid"),
        ("«»angle❝❞", '""angle""'),
    ]
    for o, s in hand:
        out.append((o, s, (2, 1, 1), True))
        out.append((o, s, (1, 1, 1), True))
        if o is not None and s is not None:
            out.append((o, s, (2, 1, 1), False))
    for b in BASE:
        for other in BASE:
            out.append((b, other, (2, 1, 1), True))
    rng2 = random.Random(11)
    for _ in range(400):
        s = rand_text(rng2, rng2.randrange(0, 30))
        o = mutate(rng2, s) if rng2.random() < 0.7 else rand_text(
            rng2, rng2.randrange(0, 30))
        w = rng2.choice([(2, 1, 1), (1, 1, 1), (3, 2, 5), (1, 4, 2)])
        out.append((o, s, w, rng2.random() < 0.8))
    return out


def esc(s):
    """One \\uXXXX escape per UTF-16 code unit (the TestEscapes convention:
    astral chars travel as surrogate pairs), or JSON null for None."""
    if s is None:
        return "null"
    units = s.encode("utf-16-be")
    return '"' + "".join("\\u%04x" % int.from_bytes(units[i:i + 2], "big")
                         for i in range(0, len(units), 2)) + '"'


def main():
    n = 0
    with open(OUT, "w") as fh:
        for o, s, w, std in cases():
            dist = calculate_edit_distance(
                o, s, weights=w, return_as="distance",
                standardize_whitespaces=std)
            score = calculate_edit_distance(
                o, s, weights=w, return_as="score",
                standardize_whitespaces=std)
            fields = [
                '"output": ' + esc(o),
                '"source": ' + esc(s),
                '"weights": %s' % json.dumps(list(w)),
                '"std_ws": %s' % json.dumps(std),
                '"prep_out": ' + esc(standardize_quotes(prepare_str(o, std))),
                '"prep_src": ' + esc(standardize_quotes(prepare_str(s, std))),
                '"distance": %s' % repr(float(dist)),
                '"score": %s' % repr(float(score)),
            ]
            # calculate_accuracy is the score form with its own default; pin it
            # through the reference wrapper on the default-weight rows
            if w == (2, 1, 1):
                fields.append('"accuracy": %s'
                              % repr(float(calculate_accuracy(o, s, weights=w))))
            fh.write("{" + ", ".join(fields) + "}\n")
            n += 1
    print(f"wrote {n} vectors -> {OUT}")


if __name__ == "__main__":
    main()
