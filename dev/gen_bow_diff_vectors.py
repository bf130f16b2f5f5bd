#!/usr/bin/env python3
"""Differential-vector generator for the bag_of_words tokenizer (dev-only).

Runs the REFERENCE `metrics/text_extraction.py:bag_of_words` over a seeded
adversarial corpus (bullets, spaced-out single-char runs, apostrophe/hyphen
in-word punctuation, unicode words, sentence punctuation) and pins
(input, {word: count}) pairs as NDJSON under src/test/resources/graft/refvec/.
The Scala `BagOfWordsDifferentialSpec` replays every case through
`graft.functions.expr.BagOfWordsTokens` + a count fold and asserts identical
bags.
"""
import json
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
# rapidfuzz is only used by the edit-distance metrics in the same module;
# bag_of_words never touches it
_stub("rapidfuzz")
_stub("rapidfuzz.distance", Levenshtein=None)
_stub("psutil")

from unstructured.metrics.text_extraction import bag_of_words  # noqa: E402

rng = random.Random(20260815)

BULLETS = ["•", "‣", "◦", "∙", "*", "·", "-", ""]
WORDS = ["alpha", "Bravo", "ITEM", "naïve", "café", "O'Neill", "x2", "3rd",
         "well-known", "don't", "it's", "--", "''", "a", "e", "I", "7", "&",
         "日本語", "Тест", "end."]
PUNCT = [".", ",", ";", ":", "!", "?", "…", "(", ")", "[", "]", '"', "'"]
SPACED = ["s p a c e d", "a b", "x", "1 2 3", "q r s t", "m-n", "a' b'"]


def rand_text():
    kind = rng.random()
    if kind < 0.06:
        return ""
    parts = []
    for _ in range(rng.randint(1, 14)):
        r = rng.random()
        if r < 0.5:
            w = rng.choice(WORDS)
            if rng.random() < 0.3:
                w += rng.choice(PUNCT)
            parts.append(w)
        elif r < 0.65:
            parts.append(rng.choice(SPACED))
        elif r < 0.75:
            parts.append(rng.choice(BULLETS) + " " + rng.choice(WORDS))
        elif r < 0.85:
            parts.append(rng.choice(PUNCT))
        else:
            parts.append(rng.choice(WORDS).upper())
    sep = rng.choice([" ", "  ", " \t ", "\n"])
    return sep.join(parts)


# Phase-2 pools (appended r17): the places a UTF-16 port silently diverges —
# astral words (surrogate pairs make Java String.length() 2 for a 1-code-point
# word, flipping the single-char-run logic), Python str.split() whitespace
# wider than Java regex \\s, and isalnum() edge chars (Nl/No: Java
# isLetterOrDigit drops them).
ASTRAL_WORDS = ["\U0001f980", "\U0001f980\U0001f980", "a\U0001f980b",
                "\U0001d54f", "\U0001d7d8", "\U0001f600", "\U00020000",
                "\U0001f600\U0001f680", "crab\U0001f980", "\U00010100"]
ALNUM_EDGE = ["\u00b2", "\u00bd", "\u2162", "\u3007", "\u02b0", "\u2460",
              "\u00a9", "_", "\u5341"]
WIDE_WS = ["\u00a0", "\u2009", "\u3000", "\x1c", "\x85", "\u2028", "\u205f"]


def rand_text2(rng2):
    parts = []
    for _ in range(rng2.randint(1, 10)):
        r = rng2.random()
        if r < 0.35:
            parts.append(rng2.choice(ASTRAL_WORDS))
        elif r < 0.55:
            parts.append(rng2.choice(ALNUM_EDGE))
        elif r < 0.75:
            parts.append(rng2.choice(WORDS))
        elif r < 0.85:
            parts.append(rng2.choice(SPACED))
        else:
            parts.append(rng2.choice(BULLETS) + " " + rng2.choice(ASTRAL_WORDS))
    sep = rng2.choice([" ", rng2.choice(WIDE_WS),
                       rng2.choice(WIDE_WS) + rng2.choice(WIDE_WS)])
    return sep.join(parts)


def main():
    out = "src/test/resources/graft/refvec/bow_diff.ndjson"
    n = 0
    with open(out, "w") as f:
        # retry until EXACTLY 500 vectors: the spec hard-asserts the corpus
        # size, so a skipped out-of-contract case must be replaced, not lost
        while n < 500:
            text = rand_text()
            try:
                bow = bag_of_words(text)
            except Exception:
                continue  # out of contract; draw another case
            f.write(json.dumps({"input": text, "bow": bow}, ensure_ascii=False) + "\n")
            n += 1
        # phase 2: 150 astral / wide-whitespace / isalnum-edge vectors (the
        # first 500 stay byte-identical — rng untouched)
        rng2 = random.Random(20260817)
        while n < 650:
            text = rand_text2(rng2)
            try:
                bow = bag_of_words(text)
            except Exception:
                continue
            f.write(json.dumps({"input": text, "bow": bow}, ensure_ascii=False) + "\n")
            n += 1
    print(f"{n} vectors -> {out}")


if __name__ == "__main__":
    main()
