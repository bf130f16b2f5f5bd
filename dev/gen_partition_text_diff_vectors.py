#!/usr/bin/env python3
"""Differential-vector generator for WHOLE-DOCUMENT partition_text
(dev-only, not shipped).

The classifier corpus pins `element_from_text` per string and the cleaner
corpus pins each paragraph grouper in isolation; this corpus pins their
COMPOSITION — the full `partition_text(text=...)` pipeline
(`partition/text.py:40-108`): auto_paragraph_grouper line-ratio routing,
PARAGRAPH_PATTERN splitting, per-paragraph strip, the empty-bullet drop,
then element_from_text classification with ListItem bullet cleaning.

Stubs are shared with `gen_classifier_vectors.install_stubs()` — the SAME
deterministic tokenize/pos twins the Scala classifier ports, the repo
lexicon standing in for the absent english-words.txt payload, and
`languages=[""]` short-circuits the language-metadata stage
(`partition/common/lang.py:530-532`), so the pinned stream is exactly the
splitting + grouping + classification behavior.

Emits {"input": <esc>, "elements": [[category, <esc text>], ...]} rows that
`PartitionTextDifferentialSpec` replays through `TextSource.partitionText`.
"""
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_classifier_vectors as gc  # noqa: E402

gc.install_stubs()

from unstructured.partition.text import partition_text  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src/test/resources/graft/refvec/partition_text_diff.ndjson")

NARRATIVES = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "This is a test paragraph that continues here with more words.",
    "Here is a sentence. Here is another one that makes it narrative.",
    "It was the best of times, it was the worst of times indeed.",
    "The committee delayed the vote until the following morning session.",
]
TITLES = [
    "Introduction", "Results and Discussion", "A Great Day",
    "Lorem Ipsum Dolor", "Quarterly Report 2023",
]
BULLETS = ["•", "‣", "◦", "*", "·", "-", "⁃"]
LIST_BODIES = ["item one", "second entry here", "do the thing",
               "review the draft"]
NUMBERED = ["1. first point", "2. second point", "3) third point",
            "a. lettered item"]
ODDBALLS = [
    "DOE, JOHN", "ALL CAPS LINE HERE", "user@example.com",
    "1600 Pennsylvania Avenue NW, Washington DC 20500",
    "H a r p e r spaced out", "14:30:00", "x",
    "crab \U0001f980 paragraph with astral text inside it.",
    "e", "e pluribus unum", "*", "•", "- ", "7", "&", "2023",
    "Phone: (215) 867-5309", "IMPORTANT NOTICE:",
]
BROKEN = [
    "The line was interrupted\nby a formatting break but continues on.",
    "Single\nbroken\nlines\neverywhere\nacross\nthe\ntext.",
    "A bullet list:\n- alpha\n- beta\n- gamma",
    "e pluribus\ne unum lines",
]
SEPS = ["\n\n", "\n\n\n", "\n \n", "\n\t\n", "\n \n", "\n\n  ",
        "\n\x0c\n\n"]


def rand_doc(rng):
    n = rng.randint(1, 8)
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.25:
            parts.append(rng.choice(NARRATIVES))
        elif r < 0.40:
            parts.append(rng.choice(TITLES))
        elif r < 0.55:
            parts.append(rng.choice(BULLETS) + " " + rng.choice(LIST_BODIES))
        elif r < 0.65:
            parts.append(rng.choice(NUMBERED))
        elif r < 0.82:
            parts.append(rng.choice(ODDBALLS))
        else:
            parts.append(rng.choice(BROKEN))
    doc = ""
    for i, p in enumerate(parts):
        doc += p
        if i < len(parts) - 1:
            doc += rng.choice(SEPS)
    if rng.random() < 0.3:
        doc = rng.choice(["\n\n", "  ", " ", ""]) + doc
    if rng.random() < 0.3:
        doc += rng.choice(["\n", "\n\n", "   ", ""])
    return doc


def hand_docs():
    return [
        "",
        "   ",
        "\n\n\n",
        "single paragraph only, no breaks at all.",
        # newline-heavy doc: auto grouper routes by line ratio
        "line one\nline two\nline three\nline four\nline five\n",
        # empty-bullet paragraphs are dropped entirely
        "•\n\n• kept item\n\n*",
        # e-bullet quirk territory
        "e\n\ne pluribus\n\ne unum",
        # astral + wide whitespace paragraph boundaries
        "crab \U0001f980 intro\n \nsecond　part here.",
        # windows newlines arrive UNtranslated through the text= branch
        "first line\r\nsecond line\r\n\r\nnext paragraph",
    ]


def main():
    rng = random.Random(20260820)
    docs = [(d, True) for d in hand_docs()]
    docs += [(rand_doc(rng), True) for _ in range(240)]
    # paragraph_grouper=False phase: the grouper is BYPASSED entirely
    # (text.py:84-85) — single newlines become paragraph boundaries that the
    # auto route would have merged; replayed with autoGroup=false
    rng2 = random.Random(20260823)
    docs += [(rand_doc(rng2), False) for _ in range(60)]
    n = 0
    with open(OUT, "w") as fh:
        for doc, auto in docs:
            els = partition_text(
                text=doc, languages=[""],
                **({} if auto else {"paragraph_grouper": False}))
            fh.write(json.dumps({
                "input": doc,
                "auto": auto,
                "elements": [[e.category, e.text] for e in els],
            }, ensure_ascii=False) + "\n")
            n += 1
    print(f"wrote {n} vectors -> {OUT}")


if __name__ == "__main__":
    main()
