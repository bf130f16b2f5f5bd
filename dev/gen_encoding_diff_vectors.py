#!/usr/bin/env python3
"""Differential-vector generator for explicit-encoding strict decode
(dev-only, not shipped).

The engine's `Encodings.decodeTextStrict` ports the reference's
`read_txt_file` filename branch (`file_utils/encoding.py:118-133`): an
explicit encoding decodes STRICTLY through Python's text-mode machinery —
malformed bytes raise UnicodeDecodeError, the unmarked utf-16/utf-32 codecs
demand a BOM (UnicodeError). This generator executes that exact machinery
(io.TextIOWrapper, newline='' so only DECODE semantics are pinned — the
filename path's universal-newline translation is a separate, documented
asymmetry: the reference's own from_file branch performs no translation)
over a seeded adversarial byte corpus x encoding matrix and pins
(bytes_b64, encoding, text | error_kind) triples.

`EncodingDifferentialSpec` replays every vector through decodeTextStrict:
identical text on success, UnicodeDecodeError <-> CharacterCodingException,
BOM UnicodeError <-> IllegalArgumentException.
"""
import base64
import io
import json
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/refvec/encoding_diff.ndjson")

ENCODINGS = [
    "utf-8", "UTF_8", "utf-16", "utf-16-le", "utf-16-be",
    "utf-32", "utf-32-le", "utf-32-be", "iso-8859-1", "iso-8859-8",
]

random.seed(20260816)


def corpus():
    texts = [
        "", "a", "hello world", "Ünïcode — mixed",
        "מאיה and hebrew", "русский текст", "中文内容",
        "tab\tand nbsp", "emoji \U0001f980 crab",
        "line1\r\nline2\r\n", "trailing newline\n",
    ]
    cases = []
    for t in texts:
        for enc in ["utf-8", "utf-16-le", "utf-16-be", "utf-32-le",
                    "utf-32-be", "iso-8859-1", "iso-8859-8"]:
            try:
                cases.append(t.encode(enc))
            except UnicodeEncodeError:
                pass
        # BOM'd forms
        cases.append(codecs_bom("utf-16", t))
        cases.append(codecs_bom("utf-32", t))
    # adversarial: truncations, random bytes, BOM fragments
    for b in list(cases):
        if len(b) > 1:
            cases.append(b[:-1])          # odd truncation
            cases.append(b[1:])           # clipped head (breaks BOMs)
    for n in (1, 2, 3, 7, 16, 33):
        cases.append(bytes(random.randrange(256) for _ in range(n)))
    cases.append(b"\xff\xfe")             # bare LE BOM
    cases.append(b"\xfe\xff")             # bare BE BOM
    cases.append(b"\xff\xfe\x00\x00")     # bare utf-32 LE BOM
    cases.append(b"\xef\xbb\xbfhello")    # utf-8 BOM + ascii
    # de-dup preserving order
    seen, out = set(), []
    for b in cases:
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out


def codecs_bom(enc, t):
    return t.encode(enc)  # python utf-16/utf-32 encoders emit a native BOM


def decode_file_path(b, enc):
    """The reference's open(filename, encoding=enc).read(), newline
    translation disabled so only decode semantics are compared."""
    return io.TextIOWrapper(io.BytesIO(b), encoding=enc, newline="").read()


def main():
    rows = []
    for b in corpus():
        for enc in ENCODINGS:
            rec = {"bytes": base64.b64encode(b).decode("ascii"),
                   "encoding": enc}
            try:
                rec["text"] = decode_file_path(b, enc)
            except UnicodeDecodeError:
                rec["error"] = "decode"
            except UnicodeError:
                rec["error"] = "unicode"
            rows.append(rec)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=True) + "\n")
    n_err = sum(1 for r in rows if "error" in r)
    print(f"wrote {len(rows)} vectors ({n_err} error cases) to {OUT}")


if __name__ == "__main__":
    main()
