#!/usr/bin/env python3
"""Differential-vector generator for the cleaner/extractor string library
(dev-only, not shipped).

Runs the REFERENCE implementations (`cleaners/core.py`, `cleaners/extract.py`)
on a seeded adversarial corpus and pins (function, input, output) triples as
NDJSON under src/test/resources/graft/refvec/. The Scala
`CleanerDifferentialSpec` replays every case through the corresponding
`graft.functions.Cleaners`/`Extractors` column and asserts identical output.
"""
import json
import os
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
_stub("psutil")

from unstructured.cleaners import core, extract  # noqa: E402

rng = random.Random(19930215)

BULLETS = ["•", "‣", "◦", "⁃", "∙", "*", "", "·",
           "□", "■", "▪", "●", "", "-"]
LIGS = ["ﬁ", "ﬂ", "æ", "œ", "ﬀ", "ﬃ", "ﬆ", "Ꜳ"]
MOJIBAKE = ["â\x80\x99", "â\x80\x9c", "â\x80\x9d", "â\x80\x93", "â\x80\x94",
            "\x91", "\x92", "\x93", "\x94", "â\x80˜", "â€™", "â€œ", "â€"]
QUOTES = ["‘", "’", "“", "”", "'", '"', "«", "»"]
WS = [" ", "  ", "\t", "\n", "\n\n", "\xa0", "\x85", " ", " ", "　", "\r\n"]
PUNCT = [".", ",", ";", ":", "!", "?", "…", "·", "—", "-", "(", ")", "[", "]"]
WORDS = ["alpha", "Bravo", "ITEM", "naïve", "café", "日本語", "Тест", "emoji🙂x",
         "O'Neill", "x2", "3rd", "e", "and", "the"]
EMAILS = ["a.b@example.com", "UP@CASE.ORG", "weird+tag@sub.domain.io", "not-an-email@",
          "user@host"]
IPS = ["10.0.0.1", "255.255.255.255", "999.1.1.1", "fe80::1", "::1",
       "dead:beef:0:0:0:0:0:1"]
PHONES = ["215-867-5309", "(215) 867 5309", "+1 215.867.5309", "8675309", "215 8675309"]
ORDERED = ["1.1.2 heading here", "a.b other", "IV. nope", "2. two", "3.x bad",
           "1.2.3.4 deep", "10.20 double digit"]
DATES = ["Fri, 23 Dec 2022 12:08:48 -0600", "Wed, 1 Jan 2020 00:00:00 +0000 (UTC)",
         "not a date"]
IMGHTML = ['<img src="a.png"/>', '<img class="x" src="https://h/i.jpg"> and <img src=\'q.gif\'>',
           "no images here"]


def rand_string():
    r = rng.random()
    n = rng.randint(0, 14)
    parts = []
    for _ in range(n):
        b = rng.random()
        if b < 0.45:
            parts.append(rng.choice(WORDS))
        elif b < 0.55:
            parts.append(rng.choice(BULLETS))
        elif b < 0.62:
            parts.append(rng.choice(LIGS))
        elif b < 0.70:
            parts.append(rng.choice(MOJIBAKE))
        elif b < 0.76:
            parts.append(rng.choice(QUOTES))
        elif b < 0.85:
            parts.append(rng.choice(PUNCT))
        else:
            parts.append(rng.choice(EMAILS + IPS + PHONES + ORDERED))
        parts.append(rng.choice(WS) if rng.random() < 0.6 else "")
    if r < 0.08:
        return ""  # empty
    if r < 0.14:
        return rng.choice(WS) * rng.randint(1, 3)  # whitespace-only
    if r < 0.25:
        # bullet-prefixed line(s)
        lines = []
        for _ in range(rng.randint(1, 4)):
            lines.append(rng.choice(BULLETS) + rng.choice(WS) +
                         " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 6))))
        return rng.choice(["\n", "\n\n"]).join(lines)
    if r < 0.35:
        # paragraph-grouper shapes: single-\n broken paragraphs, e-bullets
        lines = []
        for _ in range(rng.randint(2, 6)):
            w = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 8)))
            if rng.random() < 0.2:
                w = "e " + w
            lines.append(w)
        return rng.choice(["\n", "\n\n", "\n\n\n"]).join(lines)
    if r < 0.42:
        return rng.choice(ORDERED)
    return "".join(parts)


CASES = []


import datetime  # noqa: E402

datetime_types = (datetime.datetime,)


def add(fn_name, fn, text, **kwargs):
    """Normalized row: kind in {s, l, null, error}; out is always array<string>
    (nullable entries) so one Spark schema reads every function's vectors."""
    try:
        out = fn(text, **kwargs)
    except Exception as e:  # pin raising inputs as error sentinels (skipped in spec)
        CASES.append({"fn": fn_name, "input": text, "kind": "error",
                      "out": [type(e).__name__]})
        return
    if out is None:
        CASES.append({"fn": fn_name, "input": text, "kind": "null", "out": []})
    elif isinstance(out, (tuple, list)):
        CASES.append({"fn": fn_name, "input": text, "kind": "l",
                      "out": [None if v is None else str(v) for v in out]})
    elif isinstance(out, datetime_types):
        CASES.append({"fn": fn_name, "input": text, "kind": "s",
                      "out": [out.isoformat()]})
    else:
        CASES.append({"fn": fn_name, "input": text, "kind": "s", "out": [out]})

SIMPLE = [
    ("clean_extra_whitespace", core.clean_extra_whitespace),
    ("clean_bullets", core.clean_bullets),
    ("clean_ordered_bullets", core.clean_ordered_bullets),
    ("clean_ligatures", core.clean_ligatures),
    ("clean_dashes", core.clean_dashes),
    ("clean_trailing_punctuation", core.clean_trailing_punctuation),
    ("clean_non_ascii_chars", core.clean_non_ascii_chars),
    ("replace_unicode_quotes", core.replace_unicode_quotes),
    ("remove_punctuation", core.remove_punctuation),
    ("group_broken_paragraphs", core.group_broken_paragraphs),
    ("new_line_grouper", core.new_line_grouper),
    ("blank_line_grouper", core.blank_line_grouper),
    ("auto_paragraph_grouper", core.auto_paragraph_grouper),
    ("group_bullet_paragraph", core.group_bullet_paragraph),
    ("extract_email_address", extract.extract_email_address),
    ("extract_ip_address", extract.extract_ip_address),
    ("extract_ip_address_name", extract.extract_ip_address_name),
    ("extract_us_phone_number", extract.extract_us_phone_number),
    ("extract_mapi_id", extract.extract_mapi_id),
    ("extract_ordered_bullets", extract.extract_ordered_bullets),
    ("extract_image_urls_from_html", extract.extract_image_urls_from_html),
]


def main():
    inputs = [rand_string() for _ in range(300)]
    inputs += EMAILS + IPS + PHONES + ORDERED + DATES + IMGHTML
    inputs += ["• bullet", "1.1 first", "\x95weird bullet", "ITEM 2.A PART",
               "fiﬁfl ﬂuid ǽsop", "â€™smart-ishâ€\x9d", "Tel: 215-867-5309 x2",
               "e e e", "A\nB\nC", "A\n\nB\n\nC", "A\nB\n\nC\nD"]
    for fn_name, fn in SIMPLE:
        for t in inputs:
            add(fn_name, fn, t)
    # kwargs-bearing functions on a subset
    sub = inputs[::4]
    for t in sub:
        add("clean_all", core.clean, t, extra_whitespace=True, dashes=True,
            bullets=True, trailing_punctuation=True, lowercase=True)
        add("clean_prefix_summary", core.clean_prefix, t, pattern="SUMMARY:",
            ignore_case=True, strip=True)
        add("clean_postfix_end", core.clean_postfix, t, pattern="(END|STOP)",
            ignore_case=False, strip=True)
        add("extract_text_before_phone", extract.extract_text_before, t,
            pattern="215", index=0, strip=True)
        add("extract_text_after_bullet", extract.extract_text_after, t,
            pattern="a", index=0, strip=True)
    for t in DATES:
        add("extract_datetimetz", extract.extract_datetimetz, t)
    # quoted-printable / mojibake decoders and the index-run whitespace collapse
    qp_inputs = ["hello=21", "caf=C3=A9 time", "a =3D b", "plain text", "100=25 sure",
                 "bad =ZZ escape", "=C2=A0nbsp lead", "multi=0Aline",
                 # binascii.a2b_qp edge semantics (r17): '==' consumes both
                 # and emits one '=', trailing '=' drops, invalid escapes emit
                 # '=' and re-examine, '=\r' swallows through the next LF,
                 # lowercase hex decodes, non-ASCII literals re-encode in the
                 # target charset first, strict final decode can raise
                 "==41AB", "=", "x=", "=A", "= A", "=3", "a=\rjunk\nb",
                 "a=\r\nb", "soft=\nbreak", "=e2=80=99low", "\u00e9=C3=A9",
                 "\U0001f980=21", "=FF bad utf8", "==", "===41"]
    for t in qp_inputs:
        add("replace_mime_encodings_utf8", core.replace_mime_encodings, t)
    for t in qp_inputs:
        add("replace_mime_encodings_latin1", core.replace_mime_encodings, t,
            encoding="latin-1")
    heb = ["=EE=E0=E9=E4 shalom", "\u05e9=E9", "plain", "=", "==E0"]
    for t in heb:
        add("replace_mime_encodings_iso8859_8", core.replace_mime_encodings, t,
            encoding="iso-8859-8")
    moji = ["caf\xc3\xa9", "na\xc3\xafve", "plain", "\xe2\x80\x99quoted\xe2\x80\x99",
            # ord(c) > 255 raises ValueError; invalid utf-8 bytes raise
            # UnicodeDecodeError; both must be errors, not silent garbage
            "\u0100high", "\U0001f980astral", "bad\xff utf8", "\xc3"]
    for t in moji:
        add("bytes_string_to_string_utf8", core.bytes_string_to_string, t)
    for t in moji:
        add("bytes_string_to_string_latin1", core.bytes_string_to_string, t,
            encoding="latin-1")
    for t in inputs[::8]:
        cleaned, moved = core.clean_extra_whitespace_with_index_run(t)
        CASES.append({"fn": "ws_index_run", "input": t, "kind": "l",
                      "out": [cleaned] + [str(int(v)) for v in moved]})

    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/cleaner_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in CASES:
            f.write(json.dumps(c, ensure_ascii=False) + "\n")
    print("wrote", len(CASES), "cases")


if __name__ == "__main__":
    main()
