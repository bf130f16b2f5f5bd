#!/usr/bin/env python3
"""Differential vectors for RFC-822 email header parsing (dev-only).

Runs the REFERENCE `partition_email` (`partition/email.py`) over seeded tricky
headers — quoted display names containing commas, RFC-2047 encoded words (B and
Q, utf-8/latin-1), folded headers, multiple recipients, odd Message-IDs, date
variants — and pins the header-derived metadata (sent_from/sent_to/cc/bcc/
subject/message_id/last_modified). Bodies are bullet lines so classification
never reaches the stubbed tokenizer; only header fields are pinned (they never
touch the model seam). `EmailHeaderDifferentialSpec` replays each through the
engine's email parser.
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
_stub("iso639", Lang=object)


class _DF:
    seed = 0


_lde = types.ModuleType("langdetect.lang_detect_exception")


class LangDetectException(Exception):
    pass


_lde.LangDetectException = LangDetectException
_stub("langdetect", DetectorFactory=_DF, detect_langs=lambda t: [],
      lang_detect_exception=_lde)
sys.modules["langdetect.lang_detect_exception"] = _lde
_ew = types.ModuleType("unstructured.nlp.english_words")
_ew.ENGLISH_WORDS = set()
sys.modules["unstructured.nlp.english_words"] = _ew
# tokenize is permissive (headers never consult it; body classification is
# NOT pinned by these vectors)
_tok = types.ModuleType("unstructured.nlp.tokenize")
_tok.pos_tag = lambda t: []
_tok.sent_tokenize = lambda t: [t]
_tok.word_tokenize = lambda t: t.split()
sys.modules["unstructured.nlp.tokenize"] = _tok


class _PE(Exception):
    pass


def _lx(*a, **k):
    raise RuntimeError("lxml called")


_etree = types.ModuleType("lxml.etree")
_etree.ParserError = _PE
_etree.tostring = _lx
_etree.fromstring = _lx


class _ElementBase(object):
    def __init__(self, *a, **k):
        pass


_etree.ElementBase = _ElementBase


class _Element:
    pass


_etree._Element = _Element


class _HTMLParser:
    def __init__(self, *a, **k):
        pass

    def set_element_class_lookup(self, *a, **k):
        pass


_etree.HTMLParser = _HTMLParser


class _EDCL:
    def __init__(self, *a, **k):
        pass


_etree.ElementDefaultClassLookup = _EDCL


class _ENCL:
    def __init__(self, *a, **k):
        self._ns = {}

    def get_namespace(self, ns):
        return self._ns.setdefault(ns, {})


_etree.ElementNamespaceClassLookup = _ENCL
sys.modules["lxml"] = types.ModuleType("lxml")
sys.modules["lxml.etree"] = _etree
_stub("lxml.html", fragment_fromstring=_lx, HtmlElement=object,
      document_fromstring=_lx)
_stub("bs4", BeautifulSoup=object, Tag=object)

import io  # noqa: E402

from unstructured.partition.email import partition_email  # noqa: E402

rng = random.Random(430201)

NAMES = ['Plain Name', '"Fabian, Test"', '"O\'Neill, Kate"', 'Jürgen Müller',
         '"Quote \\" Inside"', 'Café Owner', '']
DOMAINS = ["example.com", "sub.domain.io", "x.de", "mail.co.jp"]
SUBJECTS = ["Plain subject", "Café meeting notes", "RE: [urgent] q4 – plan",
            "A very long subject line that definitely wraps around the typical"
            " seventy-eight character folding limit of RFC 5322 headers easily",
            "日本語の件名", ""]
DATES = ["Fri, 23 Dec 2022 12:08:48 -0600", "Wed, 1 Jan 2020 00:00:00 +0000",
         "Tue, 05 Mar 2024 23:59:59 +0930", "23 Dec 2022 12:08:48 -0600"]


def encode_word(s, scheme):
    import base64
    import quopri
    if scheme == "B":
        return "=?utf-8?B?" + base64.b64encode(s.encode()).decode() + "?="
    # single-line encoded word: quopri's soft line breaks would produce an
    # invalid unfolded continuation line in the header block
    body = quopri.encodestring(s.encode(), header=True).decode().replace("=\n", "")
    return "=?utf-8?Q?" + body + "?="


def rand_addr():
    name = rng.choice(NAMES)
    local = rng.choice(["user", "a.b", "weird+tag", "x_y"]) + str(rng.randint(0, 99))
    email = f"{local}@{rng.choice(DOMAINS)}"
    r = rng.random()
    if not name or r < 0.25:
        return email
    if r < 0.5 and not name.startswith('"'):
        return f"{encode_word(name, rng.choice('BQ'))} <{email}>"
    return f"{name} <{email}>"


def rand_subject():
    s = rng.choice(SUBJECTS)
    if s and rng.random() < 0.4:
        return encode_word(s, rng.choice("BQ"))
    return s


def build_eml(case):
    h = []
    frm = rand_addr()
    tos = [rand_addr() for _ in range(rng.randint(1, 3))]
    ccs = [rand_addr() for _ in range(rng.randint(0, 2))]
    bccs = [rand_addr() for _ in range(rng.randint(0, 1))]
    subj = rand_subject()
    date = rng.choice(DATES)
    mid = rng.choice([f"<{case}@mail.example>", f"{case}@bare.example", ""])
    h.append("From: " + frm)
    h.append("To: " + ", ".join(tos))
    if ccs:
        h.append("Cc: " + ", ".join(ccs))
    if bccs:
        h.append("Bcc: " + ", ".join(bccs))
    if subj:
        h.append("Subject: " + subj)
    h.append("Date: " + date)
    if mid:
        h.append("Message-ID: " + mid)
    h.append("Content-Type: text/plain; charset=utf-8")
    body = "• bullet line one\r\n\r\n• bullet line two"
    return "\r\n".join(h) + "\r\n\r\n" + body


# r17: malformed RFC-2047 Q-runs — the stdlib header decoder is
# email._encoded_words.decode_q (a plain =HH regex substitution), NOT the
# body's a2b_qp: '==41' decodes to '=A', a trailing '=' survives, '=4'
# stays literal. A port that shares one QP kernel between headers and
# bodies diverges on every one of these.
MALFORMED_Q = ["=?utf-8?q?==41?=", "=?utf-8?q?abc=?=", "=?utf-8?q?=4?=",
               "=?utf-8?q?=G5x?=", "=?utf-8?q?a_b=e9?=", "=?utf-8?q?==?=",
               "=?iso-8859-1?q?=E9==E9?=", "=?utf-8?q?=e2=80=99low?="]


def build_malformed_eml(j, qw):
    h = ["From: " + qw + " <weird@example.com>",
         "To: dest@example.com",
         "Subject: " + qw,
         "Date: Fri, 23 Dec 2022 12:08:48 -0600",
         f"Message-ID: <malformed-{j}@mail.example>",
         "Content-Type: text/plain; charset=utf-8"]
    body = "\u2022 bullet line one\r\n\r\n\u2022 bullet line two"
    return "\r\n".join(h) + "\r\n\r\n" + body


def main():
    cases = []
    for i in range(120 + len(MALFORMED_Q)):
        eml = (build_eml(i) if i < 120
               else build_malformed_eml(i, MALFORMED_Q[i - 120]))
        els = partition_email(file=io.BytesIO(eml.encode("utf-8")))
        m = els[0].metadata if els else None
        cases.append({
            "case": i, "eml": eml,
            "sent_from": m.sent_from if m else None,
            "sent_to": m.sent_to if m else None,
            "cc": m.cc_recipient if m else None,
            "bcc": m.bcc_recipient if m else None,
            "subject": m.subject if m else None,
            "message_id": m.email_message_id if m else None,
            "last_modified": m.last_modified if m else None,
        })
    out_path = os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/graft/refvec/email_header_diff.ndjson")
    with open(out_path, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c, ensure_ascii=False) + "\n")
    print("wrote", len(cases), "cases")


if __name__ == "__main__":
    main()
