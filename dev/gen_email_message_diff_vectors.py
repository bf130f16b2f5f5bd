#!/usr/bin/env python3
"""Differential-vector generator for WHOLE-MESSAGE partition_email
(dev-only, not shipped).

The email-header corpus pins header decoding per field and the QP rows pin
the body transfer decode in isolation; this corpus pins the COMPOSITION —
the full `partition_email(file=...)` pipeline (`partition/email.py:31-180`):
RFC-822 parse under `policy.default` header folding/decoding, body-part
selection (first non-attachment text part, html preferred — corpus messages
keep plain-only bodies so the stubbed html route is never taken),
content-transfer decode (7bit/QP/base64 x charsets), partition_text over
the body, and the per-element message metadata (sent_from/sent_to/cc/bcc/
subject/email_message_id).

Stubs are shared with `gen_classifier_vectors.install_stubs()` (same
deterministic tokenize twins the Scala classifier ports; the real
typing_extensions is restored for pydantic; lxml/bs4 only need to IMPORT,
never run). `languages=[""]` short-circuits language metadata.

Every wire message is pure ASCII (unicode travels via RFC-2047 encoded
words and QP/base64 bodies), so feeding the same bytes to the JVM as a
string is charset-neutral.

Emits one row per message:
  {"raw": <esc>, "elements": [[category, <esc>], ...], "sent_from": [...],
   "sent_to": [...], "cc": [...], "bcc": [...], "subject": ... ,
   "message_id": ...}
replayed by `EmailMessageDifferentialSpec`.
"""
import io
import json
import os
import random
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import typing_extensions as _real_te  # keep for pydantic (ontology import)
import gen_classifier_vectors as gc  # noqa: E402

gc.install_stubs()
sys.modules["typing_extensions"] = _real_te

# partition_email imports the html partitioner package at module level; give
# the lxml/bs4 stubs just enough shape to IMPORT (class bases + parser-lookup
# registry) — any actual CALL still raises loudly.
_et = sys.modules["lxml.etree"]


class _Lookup:
    def __init__(self, *a, **k):
        pass

    def get_namespace(self, ns):
        return dict()


_et.ElementBase = type("ElementBase", (), {})
_et._Element = type("_Element", (), {})
_et.HTMLParser = lambda **k: types.SimpleNamespace(
    set_element_class_lookup=lambda *a, **kk: None)
_et.ElementDefaultClassLookup = _Lookup
_et.ElementNamespaceClassLookup = _Lookup


def _loud(n):
    def f(*a, **k):
        raise RuntimeError("stub reached: " + n)
    return f


_bs4 = types.ModuleType("bs4")
_bs4.BeautifulSoup = _loud("bs4.BeautifulSoup")
_bs4.Tag = type("Tag", (), {})
sys.modules["bs4"] = _bs4

from unstructured.partition.email import partition_email  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src/test/resources/graft/refvec/email_message_diff.ndjson")

FROMS = [
    'alice@example.com',
    '"Doe, Jane" <jane@example.com>',
    'Bob Smith <bob@example.org>',
    '=?utf-8?q?Caf=C3=A9_Team?= <team@cafe.example>',
    '=?utf-8?b?15DXkdeZ?= <hebrew@example.co.il>',
    '=?iso-8859-1?q?Jos=E9?= <jose@example.es>',
]
TOS = [
    'dest@example.com',
    'a@x.com, b@y.com',
    '"Last, First" <lf@example.com>, plain@example.com',
    '=?utf-8?q?R=C3=A9mi?= <remi@example.fr>',
]
SUBJECTS = [
    'Plain subject line',
    '=?utf-8?q?caf=C3=A9_meeting_moved?=',
    '=?utf-8?b?8J+mgCBjcmFiIG5ld3M=?=',
    'Re: Fwd: the quarterly numbers',
    '=?iso-8859-8?b?4eXn8A==?=',
    '',
]
BODY_TEXTS = [
    "Hello team,\n\nThe meeting moved to Tuesday afternoon this week.\n\n- bring notes\n- arrive early\n",
    "Status Report\n\nEverything is on track and running smoothly today.\n\n1. first item\n2. second item\n",
    "café corner\n\nthe espresso machine finally works again, rejoice.\n",
    "שלום לכולם\n\nzeh mivchan shel tochen ivri.\n",
    "crab \U0001f980 news\n\nthe crustacean quarterly arrives on thursday morning.\n",
    "ALL HANDS MEETING\n\nDOE, JOHN\n\nuser@example.com\n",
    "one short line\n",
    "",
    "   \n\n  ",
    "broken\nline paragraph that was wrapped by a mail client badly.\n\nsecond paragraph follows here.\n",
]


def qp_encode(text, charset):
    import quopri
    return quopri.encodestring(text.encode(charset)).decode("ascii")


def b64_encode(text, charset):
    import base64
    raw = base64.encodebytes(text.encode(charset)).decode("ascii")
    return raw


def build_message(rng):
    frm = rng.choice(FROMS)
    to = rng.choice(TOS)
    subj = rng.choice(SUBJECTS)
    body = rng.choice(BODY_TEXTS)
    charset = rng.choice(["utf-8", "utf-8", "iso-8859-1", "iso-8859-8"])
    try:
        body.encode(charset)
    except UnicodeEncodeError:
        charset = "utf-8"
    enc = rng.choice(["7bit", "quoted-printable", "base64"])
    if enc == "7bit":
        try:
            body.encode("ascii")
        except UnicodeEncodeError:
            enc = "quoted-printable"
    lines = [f"From: {frm}", f"To: {to}"]
    if rng.random() < 0.4:
        lines.append(f"Cc: {rng.choice(TOS)}")
    if rng.random() < 0.2:
        lines.append(f"Bcc: {rng.choice(TOS)}")
    if subj or rng.random() < 0.8:
        lines.append(f"Subject: {subj}")
    if rng.random() < 0.7:
        lines.append(f"Message-ID: <msg-{rng.randrange(10**6)}@example.com>")
    lines.append("Date: Mon, 17 Aug 2026 10:00:00 +0000")
    attach = rng.random() < 0.3
    if attach:
        boundary = f"BOUND{rng.randrange(10**6)}"
        lines.append(f'Content-Type: multipart/mixed; boundary="{boundary}"')
        lines.append("")
        lines.append(f"--{boundary}")
    head_body = [f"Content-Type: text/plain; charset={charset}",
                 f"Content-Transfer-Encoding: {enc}", ""]
    if enc == "quoted-printable":
        payload = qp_encode(body, charset)
    elif enc == "base64":
        payload = b64_encode(body, charset)
    else:
        payload = body
    if attach:
        tail = [f"--{boundary}",
                "Content-Type: application/octet-stream",
                'Content-Disposition: attachment; filename="data.bin"',
                "Content-Transfer-Encoding: base64", "", "AAECAw==",
                f"--{boundary}--", ""]
        msg = "\r\n".join(lines + head_body) + "\r\n" + payload + "\r\n" + \
            "\r\n".join(tail)
    else:
        msg = "\r\n".join(lines + head_body) + "\r\n" + payload + "\r\n"
    return msg


def esc(s):
    if s is None:
        return None
    units = s.encode("utf-16-be")
    return "".join("\\u%04x" % int.from_bytes(units[i:i + 2], "big")
                   for i in range(0, len(units), 2))


def build_alternative(rng):
    """multipart/alternative with BOTH text/plain and text/html parts — used
    with content_source="text/plain" so the preference logic (not the stubbed
    html partitioner) is what gets exercised: the reference must pick the
    plain part even though html is present and listed second."""
    frm = rng.choice(FROMS)
    subj = rng.choice(SUBJECTS)
    body = rng.choice([b for b in BODY_TEXTS if b.strip()])
    boundary = f"ALT{rng.randrange(10**6)}"
    charset = "utf-8"
    enc = rng.choice(["quoted-printable", "base64"])
    payload = (qp_encode(body, charset) if enc == "quoted-printable"
               else b64_encode(body, charset))
    html = "<html><body><p>ignored html twin</p></body></html>"
    order_plain_first = rng.random() < 0.5
    plain_part = [f"--{boundary}",
                  f"Content-Type: text/plain; charset={charset}",
                  f"Content-Transfer-Encoding: {enc}", "", payload]
    html_part = [f"--{boundary}", "Content-Type: text/html", "", html]
    parts = (plain_part + html_part) if order_plain_first else (html_part + plain_part)
    lines = [f"From: {frm}", "To: dest@example.com", f"Subject: {subj}",
             "Date: Mon, 17 Aug 2026 10:00:00 +0000", "MIME-Version: 1.0",
             f'Content-Type: multipart/alternative; boundary="{boundary}"', ""]
    return "\r\n".join(lines + parts + [f"--{boundary}--", ""])


def main():
    rng = random.Random(20260821)
    msgs = [(build_message(rng), "text/html") for _ in range(160)]
    rng2 = random.Random(20260822)
    msgs += [(build_alternative(rng2), "text/plain") for _ in range(40)]
    n = 0
    with open(OUT, "w") as fh:
        for raw, content_source in msgs:
            # process_attachments=False: the attachment recursion routes
            # through partition.auto (filetype lib, unavailable) and is
            # pinned separately by the attachment queries — this corpus pins
            # the MESSAGE pipeline, incl. skipping attachment parts when
            # selecting the body
            els = partition_email(file=io.BytesIO(raw.encode("ascii")),
                                  content_source=content_source,
                                  process_attachments=False,
                                  languages=[""])
            md = els[0].metadata if els else None
            rec = {
                "raw": esc(raw),
                "content_source": content_source,
                "elements": [[e.category, esc(e.text)] for e in els],
                "sent_from": [esc(x) for x in (md.sent_from or [])] if md else [],
                "sent_to": [esc(x) for x in (md.sent_to or [])] if md else [],
                "cc": [esc(x) for x in (md.cc_recipient or [])] if md else [],
                "bcc": [esc(x) for x in (md.bcc_recipient or [])] if md else [],
                "subject": esc(md.subject) if md else None,
                "message_id": esc(md.email_message_id) if md else None,
            }
            fh.write(json.dumps(rec, ensure_ascii=True) + "\n")
            n += 1
    print(f"wrote {n} vectors -> {OUT}")


if __name__ == "__main__":
    main()
