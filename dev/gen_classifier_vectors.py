#!/usr/bin/env python3
"""Dev-only: regenerate src/test/resources/graft/classifier-cascade-vectors.txt.

Runs the REFERENCE's element_from_text cascade (partition/text.py:111-166,
first match wins) over an adversarial battery of strings chosen to collide
multiple cascade branches, and records (expected element type, text) pairs.
ClassifierCascadeDifferentialSpec replays them through
Predicates.classifyText, so any divergence in branch ORDER, the regex
predicates, thresholds, or Python-semantics mirrors (strip, isupper,
isnumeric, istitle) fails the build.

The reference's tokenizers are spaCy-bound (model download — impossible
offline), so pos_tag / sent_tokenize / word_tokenize are replaced with the
SAME deterministic approximations the Scala side documents
(Predicates.containsVerb closed list + suffix rule; the [^.!?]+[.!?]+
sentence extraction; maximal-letter-run word tokens), and ENGLISH_WORDS is
loaded from the repo's own lexicon (the reference's english-words.txt
payload is absent from the checkout). Everything else — the cascade, the
real nlp/patterns.py regexes, thresholds, unicode str-method semantics —
is the reference's actual code.

Usage:  python3 dev/gen_classifier_vectors.py   (from the repo root)
"""

import re
import sys
import types

REF = "/root/reference"
OUT = "src/test/resources/graft/classifier-cascade-vectors.txt"
LEXICON = "src/main/resources/graft/english-words.txt"

# keep in sync with Predicates.CommonVerbs
COMMON_VERBS = set("""
is are was were be been being am has have had do does did will would
can could shall should may might must go goes went get gets got make makes
made see sees saw run runs ran contains met walk walking said says
ask asks look looks take takes took give gives gave tell tells told know
knows knew think thinks find finds come comes came want wants use uses put
puts call calls keep keeps kept let lets begin begins began show shows hear
hears heard play plays move moves bring brings brought write writes wrote
read reads sit sits sat stand stands stood lose loses lost pay pays paid
meet meets set sets learn learns lead leads led happen happens become
becomes became seem seems
""".split())
VERB_SUFFIX = re.compile(r"^[a-z]{3,}(ing|ed)$")
SENT_RE = re.compile(r"[^.!?]+[.!?]+|[^.!?]+$")
LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


def _stub(name, pkg=False):
    m = types.ModuleType(name)
    if pkg:
        m.__path__ = []
    sys.modules[name] = m
    return m


def _loud(name):
    def f(*a, **k):
        raise RuntimeError(f"stub {name} called — vector would be invalid")
    return f


def install_stubs():
    sys.path.insert(0, REF)
    _stub("requests").get = _loud("requests.get")
    te = _stub("typing_extensions")
    import typing
    for attr in dir(typing):
        setattr(te, attr, getattr(typing, attr))
    sys.modules["regex"] = re  # chunking/base.py only; not on our code path
    lxml = _stub("lxml", pkg=True)
    etree = _stub("lxml.etree")
    lxml.etree = etree

    class ParserError(Exception):
        pass

    etree.ParserError = ParserError
    etree.tostring = _loud("lxml.etree.tostring")
    lhtml = _stub("lxml.html")
    lxml.html = lhtml
    for fn in ("fromstring", "fragment_fromstring", "document_fromstring"):
        setattr(lhtml, fn, _loud(f"lxml.html.{fn}"))
    _stub("emoji").replace_emoji = _loud("emoji.replace_emoji")
    _stub("charset_normalizer").detect = _loud("charset_normalizer.detect")
    psutil = _stub("psutil")
    psutil.virtual_memory = _loud("psutil.virtual_memory")
    psutil.Process = _loud("psutil.Process")
    iso639 = _stub("iso639")
    iso639.Language = _loud("iso639.Language")
    iso639.LanguageNotFoundError = type("LanguageNotFoundError", (Exception,), {})
    ld = _stub("langdetect")
    ld.DetectorFactory = types.SimpleNamespace(seed=0)
    ld.detect_langs = _loud("langdetect.detect_langs")
    ld.lang_detect_exception = types.SimpleNamespace(
        LangDetectException=type("LangDetectException", (Exception,), {}))
    sys.modules["langdetect.lang_detect_exception"] = ld.lang_detect_exception

    # deterministic tokenize module, pre-seeded so the spaCy import never runs
    tok = _stub("unstructured.nlp.tokenize")

    def sent_tokenize(text):
        return [s for s in SENT_RE.findall(text.strip()) if s.strip()]

    def word_tokenize(text):
        return LETTER_RUN.findall(text)

    def pos_tag(text):
        words = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
        return [
            (w, "VB" if w in COMMON_VERBS or VERB_SUFFIX.fullmatch(w) else "NN")
            for w in words
        ]

    tok.sent_tokenize = sent_tokenize
    tok.word_tokenize = word_tokenize
    tok.pos_tag = pos_tag
    tok.download_nltk_packages = lambda *a, **k: None

    # the repo lexicon stands in for the absent english-words.txt payload
    ew = _stub("unstructured.nlp.english_words")
    with open(LEXICON, encoding="utf-8") as f:
        ew.ENGLISH_WORDS = frozenset(
            w.strip() for w in f if w.strip() and not w.startswith("#")
        )


BATTERY = [
    # --- bullet beats everything after it in the cascade ---
    "• hello@example.com",
    "• Doylestown, PA 18901",
    "• 1. first item of the list",
    "• This sentence has a verb and reads like narrative text.",
    "• Short Bulleted Title",
    "* star bullet with words",
    "- dash bullet line",
    "□ white square bullet item",
    "⁃ hyphen bullet item",
    "∙ bullet operator item",
    " private-use wingding bullet item",
    "-- double dash not a bullet, reads as text",
    "•no space after bullet",
    "  • leading spaces before bullet",
    # --- email: full-match on stripped text; order after bullets ---
    "hello@example.com",
    "  spaced@example.com  ",
    "HELLO@EXAMPLE.COM",
    "first.last+tag@sub.domain.org",
    "contact hello@example.com today",
    "hello@example.com.",
    "hello@example",
    "not-an-email@",
    "hello@example.com is where you reach the whole team now.",
    # --- US city/state/zip: before numbered list ---
    "Doylestown, PA 18901",
    "DOYLESTOWN, PENNSYLVANIA 18901",
    "Doylestown, Pennsylvania, 18901",
    "Dallas, TX 75201-1234",
    "Dallas TX 75201",
    "Paris, France 75001",
    "Salt Lake City, UT 84101",
    "Dallas, TX",
    # --- numbered list vs narrative/title ---
    "1. first numbered item",
    "1) parenthesized numbered item",
    "1.2 not a simple numbered list",
    "10. double digit item",
    "1. This numbered item has a verb and ends with a period.",
    "2. Second Item Title Case",
    "a. lettered item is not a numbered list",
    "1 unnumbered but starts with a digit",
    # --- narrative vs title order edges ---
    "This is a sentence with a verb in it.",
    "The quick brown fox jumped over the lazy dog twice today.",
    "To whom it may concern:",
    "Introduction",
    "ITEM 1A. RISK FACTORS",
    "ITEM 1. Financial Statements (Unaudited)",
    "Summary of Findings and Recommendations",
    "A title that runs much much longer than the twelve word cap allows here",
    "Short verbless fragment here",
    "He ran. She walked. They sat together for a while afterwards.",
    "One short. Two short.",
    "First sentence runs to five words. Second sentence also runs five words.",
    "THIS IS ALL CAPS WITH PUNCT.",
    "THIS IS ALL CAPS NO PUNCT",
    "All Caps Ratio Title Case Words",
    "mostly lowercase words making a verbless fragment list string",
    "Name: John Smith",
    "Total: $45,678.90",
    "-----------BREAK---------",
    "== Section ==",
    "...",
    "3.14",
    "2023",
    "½",
    "Ⅷ",
    "3.14 is the famous constant pi.",
    "e.g. this one has an abbreviation.",
    "U.S. Department of Commerce",
    "Dr. Smith went to Washington.",
    "My Dearest Friends,",
    "Best regards,",
    "Who is there?",
    "Stop!",
    "Is this a question with a verb?",
    "A b c d e f.",
    "One Two three four",
    "One Two Three four",
    "word",
    "Word",
    "WORD",
    "it",
    # --- unicode / whitespace mirrors of Python str methods ---
    " • NBSP before bullet",
    "Café opened its doors yesterday and served many espressos.",
    "ПРИВЕТ МИР.",
    "Привет мир это предложение.",
    "日本語のテキストです。",
    "Ｆｕｌｌｗｉｄｔｈ Ｔｅｘｔ",
    "\ttabbed@example.com\n",
    "vertical tab around title",
    "Line one\nline two stays one classification unit.",
    "số 1 đường Lê Lợi",
    "Üppige Überschrift Ohne Verb",
    "12345 67890",
    "#hashtag only",
    "(parenthetical aside)",
    "$$$ %%% ^^^",
    "iPhone sales rose sharply last quarter, beating every forecast.",
    "McDonald Reports Quarterly Earnings",
    "von der Leyen spoke at the summit yesterday evening.",
    # --- strip/empty edges (partition skips empties; these are near-empty) ---
    " . ",
    "a",
    " A ",
    "• • nested bullets",
    "1. ",
    "1.",
    # --- second tranche: deeper regex/order edges ---
    "· middle dot bullet item",
    "– en dash bullet line",
    "— em dash is not a bullet",
    "○ white circle bullet",
    "● black circle bullet",
    "◘ inverse bullet",
    "◦ white bullet",
    "☙ reversed floral heart",
    "❥ heart bullet",
    "❧ rotated floral heart",
    "⦾ circled white bullet",
    "⦿ circled black bullet",
    "* * two stars is a bullet then a bullet",
    "** double star fails the lookahead",
    "-• dash then bullet fails the lookahead",
    "1.1. nested numbering",
    "1.2.3 deep section number",
    "(1) fully parenthesized number",
    "i. roman numeral item",
    "A. capital lettered item",
    "11) two digit paren item",
    "123. three digit item",
    "1234. four digit item",
    "1. 2. 3. several numbers",
    "Austin, Texas 78701",
    "austin, texas 78701",
    "Washington, DC 20500",
    "St. Louis, MO 63101",
    "Winston-Salem, NC 27101",
    "San Juan, PR 00901",
    "Doylestown, PA",
    "PA 18901",
    "user.name@example.co.uk",
    "user_name@example-site.com",
    "user%40name@example.com",
    "USER@example.com",
    "user@EXAMPLE.com",
    "@example.com",
    "user@@example.com",
    "two@emails.com and one@more.net",
    "Risk Factors.",
    "Risk Factors",
    "RISK FACTORS?",
    "RISK FACTORS",
    "1A. Risk Factors",
    "The Company Is A Delaware Corporation.",
    "the company is a delaware corporation.",
    "Our Business Could Be Harmed By These Many Different Risk Factor Events Today.",
    "Table of Contents",
    "TABLE OF CONTENTS.",
    "Exhibit 10.1",
    "Section 2.01. Definitions.",
    "WHEREAS, the parties wish to enter into this agreement;",
    "NOW, THEREFORE, the parties agree as follows:",
    "IN WITNESS WHEREOF.",
    "Página uno contiene texto narrativo con varias palabras.",
    "Les enfants jouaient dans le jardin toute la journée.",
    "Zürich, CH 8001",
    "٣ ١٤ arabic digits",
    "①②③ circled numbers",
    "Ellipsis trails off…",
    "Semi-colon; still one sentence overall here.",
    "Colon: then more words follow after it.",
    "Quoted “Title Here” With Curly Quotes",
    "'single quoted fragment'",
    "He said “stop” and left the room quietly.",
    "x",
    "X.",
    "0",
    "-1",
    "3,14",
    "No. 5",
    "No 5.",
    # astral (non-BMP) chars must survive the surrogate-pair escape round-trip
    "Rocket launches are genuinely exciting events \U0001f680 today.",
    "\U0001f600 emoji-lead fragment",
]


def main():
    install_stubs()
    from unstructured.partition.text import element_from_text

    rename = {"Text": "UncategorizedText"}
    lines = []
    for text in BATTERY:
        kind = type(element_from_text(text)).__name__
        kind = rename.get(kind, kind)
        # one escape per UTF-16 code unit: astral chars become surrogate
        # pairs (two \uXXXX), which Java/Scala's UTF-16 strings reassemble
        b = text.encode("utf-16-be")
        units = [int.from_bytes(b[i : i + 2], "big") for i in range(0, len(b), 2)]
        esc = "".join(
            chr(u) if 0x20 <= u < 0x7F and u != 0x5C else "\\u%04x" % u
            for u in units
        )
        lines.append(f"{kind}\t{esc}")
    with open(OUT, "w", encoding="ascii") as f:
        f.write("# expected_element_type<TAB>text (\\uXXXX-escaped)\n")
        f.write("# generated by dev/gen_classifier_vectors.py - do not edit\n")
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} vectors to {OUT}")


if __name__ == "__main__":
    main()
