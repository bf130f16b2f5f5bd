#!/usr/bin/env python3
"""Differential vectors for the filetype text differentiators (dev-only).

Runs the REFERENCE `_TextFileDifferentiator` (`file_utils/filetype.py`) over
seeded adversarial text payloads and pins `_is_csv` / `_is_json`:

 - `_is_csv`: the quote-parity comma-count lookahead regex (a comma counts
   only when an even number of quotes FOLLOWS it to end of line), Python
   `splitlines()` (which also breaks on VT/FF/FS/GS/RS/NEL/LS/PS), the
   <=10-line window, and the 4096-char `text_head` cut;
 - `_is_json`: `lstrip()[0] in "[{"` plus a full-file `json.load`.

`_is_eml` is NOT pinned: the engine's EML sniff deliberately emulates
libmagic's message/rfc822 detection (looser than the differentiator's strict
Date/Message-ID/Subject/From/To regex), because there is no libmagic stage in
front of it — divergence is by design, documented at `FileTypes.sniffText`.

`FileTypeDifferentialSpec` replays each vector through the engine's
`looksLikeCsv` (over the 4096-char head) and JSON-collection gate.
"""
import base64
import io
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


_stub("filetype", guess_mime=lambda x: None)
_stub("olefile", OleFileIO=object, isOleFile=lambda f: False)
_ox = _stub("oxmsg")
_ox.storage = _stub("oxmsg.storage", Storage=object)
_stub("oxmsg.util", lpstr_to_str=lambda b: "")
_stub("emoji", is_emoji=lambda c: False)
_stub("psutil")
_stub("requests")
_stub("iso639", Lang=object)


class _DF:
    seed = 0


_lde = _stub("langdetect.lang_detect_exception")


class LangDetectException(Exception):
    pass


_lde.LangDetectException = LangDetectException
_stub("langdetect", DetectorFactory=_DF, detect_langs=lambda t: [],
      lang_detect_exception=_lde)
_stub("magic", from_buffer=lambda b, mime=True: None,
      from_file=lambda f, mime=True: None)

from unstructured.file_utils.filetype import (  # noqa: E402
    _FileTypeDetectionContext,
    _TextFileDifferentiator,
)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/refvec/filetype_diff.ndjson")

rng = random.Random(20260815)

EXOTIC_BREAKS = ["\x0b", "\x0c", "\x1c", "\x1d", "\x1e", "\x85",
                 " ", " ", "\r\n", "\r", "\n"]
PAD = ["", " ", "\t", " ", " ", " ", "\x85", "\n  ", "  \n"]
CELLS = ["a", "bb", "x y", 'q"r', '"c,d"', '"e""f"', '""', "", "7", "-1.5",
         '"unclosed', 'trail"', ",", '",borked']


SAFE_CELLS = ["a", "bb", "x y", '"c,d"', '"e""f"', "7", "-1.5", ""]


def csv_grid():
    rows = rng.randint(1, 13)
    cols = rng.randint(1, 5)
    clean = rng.random() < 0.5  # balanced quotes, consistent arity -> csv=True
    ragged = not clean and rng.random() < 0.4
    cells = SAFE_CELLS if clean else CELLS
    out = []
    for r in range(rows):
        n = cols + (rng.randint(-1, 1) if ragged and r > 0 else 0)
        out.append(",".join(rng.choice(cells) for _ in range(max(1, n))))
    sep = rng.choice(EXOTIC_BREAKS) if rng.random() < 0.3 else "\n"
    return rng.choice(PAD) + sep.join(out) + rng.choice(PAD)


def jsonish():
    kind = rng.randrange(8)
    obj = {"a": rng.randint(0, 9), "b": ["x", None, True],
           "c": {"d": "é z"}}
    if kind == 0:
        return json.dumps(obj, indent=rng.choice([None, 2]))
    if kind == 1:
        return json.dumps([obj, obj])
    if kind == 2:  # scalar -> not a collection
        return json.dumps(rng.choice(["s", 3, True, None]))
    if kind == 3:  # truncated
        return json.dumps(obj)[:-rng.randint(1, 5)]
    if kind == 4:  # trailing garbage
        return json.dumps(obj) + rng.choice([",", "}", "x", " {}"])
    if kind == 5:  # ndjson
        return "\n".join(json.dumps({"i": i}) for i in range(rng.randint(2, 4)))
    if kind == 6:  # leading exotic whitespace
        return rng.choice([" ", "\x85", " \t"]) + json.dumps(obj)
    return json.dumps({"big": "y" * rng.randint(4000, 4200)})  # crosses head


def plain():
    words = ["lorem", "ipsum,", "dolor", "sit:", "amet", '"quote"']
    return " ".join(rng.choice(words) for _ in range(rng.randint(1, 30)))


def gen_payloads():
    for _ in range(200):
        yield csv_grid()
    for _ in range(120):
        yield jsonish()
    for _ in range(60):
        yield plain()
    # hand-picked parity edges
    yield 'a,b"\nx,y'
    yield '"a,b\nc,d'
    yield 'a,"b,c\nd,"e,f'
    yield "h1,h2\n" + "\n".join(f"v{i},w{i}" for i in range(12)) + "\nbroken"
    yield "x,y\x0cz,w"
    yield "x,y z,w"
    yield "{}"
    yield "[]"
    yield "  {\"a\": 1}"
    yield "{\"a\": 1}\nnot json"
    yield ("a,b\n" * 3000) + "broken line"  # divergence past the 4096 head


def main():
    import tempfile
    vectors = []
    for payload in gen_payloads():
        data = payload.encode("utf-8")
        with tempfile.NamedTemporaryFile(suffix=".dat", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            ctx = _FileTypeDetectionContext(file_path=path)
            d = _TextFileDifferentiator(ctx)
            vectors.append({
                "payload_b64": base64.b64encode(data).decode("ascii"),
                "is_csv": d._is_csv,
                "is_json": d._is_json,
            })
        finally:
            os.unlink(path)
    with open(OUT, "w") as f:
        for v in vectors:
            f.write(json.dumps(v) + "\n")
    n_csv = sum(v["is_csv"] for v in vectors)
    n_json = sum(v["is_json"] for v in vectors)
    print(f"wrote {len(vectors)} vectors ({n_csv} csv, {n_json} json) -> {OUT}")


if __name__ == "__main__":
    main()
