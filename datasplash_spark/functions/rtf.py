"""RTF text extraction (round 11).

RTF is the legacy-office text source (pre-OOXML Word, email
attachments, government archives). Prose extraction needs the same
structural handling the LaTeX scanner does — nested groups, control
words with numeric parameters, hex/unicode escapes — plus RTF's own
traps: destination groups whose content is NOT document text (font
tables, style sheets, embedded pictures), the ``\\uN`` unicode
escape whose FOLLOWING bytes are a fallback that must be skipped
(``\\ucN`` sets how many), and raw ``\\binN`` byte runs that would
desync a regex pass. One forward pass, zero dependencies, lenient on
malformed input.

Extraction contract: plain text outside control words survives;
``\\par``/``\\line`` → newline, ``\\tab`` → a separator (whitespace
normalizes to single spaces, as in the LaTeX scanner), ``\\~`` → space,
``\\{ \\} \\\\`` → literals, ``\\'hh`` → cp1252-ish byte (latin-1
decoded), ``\\uN`` → the unicode char (fallback skipped per
``\\uc``); destination groups (``{\\*\\...}``, fonttbl, colortbl,
stylesheet, info, pict, header/footer, field INSTRUCTIONS) drop
wholesale while field RESULTS (``\\fldrslt`` — the visible text of
a hyperlink) survive. Whitespace normalizes like the LaTeX scanner.

Scale posture: identical to the sibling modalities — an
Arrow-batched kernel where the document lives; only text rows cross.

Reference anchor: north-star text-source family (html/pdf/office/
latex siblings); RTF 1.9.1 is a public Microsoft specification.
"""

from __future__ import annotations

import re

#: destination control words whose whole group is not document text
_DROP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "headerl", "headerr", "headerf", "footer", "footerl",
    "footerr", "footerf", "footnote", "ftnsep", "ftnsepc", "xe",
    "tc", "fldinst", "themedata", "colorschememapping",
    "datastore", "latentstyles", "listtable", "listoverridetable",
    "generator", "pgptbl", "rsidtbl", "revtbl",
}

_CW_RE = re.compile(r"([a-zA-Z]+)(-?\d+)? ?")


def rtf_to_text(src: str) -> str:
    """Extract prose from an RTF source string (see the module
    docstring for the contract). Lenient: unbalanced braces and
    truncated escapes degrade to dropped spans, never raise."""
    out: list[str] = []
    i, n = 0, len(src)
    # group stack entries: (skipping, uc_skip)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc_skip = 1
    pending_uc_skip = 0

    def emit(s: str) -> None:
        nonlocal pending_uc_skip
        if skipping:
            return
        if pending_uc_skip > 0:
            drop = min(pending_uc_skip, len(s))
            pending_uc_skip -= drop
            s = s[drop:]
        if s:
            out.append(s)

    while i < n:
        c = src[i]
        if c == "{":
            stack.append((skipping, uc_skip))
            i += 1
            # {\* ... } : optional destination marker — the group is
            # a destination regardless of the control word
            if src.startswith("\\*", i):
                skipping = True
            continue
        if c == "}":
            if stack:
                skipping, uc_skip = stack.pop()
            i += 1
            continue
        if c == "\\":
            if i + 1 >= n:
                break
            nxt = src[i + 1]
            if nxt in "\\{}":
                emit(nxt)
                i += 2
                continue
            if nxt == "~":
                emit(" ")
                i += 2
                continue
            if nxt == "-":
                i += 2  # optional hyphen: no glyph
                continue
            if nxt == "_":
                emit("-")
                i += 2
                continue
            if nxt == "'":
                h = src[i + 2 : i + 4]
                if len(h) == 2:
                    try:
                        bb = bytes([int(h, 16)])
                        # cp1252: the smart-quote/dash range every
                        # Word-written \ansi file uses; latin-1 only
                        # for the 5 bytes cp1252 leaves undefined
                        try:
                            emit(bb.decode("cp1252"))
                        except UnicodeDecodeError:
                            emit(bb.decode("latin-1"))
                    except ValueError:
                        pass
                i += 4
                continue
            m = _CW_RE.match(src, i + 1)
            if not m:
                i += 2  # stray control symbol: drop
                continue
            word, num = m.group(1), m.group(2)
            i = m.end()
            if word == "bin":
                # raw bytes follow: skip them or a regex pass desyncs
                i += max(0, int(num or 0))
                continue
            if word == "u":
                try:
                    cp = int(num or 0)
                    if cp < 0:
                        cp += 65536
                    emit(chr(cp))
                except (ValueError, OverflowError):
                    pass
                if not skipping:
                    pending_uc_skip += uc_skip
                continue
            if word == "uc":
                uc_skip = max(0, int(num or 1))
                continue
            if word in _DROP_DESTS:
                skipping = True
                continue
            if word in ("par", "line", "sect", "page"):
                emit("\n")
                continue
            if word == "tab":
                emit("\t")
                continue
            if word == "emdash":
                emit("—")
                continue
            if word == "endash":
                emit("–")
                continue
            if word in ("lquote", "rquote"):
                emit("'")
                continue
            if word in ("ldblquote", "rdblquote"):
                emit('"')
                continue
            # every other control word is formatting: no glyph
            continue
        if c in "\r\n":
            i += 1  # raw newlines in RTF source are not text
            continue
        emit(c)
        i += 1

    text = "".join(out)
    # recombine \uN surrogate pairs (Word writes astral chars as two
    # escapes); lone surrogates would crash Arrow's UTF-8 conversion
    # OUTSIDE the per-row quarantine (review finding)
    if any("\ud800" <= ch <= "\udfff" for ch in text):
        text = text.encode("utf-16", "surrogatepass").decode(
            "utf-16", "replace"
        )
    lines = [
        re.sub(r"[ \t]+", " ", ln).strip() for ln in text.split("\n")
    ]
    text = "\n".join(lines)
    text = re.sub(r"\n{2,}", "\n", text)
    return text.strip()


def encode_rtf(paragraphs: list[str]) -> bytes:
    """Minimal RTF fixture writer: real header with a font table
    (which the extractor must drop), paragraphs separated by
    ``\\par``, non-ASCII as ``\\uN`` escapes with an ASCII
    fallback char (which the extractor must skip)."""
    body = []
    for p in paragraphs:
        enc = []
        for ch in p:
            if ch in "\\{}":
                enc.append("\\" + ch)
            elif ord(ch) < 128:
                enc.append(ch)
            else:
                # BMP chars: one signed-16-bit \uN; astral chars:
                # the UTF-16 surrogate PAIR (two escapes), exactly
                # how Word writes them (review finding: the old
                # wrap-around silently corrupted non-BMP text)
                u16 = ch.encode("utf-16-be")
                for k in range(0, len(u16), 2):
                    unit = int.from_bytes(u16[k : k + 2], "big")
                    if unit > 32767:
                        unit -= 65536
                    enc.append("\\u%d?" % unit)
        body.append("".join(enc))
    doc = (
        "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times New Roman;}}"
        "{\\info{\\author synthetic}}"
        "\\uc1 " + "\\par ".join(body) + "}"
    )
    return doc.encode("ascii")


RTF_FEATURES_SCHEMA = (
    "doc_id bigint, n_chars int, text string, ok boolean, err string"
)


def rtf_text_features(df, id_col="doc_id", media_col="media"):
    """Extract text from an RTF column into typed rows with
    per-document quarantine; extraction runs where the document
    lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = raw if raw is not None else b""
                try:
                    s = (
                        bytes(data).decode("latin-1")
                        if not isinstance(data, str)
                        else data
                    )
                    if not s.startswith("{\\rtf"):
                        raise ValueError("rtf: missing {\\rtf header")
                    t = rtf_to_text(s)
                    rows.append((did, len(t), t, True, None))
                except Exception as e:
                    rows.append((did, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "text", "ok", "err"],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=RTF_FEATURES_SCHEMA
    )
