"""Zero-dependency PDF text extraction (round 9).

PDFs are a first-class source in real training-data corpora; this is
the text-modality analog of the image/audio codecs: a
correctness-first reference kernel with a fixture-generating writer,
strict quarantine for what it does not understand, and the same
``decode → typed rows`` Spark posture (bytes never shuffle — pages
extract where the document lives).

Scope:

- **Reader** (:func:`extract_pdf_text`): classic and
  object-scan-recoverable PDFs. Objects are located by a direct
  ``N G obj … endobj`` scan (the standard recovery strategy — robust
  to xref style, incremental updates, and mild damage), the page
  tree walks ``/Catalog → /Pages → /Kids`` (falling back to
  ``/Type /Page`` objects in object order when no catalog resolves),
  content streams decode ``/FlateDecode`` (zlib) or raw, and the
  text machine handles ``BT/ET``, ``Tj``, ``'``, ``"``, ``TJ`` with
  kerning arrays (gap > 250/1000 em → space), ``Td/TD/T*/Tm``
  line-break heuristics, literal strings with all escapes + octal +
  line continuations, hex strings, and UTF-16BE (BOM) text.
  Compressed object streams (``/ObjStm``), LZW, and encrypted files
  raise ``ValueError`` naming the feature — the quarantine contract.
- **Writer** (:func:`encode_pdf_text`): classic PDF 1.4 with a real
  xref table, one content stream per page (optionally Flate),
  Helvetica ``Tj`` lines — fixtures any external viewer opens.

Reference anchor: no analog in the reference (datasplash has no
document-decode surface); north-star multimodal/text extension
(BASELINE.json).
"""

from __future__ import annotations

import re
import struct  # noqa: F401  (kept with the codec family's imports)
import zlib


# ---------------------------------------------------------------------
# Micro-parser for PDF object syntax
# ---------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer over PDF syntax: names, numbers, strings (literal +
    hex), dicts, arrays, refs, keywords. Shared by the object parser
    and the content-stream text machine."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.pos = pos
        self.n = len(data)

    def _skip_ws(self) -> None:
        d, n = self.d, self.n
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_byte(self) -> int | None:
        self._skip_ws()
        return self.d[self.pos] if self.pos < self.n else None

    def token(self):
        """Next token: ('name', str) | ('num', float|int) |
        ('str', bytes) | ('dict', dict) | ('array', list) |
        ('ref', (n, g)) | ('kw', str) | None at end."""
        self._skip_ws()
        d, n = self.d, self.n
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while (
                self.pos < n
                and d[self.pos] not in _WS
                and d[self.pos] not in _DELIM
            ):
                self.pos += 1
            name = d[start : self.pos]
            # #xx hex escapes in names
            if b"#" in name:
                name = re.sub(
                    rb"#([0-9A-Fa-f]{2})",
                    lambda m: bytes([int(m.group(1), 16)]),
                    name,
                )
            return ("name", name.decode("latin-1"))
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if c == 0x3C:  # < hex string or << dict
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                return ("dict", self._dict())
            return ("str", self._hex_string())
        if c == 0x5B:  # [ array
            return ("array", self._array())
        if c == 0x5D:  # ]
            self.pos += 1
            return ("kw", "]")
        if c == 0x3E and self.pos + 1 < n and d[self.pos + 1] == 0x3E:
            self.pos += 2
            return ("kw", ">>")
        if c in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.pos < n and d[self.pos] in b"+-.0123456789":
                self.pos += 1
            txt = d[start : self.pos]
            # reference lookahead: N G R
            save = self.pos
            if b"." not in txt:
                self._skip_ws()
                s2 = self.pos
                while self.pos < n and d[self.pos] in b"0123456789":
                    self.pos += 1
                gen = d[s2 : self.pos]
                if gen:
                    self._skip_ws()
                    if self.pos < n and d[self.pos : self.pos + 1] == b"R" and (
                        self.pos + 1 >= n
                        or d[self.pos + 1] in _WS
                        or d[self.pos + 1] in _DELIM
                    ):
                        self.pos += 1
                        return ("ref", (int(txt), int(gen)))
                self.pos = save
            try:
                return ("num", int(txt))
            except ValueError:
                return ("num", float(txt))
        # keyword / operator
        start = self.pos
        while (
            self.pos < n
            and d[self.pos] not in _WS
            and d[self.pos] not in _DELIM
        ):
            self.pos += 1
        if self.pos == start:  # lone delimiter we don't handle
            self.pos += 1
            return ("kw", chr(c))
        return ("kw", d[start : self.pos].decode("latin-1"))

    def _literal_string(self) -> bytes:
        d, n = self.d, self.n
        assert d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append(
                        {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e]
                    )
                    self.pos += 1
                elif e in b"01234567":  # up to 3 octal digits
                    o = 0
                    k = 0
                    while k < 3 and self.pos < n and d[self.pos] in b"01234567":
                        o = o * 8 + (d[self.pos] - 48)
                        self.pos += 1
                        k += 1
                    out.append(o & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # \( \) \\ and unknown: literal next byte
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("pdf: unterminated literal string")

    def _hex_string(self) -> bytes:
        d, n = self.d, self.n
        assert d[self.pos] == 0x3C
        self.pos += 1
        digits = []
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x3E:
                if len(digits) % 2:
                    digits.append(0x30)  # odd count: pad with 0
                return bytes(
                    int(chr(digits[i]) + chr(digits[i + 1]), 16)
                    for i in range(0, len(digits), 2)
                )
            if c in b"0123456789ABCDEFabcdef":
                digits.append(c)
            elif c in _WS:
                continue
            else:
                raise ValueError("pdf: bad hex string digit")
        raise ValueError("pdf: unterminated hex string")

    def _array(self) -> list:
        assert self.d[self.pos] == 0x5B
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos >= self.n:
                raise ValueError("pdf: unterminated array")
            if self.d[self.pos] == 0x5D:
                self.pos += 1
                return out
            t = self.token()
            if t is None:
                raise ValueError("pdf: unterminated array")
            out.append(t)

    def _dict(self) -> dict:
        assert self.d[self.pos : self.pos + 2] == b"<<"
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.d[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            k = self.token()
            if k is None:
                raise ValueError("pdf: unterminated dictionary")
            if k[0] != "name":
                raise ValueError("pdf: dictionary key is not a name")
            v = self.token()
            if v is None:
                raise ValueError("pdf: unterminated dictionary")
            out[k[1]] = v


# ---------------------------------------------------------------------
# Document model: object scan + page tree
# ---------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _scan_objects(raw: bytes) -> dict[int, tuple[dict | None, bytes | None]]:
    """``{obj_num: (dict, stream_bytes)}`` by direct scan — the
    recovery strategy every serious extractor falls back to, used
    here as the primary path (robust to xref tables, xref streams,
    incremental updates; later definitions of the same object number
    win, matching incremental-update semantics). Scan positions that
    fall INSIDE a located stream's extent are skipped — compressed /
    binary stream bytes that happen to contain ``N G obj`` would
    otherwise create bogus objects that, under later-definition-wins,
    could silently clobber a real object of the same number (the
    standard recovery-scanner mitigation)."""
    objects: dict[int, tuple[dict | None, bytes | None]] = {}
    scan_pos = 0
    while True:
        m = _OBJ_RE.search(raw, scan_pos)
        if m is None:
            break
        scan_pos = m.end()
        num = int(m.group(1))
        lex = _Lexer(raw, m.end())
        try:
            t = lex.token()
        except ValueError:
            continue
        d = t[1] if t and t[0] == "dict" else None
        stream = None
        if d is not None:
            lex._skip_ws()
            if raw[lex.pos : lex.pos + 6] == b"stream":
                p = lex.pos + 6
                if raw[p : p + 2] == b"\r\n":
                    p += 2
                elif raw[p : p + 1] == b"\n":
                    p += 1
                ln = d.get("Length")
                if ln is not None and ln[0] == "num":
                    end = p + int(ln[1])
                else:  # Length behind a ref: find endstream
                    end = raw.find(b"endstream", p)
                    if end < 0:
                        continue
                stream = raw[p:end]
                # resume the object scan past the stream body so its
                # bytes can never spawn phantom objects
                scan_pos = max(scan_pos, end)
        objects[num] = (d, stream)
    return objects


def _resolve(objects, val):
    """Follow ('ref', (n, g)) tokens to their object's value."""
    seen = 0
    while val is not None and val[0] == "ref":
        num = val[1][0]
        entry = objects.get(num)
        if entry is None:
            return None
        d, stream = entry
        if d is not None:
            val = ("dict", d) if stream is None else ("stream", (d, stream))
        else:
            return None
        seen += 1
        if seen > 32:
            raise ValueError("pdf: reference cycle")
    return val


def _decode_stream(objects, d: dict, stream: bytes) -> bytes:
    filt = d.get("Filter")
    if filt is None:
        return stream
    names = []
    if filt[0] == "name":
        names = [filt[1]]
    elif filt[0] == "array":
        names = [t[1] for t in filt[1] if t[0] == "name"]
    out = stream
    for name in names:
        if name == "FlateDecode":
            try:
                out = zlib.decompress(out)
            except zlib.error as e:
                raise ValueError(f"pdf: bad Flate stream ({e})") from None
        else:
            raise ValueError(f"pdf: filter /{name} unsupported")
    return out


def _page_content_objs(objects) -> list[int]:
    """Page object numbers in document order: catalog → pages tree,
    else every /Type /Page object by number."""
    catalog = None
    for num, (d, _s) in objects.items():
        if d and d.get("Type") == ("name", "Catalog"):
            catalog = d
    pages: list[int] = []

    def walk(node_ref) -> None:
        node = _resolve(objects, node_ref)
        if node is None or node[0] not in ("dict", "stream"):
            return
        nd = node[1][0] if node[0] == "stream" else node[1]
        t = nd.get("Type")
        if t == ("name", "Page"):
            # record by identity of the ref (object number)
            pages.append(node_ref[1][0])
            return
        kids = _resolve(objects, nd.get("Kids")) or nd.get("Kids")
        if kids is not None and kids[0] == "array":
            for k in kids[1]:
                if k[0] == "ref":
                    walk(k)

    if catalog is not None:
        root = catalog.get("Pages")
        if root is not None and root[0] == "ref":
            walk(root)
    if not pages:
        for num in sorted(objects):
            d, _s = objects[num]
            if d and d.get("Type") == ("name", "Page"):
                pages.append(num)
    return pages


# ---------------------------------------------------------------------
# Content-stream text machine
# ---------------------------------------------------------------------


def _pdf_str_to_text(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def _extract_page_text(content: bytes) -> str:
    """Run the text operators of one content stream. Line breaks:
    ``T*``, ``'``, ``"``, and ``Td/TD/Tm`` that move DOWN the page;
    ``TJ`` kerning gaps beyond 250/1000 em become one space."""
    lex = _Lexer(content)
    stack: list = []
    out: list[str] = []
    line: list[str] = []
    in_text = False
    prev_tm_ty: float | None = None

    def newline() -> None:
        out.append("".join(line))
        line.clear()

    while True:
        try:
            t = lex.token()
        except ValueError:
            break  # tolerate a damaged tail: keep what we have
        if t is None:
            break
        kind, val = t
        if kind != "kw":
            stack.append(t)
            continue
        op = val
        if op == "BT":
            in_text = True
            prev_tm_ty = None
        elif op == "ET":
            in_text = False
        elif not in_text:
            stack.clear()
        elif op == "Tj":
            if stack and stack[-1][0] == "str":
                line.append(_pdf_str_to_text(stack[-1][1]))
            stack.clear()
        elif op == "'":
            newline()
            if stack and stack[-1][0] == "str":
                line.append(_pdf_str_to_text(stack[-1][1]))
            stack.clear()
        elif op == '"':
            newline()
            if stack and stack[-1][0] == "str":
                line.append(_pdf_str_to_text(stack[-1][1]))
            stack.clear()
        elif op == "TJ":
            if stack and stack[-1][0] == "array":
                for el in stack[-1][1]:
                    if el[0] == "str":
                        line.append(_pdf_str_to_text(el[1]))
                    elif el[0] == "num" and el[1] < -250:
                        line.append(" ")
            stack.clear()
        elif op in ("Td", "TD"):
            if len(stack) >= 2 and stack[-1][0] == "num":
                ty = stack[-1][1]
                if ty < 0:
                    newline()
            stack.clear()
        elif op == "T*":
            newline()
            stack.clear()
        elif op == "Tm":
            # a text matrix reset that moves DOWN the page = new
            # line (the documented heuristic): track the previous
            # Tm ty operand so upward / same-line repositioning
            # (kerned or positioned spans) does not insert spurious
            # breaks; the first Tm of a BT block never breaks
            if len(stack) >= 6 and stack[-1][0] == "num":
                ty = stack[-1][1]
                if prev_tm_ty is not None and ty < prev_tm_ty:
                    newline()
                prev_tm_ty = ty
            stack.clear()
        else:
            stack.clear()
    if line:
        newline()
    # drop leading empty line artifacts but keep interior blanks
    while out and out[0] == "":
        out.pop(0)
    return "\n".join(out)


def extract_pdf_text(raw: bytes) -> dict:
    """Extract text from a PDF. Returns ``{"n_pages": int,
    "pages": [str, ...], "text": str}`` (pages joined by form-feed).
    Raises ``ValueError`` naming the unsupported feature for
    encrypted files, object streams, and non-Flate filters — the
    quarantine contract of the codec family."""
    if raw[:5] != b"%PDF-":
        raise ValueError("pdf: missing %PDF header")
    if b"/Encrypt" in raw:
        raise ValueError("pdf: encrypted files unsupported")
    objects = _scan_objects(raw)
    if not objects:
        raise ValueError("pdf: no objects found")
    for _num, (d, _s) in objects.items():
        if d and d.get("Type") == ("name", "ObjStm"):
            raise ValueError("pdf: compressed object streams unsupported")
    page_nums = _page_content_objs(objects)
    if not page_nums:
        raise ValueError("pdf: no pages found")
    pages: list[str] = []
    for num in page_nums:
        d, _s = objects[num]
        contents = d.get("Contents") if d else None
        parts: list[bytes] = []
        refs = []
        if contents is not None and contents[0] == "ref":
            refs = [contents]
        elif contents is not None and contents[0] == "array":
            refs = [t for t in contents[1] if t[0] == "ref"]
        for r in refs:
            entry = objects.get(r[1][0])
            if entry is None:
                continue
            cd, cs = entry
            if cs is None:
                continue
            parts.append(_decode_stream(objects, cd or {}, cs))
        pages.append(_extract_page_text(b"\n".join(parts)))
    return {
        "n_pages": len(pages),
        "pages": pages,
        "text": "\f".join(pages),
    }


# ---------------------------------------------------------------------
# Writer (fixture generator)
# ---------------------------------------------------------------------


def _pdf_escape(s: str) -> bytes:
    """Text line → PDF string bytes: latin-1-able text as an escaped
    literal string, everything else as UTF-16BE (BOM) in a literal
    string with byte escapes."""
    try:
        b = s.encode("latin-1")
    except UnicodeEncodeError:
        b = b"\xfe\xff" + s.encode("utf-16-be")
    out = bytearray()
    for c in b:
        if c in b"()\\":
            out += b"\\" + bytes([c])
        elif c == 13:
            out += b"\\r"
        elif c == 10:
            out += b"\\n"
        else:
            out.append(c)
    return bytes(out)


def encode_pdf_text(pages: list[str], compress: bool = True) -> bytes:
    """Write a classic PDF 1.4: one Helvetica content stream per
    page (``Tj`` per line, ``TD`` line advance), optional
    FlateDecode, real xref table — a file any external viewer
    opens, and the roundtrip fixture for :func:`extract_pdf_text`."""
    objs: list[bytes] = []  # bodies, object number = index + 1

    n_pages = len(pages)
    # 1: catalog, 2: pages node, 3: font; then per page: page, stream
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % n for n in page_obj_nums)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, text in enumerate(pages):
        stream_num = page_obj_nums[i] + 1
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % stream_num
        )
        body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, ln in enumerate(text.split("\n")):
            if j:
                body += b"0 -14 Td\n"
            body += b"(" + _pdf_escape(ln) + b") Tj\n"
        body += b"ET"
        data = bytes(body)
        if compress:
            data = zlib.compress(data)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")
    offsets = [0]
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


# ---------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------


def synthesize_pdf_from_text(df, text="text", id_col="doc_id", pages_mod=3):
    """Deterministic synthetic PDF corpus — the document analog of
    ``synthesize_image_from_text``: per doc a REAL multi-page PDF
    (``1 + len(text) % pages_mod`` pages; the text splits across
    pages by word round-robin), so the extraction plumbing gets a
    value-level oracle without shipping binary fixtures. Returns
    ``(doc_id, n_pages, media binary)``."""
    from pyspark.sql import functions as F

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, npg, medias = [], [], []
            for did, t in zip(b[id_col], b["_t"]):
                t = t or ""
                n = 1 + len(t) % pages_mod
                words = t.split(" ")
                page_words: list[list[str]] = [[] for _ in range(n)]
                for i, w in enumerate(words):
                    page_words[i % n].append(w)
                pages = [" ".join(ws) for ws in page_words]
                ids.append(did)
                npg.append(n)
                medias.append(encode_pdf_text(pages))
            yield pd.DataFrame(
                {id_col: ids, "n_pages": npg, "media": medias}
            )

    return df.select(
        F.col(id_col), F.col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{id_col} bigint, n_pages int, media binary")


def pdf_text_features(df, id_col="doc_id", media_col="media"):
    """Extract text from a PDF column into typed rows: ``(doc_id,
    n_pages, n_chars, text, ok, err)`` with per-document quarantine
    (a poison PDF yields its own ``ok=false`` row, siblings
    extract). Bytes never shuffle — extraction runs where the
    document lives and only the text rows cross back; at 100 TB
    follow with the standard text pipeline (quality → dedup →
    tokenize) exactly as for any other text source."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    d = extract_pdf_text(data)
                    rows.append(
                        (did, d["n_pages"], len(d["text"]), d["text"],
                         True, None)
                    )
                except Exception as e:
                    rows.append(
                        (did, None, None, None, False,
                         f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_pages", "n_chars", "text", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract,
        schema=f"{id_col} bigint, n_pages int, n_chars int, "
        "text string, ok boolean, err string",
    )
