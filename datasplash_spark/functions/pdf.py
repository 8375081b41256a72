"""Zero-dependency PDF text extraction (rounds 9-10).

PDFs are a first-class source in real training-data corpora; this is
the text-modality analog of the image/audio codecs: a
correctness-first reference kernel with a fixture-generating writer,
strict quarantine for what it does not understand, and the same
``decode → typed rows`` Spark posture (bytes never shuffle — pages
extract where the document lives).

Scope:

- **Reader** (:func:`extract_pdf_text`): classic (PDF 1.4 xref
  table) AND modern (PDF 1.5+ cross-reference-stream / compressed
  object-stream) files. Objects are located by a direct
  ``N G obj … endobj`` scan (the standard recovery strategy — robust
  to xref style, incremental updates, and mild damage; stream
  extents are skipped so binary bytes can't spawn phantom objects),
  then every ``/Type /ObjStm`` container is inflated and its
  embedded objects merged in with file-offset-wins semantics
  (round 10 — generalizes later-definition-wins to objects that
  live inside object streams). The page tree walks
  ``/Catalog → /Pages → /Kids`` (falling back to ``/Type /Page``
  objects in object order when no catalog resolves), stream filters
  decode ``/FlateDecode`` (zlib), ``/LZWDecode`` (MSB-first 9→12-bit
  codes with EarlyChange), ``/ASCIIHexDecode``, ``/ASCII85Decode``,
  and ``/RunLengthDecode``, honoring ``/DecodeParms`` PNG/TIFF
  predictors, and the text machine handles ``BT/ET``, ``Tj``, ``'``,
  ``"``, ``TJ`` with kerning arrays (gap > 250/1000 em → space),
  ``Td/TD/T*/Tm`` line-break heuristics, literal strings with all
  escapes + octal + line continuations, hex strings, and UTF-16BE
  (BOM) text. EMBEDDED-FONT text decodes through per-font
  ``/ToUnicode`` CMaps (round 10 s2: codespacerange/bfchar/bfrange
  incl. the array form, ``Tf`` font tracking, inherited
  ``/Resources``) — the path real CID/Type0-font corpora need;
  fonts without a CMap keep the latin-1 / UTF-16BE default.
  ENCRYPTED files with an empty user or owner password
  — the common owner-locked case — decrypt via the standard
  security handler (:mod:`.pdfcrypt`: RC4 R2-R4, AES-128 /AESV2,
  AES-256 R6 /AESV3); genuinely password-protected files,
  non-Standard security handlers, and unknown filters raise
  ``ValueError`` naming the feature — the quarantine contract.
- **Writer** (:func:`encode_pdf_text`): ``layout="classic"`` writes
  PDF 1.4 with a real xref table; ``layout="objstm"`` writes PDF 1.5
  with the document dictionaries packed in a ``/ObjStm`` and a
  cross-reference STREAM (``/Type /XRef``, ``/W [1 4 2]``, PNG-Up
  predictor) — fixtures any external viewer opens, exercising both
  reader paths. ``filter_name`` selects Flate or LZW for the
  content streams.

Reference anchor: no analog in the reference (datasplash has no
document-decode surface); north-star multimodal/text extension
(BASELINE.json).
"""

from __future__ import annotations

import hashlib
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
# Stream filters (round 10): LZW, ASCIIHex, ASCII85, RunLength,
# PNG/TIFF predictors
# ---------------------------------------------------------------------


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """``/LZWDecode``: MSB-first variable-width codes (9→12 bits),
    Clear=256, EOD=257, first assigned code 258, with the PDF/TIFF
    ``EarlyChange`` width-switch (default 1: the code width grows one
    code earlier than strictly necessary). Width rule: after each
    code's dictionary add, grow when ``next + early >= 1 << width``
    (the rule pdfminer/pdf.js-family decoders use; the paired
    encoder below uses the mirrored ``>`` form, and the roundtrip is
    property-fuzzed across all three width boundaries)."""
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:  # clear
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("pdf: bad LZW code")
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):  # KwKwK
                    entry = prev + prev[:1]
                else:
                    raise ValueError("pdf: bad LZW code")
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            out += entry
            prev = entry
            if width < 12 and len(table) + early_change >= (1 << width):
                width += 1
    return bytes(out)  # tolerate a missing EOD (lenient, like Flate tails)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """LZW encoder paired with :func:`_lzw_decode` — fixture
    generator for the writer's ``filter_name="lzw"`` path. Emits
    Clear up front (per spec recommendation) and again when the
    table fills."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if nxt < 4096:
            table[wc] = nxt
            nxt += 1
            if width < 12 and nxt + early_change > (1 << width):
                width += 1
        if width == 12 and nxt + early_change > 4096:
            emit(256, width)  # table full: clear and restart
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # the decoder adds a dictionary entry for this final code
        # (it cannot know EOD follows) and may grow the code width
        # before reading EOD — mirror that growth or the EOD is
        # written one bit narrower than it is read (end-of-stream
        # desync found by the roundtrip property fuzz)
        if nxt < 4096:
            nxt += 1
            if width < 12 and nxt + early_change > (1 << width):
                width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _asciihex_decode(data: bytes) -> bytes:
    digits = []
    for c in data:
        if c == 0x3E:  # >
            break
        if c in b"0123456789ABCDEFabcdef":
            digits.append(chr(c))
        elif c not in _WS:
            raise ValueError("pdf: bad ASCIIHex digit")
    if len(digits) % 2:
        digits.append("0")
    return bytes(
        int(digits[i] + digits[i + 1], 16) for i in range(0, len(digits), 2)
    )


def _ascii85_decode(data: bytes) -> bytes:
    out = bytearray()
    group: list[int] = []
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x7E:  # ~> EOD
            break
        if c == 0x7A:  # z = four zero bytes (only between groups)
            if group:
                raise ValueError("pdf: ASCII85 'z' inside group")
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError("pdf: bad ASCII85 character")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise ValueError("pdf: truncated ASCII85 group")
        k = len(group)
        group += [84] * (5 - k)  # pad with 'u'
        v = 0
        for g in group:
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:  # EOD
            break
        if ln < 128:
            if i + ln + 1 > n:
                raise ValueError("pdf: truncated RunLength literal")
            out += data[i : i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise ValueError("pdf: truncated RunLength run")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


def _predictor_undo(data: bytes, parms: dict) -> bytes:
    """Undo ``/DecodeParms`` predictors: 1 = none, 2 = TIFF
    horizontal differencing (8-bit components), 10-15 = PNG filters
    per row (None/Sub/Up/Average/Paeth — the row filter byte selects
    per row, so one handler covers all five). XRef streams in the
    wild almost always use PNG Up (12)."""
    pred = parms.get("Predictor", 1)
    if pred == 1:
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if pred == 2:
        if bpc != 8:
            raise ValueError("pdf: TIFF predictor needs 8-bit components")
        row_len = colors * columns
        out = bytearray(data)
        for r in range(0, len(out) - row_len + 1, row_len):
            for j in range(colors, row_len):
                out[r + j] = (out[r + j] + out[r + j - colors]) & 0xFF
        return bytes(out)
    if not 10 <= pred <= 15:
        raise ValueError(f"pdf: predictor {pred} unsupported")
    bpp = max(1, (colors * bpc) // 8)
    row_len = (colors * bpc * columns + 7) // 8
    out = bytearray()
    prev_row = bytes(row_len)
    pos = 0
    while pos + 1 + row_len <= len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        pos += 1 + row_len
        if ft == 1:  # Sub
            for j in range(bpp, row_len):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(row_len):
                row[j] = (row[j] + prev_row[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(row_len):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev_row[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(row_len):
                a = row[j - bpp] if j >= bpp else 0
                b = prev_row[j]
                c = prev_row[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"pdf: PNG filter type {ft} unsupported")
        out += row
        prev_row = bytes(row)
    if pos != len(data):
        raise ValueError("pdf: predictor data not a whole number of rows")
    return bytes(out)


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
    standard recovery-scanner mitigation). Also returns the byte
    offset of each surviving definition so :func:`_expand_objstm`
    can merge object-stream members with offset-wins semantics.
    Generation numbers are recorded too (``gens``) — the standard
    security handler keys per-object decryption on (num, gen)."""
    objects: dict[int, tuple[dict | None, bytes | None]] = {}
    offsets: dict[int, int] = {}
    gens: dict[int, int] = {}
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
        offsets[num] = m.start()
        gens[num] = int(m.group(2))
    return objects, offsets, gens


def _expand_objstm(objects, offsets) -> None:
    """Inflate every ``/Type /ObjStm`` container and merge its
    embedded objects in place (PDF 1.5+, round 10). The stream
    layout is ``N`` pairs of ``objnum offset`` integers, then the
    serialized objects starting at byte ``/First``. Merge rule:
    FILE-OFFSET-WINS — an embedded object adopts its container's
    byte offset, generalizing the scanner's later-definition-wins to
    incremental updates that move objects into or out of object
    streams (the newest definition in the file is live, wherever it
    lives). Embedded objects never carry streams (spec rule), so a
    conflict with a top-level stream object keeps whichever is
    later in the file."""
    containers = sorted(
        (
            (offsets.get(num, 0), num)
            for num, (d, s) in objects.items()
            if d is not None
            and s is not None
            and d.get("Type") == ("name", "ObjStm")
        ),
    )
    for c_off, c_num in containers:
        d, s = objects[c_num]
        n_tok = _resolve(objects, d.get("N")) or d.get("N")
        first_tok = _resolve(objects, d.get("First")) or d.get("First")
        if (
            n_tok is None or n_tok[0] != "num"
            or first_tok is None or first_tok[0] != "num"
        ):
            raise ValueError("pdf: object stream missing /N or /First")
        n, first = int(n_tok[1]), int(first_tok[1])
        body = _decode_stream(objects, d, s)
        lex = _Lexer(body)
        pairs: list[tuple[int, int]] = []
        for _ in range(n):
            a = lex.token()
            b = lex.token()
            if (
                a is None or b is None
                or a[0] != "num" or b[0] != "num"
            ):
                raise ValueError("pdf: bad object-stream header")
            pairs.append((int(a[1]), int(b[1])))
        for objnum, rel in pairs:
            if objnum == c_num:  # a container can't contain itself
                continue
            if offsets.get(objnum, -1) > c_off:
                continue  # a later top-level/container def wins
            olex = _Lexer(body, first + rel)
            try:
                t = olex.token()
            except ValueError:
                raise ValueError("pdf: bad object inside object stream")
            od = t[1] if t and t[0] == "dict" else None
            objects[objnum] = (od, None)
            offsets[objnum] = c_off


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


def _parms_dict(objects, parms_tok) -> dict:
    """``/DecodeParms`` token → plain ``{key: int}`` dict (refs and
    nested num tokens resolved); None/null → {}."""
    t = _resolve(objects, parms_tok) if parms_tok is not None else None
    if t is None or t[0] != "dict":
        return {}
    out = {}
    for k, v in t[1].items():
        v = _resolve(objects, v) or v
        if v is not None and v[0] == "num":
            out[k] = int(v[1])
    return out


def _decode_stream(objects, d: dict, stream: bytes) -> bytes:
    filt = d.get("Filter")
    if filt is None:
        return stream
    filt = _resolve(objects, filt) or filt
    names = []
    if filt[0] == "name":
        names = [filt[1]]
    elif filt[0] == "array":
        names = [t[1] for t in filt[1] if t[0] == "name"]
    parms_tok = d.get("DecodeParms", d.get("DP"))
    parms_list: list[dict] = []
    if parms_tok is not None:
        pt = _resolve(objects, parms_tok) or parms_tok
        if pt[0] == "array":
            parms_list = [_parms_dict(objects, t) for t in pt[1]]
        else:
            parms_list = [_parms_dict(objects, pt)]
    out = stream
    for i, name in enumerate(names):
        parms = parms_list[i] if i < len(parms_list) else {}
        if name in ("FlateDecode", "Fl"):
            try:
                out = zlib.decompress(out)
            except zlib.error as e:
                raise ValueError(f"pdf: bad Flate stream ({e})") from None
        elif name in ("LZWDecode", "LZW"):
            out = _lzw_decode(out, parms.get("EarlyChange", 1))
        elif name in ("ASCIIHexDecode", "AHx"):
            out = _asciihex_decode(out)
        elif name in ("ASCII85Decode", "A85"):
            out = _ascii85_decode(out)
        elif name in ("RunLengthDecode", "RL"):
            out = _runlength_decode(out)
        else:
            raise ValueError(f"pdf: filter /{name} unsupported")
        if parms.get("Predictor", 1) != 1:
            out = _predictor_undo(out, parms)
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


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """Parse a ``/ToUnicode`` CMap stream → ``(code → text, code
    byte length)``. Handles ``codespacerange`` (code width),
    ``bfchar`` (code → UTF-16BE), and ``bfrange`` with both the
    incremented-destination and explicit-array forms — the three
    constructs real ToUnicode CMaps use (ISO 32000 §9.10.3 /
    Adobe CMap spec). Unknown PostScript furniture is skipped by
    token."""
    lex = _Lexer(data)
    mapping: dict[int, str] = {}
    code_len = 2  # the overwhelmingly common width; codespace fixes it
    while True:
        try:
            t = lex.token()
        except ValueError:
            break
        if t is None:
            break
        if t[0] != "kw":
            continue
        if t[1] == "begincodespacerange":
            while True:
                lo = lex.token()
                if lo is None or lo[0] == "kw":  # endcodespacerange
                    break
                hi = lex.token()
                if lo[0] == "str":
                    code_len = max(1, len(lo[1]))
                if hi is None:
                    break
        elif t[1] == "beginbfchar":
            while True:
                src = lex.token()
                if src is None or src[0] == "kw":  # endbfchar
                    break
                dst = lex.token()
                if dst is None:
                    break
                if src[0] == "str" and dst[0] == "str":
                    code = int.from_bytes(src[1], "big")
                    mapping[code] = dst[1].decode(
                        "utf-16-be", errors="replace"
                    )
        elif t[1] == "beginbfrange":
            while True:
                lo = lex.token()
                if lo is None or lo[0] == "kw":  # endbfrange
                    break
                hi = lex.token()
                dst = lex.token()
                if hi is None or dst is None:
                    break
                if lo[0] != "str" or hi[0] != "str":
                    continue
                lo_i = int.from_bytes(lo[1], "big")
                hi_i = int.from_bytes(hi[1], "big")
                if hi_i - lo_i > 0x10000:  # malformed-range guard
                    continue
                if dst[0] == "str":
                    # incremented destination: the LAST UTF-16 code
                    # unit advances with the code (spec rule)
                    base = dst[1]
                    tail = int.from_bytes(base[-2:], "big") if len(
                        base
                    ) >= 2 else 0
                    for c in range(lo_i, hi_i + 1):
                        db = base[:-2] + (
                            (tail + c - lo_i) & 0xFFFF
                        ).to_bytes(2, "big") if len(base) >= 2 else base
                        mapping[c] = db.decode(
                            "utf-16-be", errors="replace"
                        )
                elif dst[0] == "array":
                    for c, el in zip(range(lo_i, hi_i + 1), dst[1]):
                        if el[0] == "str":
                            mapping[c] = el[1].decode(
                                "utf-16-be", errors="replace"
                            )
    return mapping, code_len


def _extract_page_text(content: bytes, font_maps=None) -> str:
    """Run the text operators of one content stream. Line breaks:
    ``T*``, ``'``, ``"``, and ``Td/TD/Tm`` that move DOWN the page;
    ``TJ`` kerning gaps beyond 250/1000 em become one space.
    ``font_maps``: resource font name → ``(code → text, code_len)``
    from each font's ``/ToUnicode`` CMap; the ``Tf`` operator tracks
    the active font and strings shown under a CMapped font decode
    code-by-code (unmapped codes → U+FFFD); fonts without a CMap
    keep the latin-1 / UTF-16BE-BOM default."""
    lex = _Lexer(content)
    stack: list = []
    out: list[str] = []
    line: list[str] = []
    in_text = False
    prev_tm_ty: float | None = None
    shown = False  # a show operator touched the CURRENT line
    any_shown = False  # a show operator occurred anywhere on the page

    def newline() -> None:
        # drop empty lines that precede the first text-show operator
        # (the ' / " pre-advance artifact) but keep every line a
        # show operator touched — an ("") Tj is real (empty) content
        nonlocal shown
        if line or shown or any_shown:
            out.append("".join(line))
        line.clear()
        shown = False

    def show(s: str) -> None:
        nonlocal shown, any_shown
        line.append(s)
        shown = True
        any_shown = True

    cur_font: str | None = None

    def to_text(b: bytes) -> str:
        fm = font_maps.get(cur_font) if font_maps else None
        if fm is None:
            return _pdf_str_to_text(b)
        mapping, clen = fm
        out = []
        for i in range(0, len(b) - len(b) % clen, clen):
            code = int.from_bytes(b[i : i + clen], "big")
            out.append(mapping.get(code, "�"))
        return "".join(out)

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
                show(to_text(stack[-1][1]))
            stack.clear()
        elif op == "'":
            newline()
            if stack and stack[-1][0] == "str":
                show(to_text(stack[-1][1]))
            stack.clear()
        elif op == '"':
            newline()
            if stack and stack[-1][0] == "str":
                show(to_text(stack[-1][1]))
            stack.clear()
        elif op == "TJ":
            if stack and stack[-1][0] == "array":
                for el in stack[-1][1]:
                    if el[0] == "str":
                        show(to_text(el[1]))
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
        elif op == "Tf":
            # operands: /FontName size — track the active font for
            # per-font ToUnicode decoding
            if len(stack) >= 2 and stack[-2][0] == "name":
                cur_font = stack[-2][1]
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
    if line or shown:
        newline()
    return "\n".join(out)


def _page_font_maps(objects, d: dict, cmap_cache: dict | None = None):
    """Resource font name → ``(code → text, code_len)`` for every
    font on the page that carries a ``/ToUnicode`` CMap (inherited
    ``/Resources`` resolve through the ``/Parent`` chain, the spec's
    page-tree attribute inheritance). Fonts without a CMap keep the
    default string decoding. ``cmap_cache`` (per document, keyed by
    the ToUnicode object number) makes a shared font's CMap decode
    once, not once per page."""
    res = d.get("Resources")
    seen = 0
    node = d
    while res is None and node is not None and seen < 8:
        parent = _resolve(objects, node.get("Parent"))
        node = parent[1] if parent is not None and parent[0] == "dict" \
            else None
        if node is not None:
            res = node.get("Resources")
        seen += 1
    res = _resolve(objects, res) if res is not None else None
    if res is None or res[0] != "dict":
        return {}
    fonts_tok = res[1].get("Font")
    fonts_tok = _resolve(objects, fonts_tok) if fonts_tok is not None \
        else None
    if fonts_tok is None or fonts_tok[0] != "dict":
        return {}
    out = {}
    for fname, ftok in fonts_tok[1].items():
        ft = _resolve(objects, ftok) if ftok is not None else None
        if ft is None or ft[0] != "dict":
            continue
        tu = ft[1].get("ToUnicode")
        if tu is None or tu[0] != "ref":
            continue
        tu_num = tu[1][0]
        if cmap_cache is not None and tu_num in cmap_cache:
            if cmap_cache[tu_num] is not None:
                out[fname] = cmap_cache[tu_num]
            continue
        entry = objects.get(tu_num)
        if entry is None or entry[1] is None:
            continue
        td, ts = entry
        try:
            data = _decode_stream(objects, td or {}, ts)
            parsed = _parse_tounicode(data)
        except ValueError:
            parsed = None  # a broken CMap degrades to default decoding
        if cmap_cache is not None:
            cmap_cache[tu_num] = parsed
        if parsed is not None:
            out[fname] = parsed
    return out


_TRAILER_RE = re.compile(rb"trailer\b")


def _plain(objects, tok, depth: int = 0):
    """Token tree → plain Python values (names → str, strings →
    bytes, numbers → int/float, true/false → bool, dict/array →
    dict/list), refs resolved — the shape
    :func:`pdfcrypt.open_standard_security` consumes."""
    if depth > 16 or tok is None:
        return None
    t = _resolve(objects, tok) or tok
    kind, v = t[0], t[1]
    if kind in ("name", "str", "num"):
        return v
    if kind == "kw":
        return {"true": True, "false": False}.get(v)
    if kind == "dict":
        return {k: _plain(objects, x, depth + 1) for k, x in v.items()}
    if kind == "array":
        return [_plain(objects, x, depth + 1) for x in v]
    return None


def _find_encryption(raw: bytes, objects, offsets=None):
    """Locate the live ``/Encrypt`` dictionary: a TRAILER dictionary
    or an xref-stream (``/Type /XRef``) dictionary — the two places
    the spec puts it (a lenient scan over all of them, LAST trailer
    wins, matching incremental-update semantics). Returns
    ``(plain_encrypt_dict, id0_bytes)`` or ``None``. Replaces the
    round-9 blunt ``b"/Encrypt" in raw`` scan, which
    false-quarantined documents whose page TEXT merely mentions
    /Encrypt."""
    candidates: list[tuple[int, dict]] = []
    for m in _TRAILER_RE.finditer(raw):
        lex = _Lexer(raw, m.end())
        try:
            t = lex.token()
        except ValueError:
            continue
        if t is not None and t[0] == "dict":
            # the token 'trailer' can occur inside an uncompressed
            # content stream or literal string; only dicts carrying
            # trailer-shaped keys may participate in last-wins
            # (review finding: a spurious late match could otherwise
            # set or clear /Encrypt)
            d = t[1]
            if any(k in d for k in ("Size", "Root", "Prev", "XRefStm")):
                candidates.append((m.start(), d))
    offsets = offsets or {}
    for num, (d, _s) in objects.items():
        if d and d.get("Type") == ("name", "XRef"):
            candidates.append((offsets.get(num, 0), d))
    # FILE-ORDER last-wins, including CLEARING: a later full trailer
    # (one carrying /Root or /Size) WITHOUT /Encrypt supersedes an
    # earlier /Encrypt — the decrypted-and-resaved incremental-update
    # shape (review finding: the old any-order scan kept stale keys)
    enc_tok = None
    id_tok = None
    for _pos, d in sorted(candidates, key=lambda c: c[0]):
        if "ID" in d:
            id_tok = d["ID"]
        if "Encrypt" in d:
            enc_tok = d["Encrypt"]
        elif "Root" in d or "Size" in d:
            enc_tok = None
    if enc_tok is None:
        return None
    enc = _plain(objects, enc_tok)
    if not isinstance(enc, dict):
        raise ValueError("pdf: encrypted (malformed /Encrypt)")
    id0 = b""
    ids = _plain(objects, id_tok) if id_tok is not None else None
    if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
        id0 = ids[0]
    return enc, id0


def extract_pdf_text(raw: bytes) -> dict:
    """Extract text from a PDF. Returns ``{"n_pages": int,
    "pages": [str, ...], "text": str}`` (pages joined by form-feed).
    Handles classic xref-table files AND PDF 1.5+ object-stream /
    xref-stream files (``/ObjStm`` containers are inflated and
    merged, see :func:`_expand_objstm`; xref streams need no
    parsing — the recovery scan already locates every top-level
    object). Files encrypted under the STANDARD security handler
    with an empty user or owner password decrypt transparently
    (round 10, :mod:`.pdfcrypt`). Raises ``ValueError`` naming the
    unsupported feature for password-protected files, non-Standard
    handlers, and unknown filters — the quarantine contract of the
    codec family (the message prefix ``pdf: encrypted`` vs ``pdf:
    <other>`` is the typed reason :func:`pdf_text_features`
    surfaces per row)."""
    if raw[:5] != b"%PDF-":
        raise ValueError("pdf: missing %PDF header")
    objects, offsets, gens = _scan_objects(raw)
    if not objects:
        raise ValueError("pdf: no objects found")
    found = _find_encryption(raw, objects, offsets)
    if found is not None:
        # standard security handler, empty password (round 10):
        # verify, derive the file key, and decrypt every top-level
        # stream IN PLACE before ObjStm expansion / filter decoding
        # (the spec order: decryption precedes filters). XRef
        # streams are never encrypted (spec rule — the reader must
        # parse them before it knows the key).
        from .pdfcrypt import open_standard_security

        enc_dict, id0 = found
        handler = open_standard_security(enc_dict, id0)
        for num, (d, s) in list(objects.items()):
            if s is None:
                continue
            if d and d.get("Type") == ("name", "XRef"):
                continue
            objects[num] = (
                d, handler.decrypt_stream(num, gens.get(num, 0), s)
            )
    _expand_objstm(objects, offsets)
    page_nums = _page_content_objs(objects)
    if not page_nums:
        raise ValueError("pdf: no pages found")
    cmap_cache: dict = {}
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
        fmaps = _page_font_maps(objects, d or {}, cmap_cache)
        pages.append(_extract_page_text(b"\n".join(parts), fmaps))
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


def _content_stream(text: str, codes: dict | None = None) -> bytes:
    """``codes``: char → 2-byte CID code (the cid_font path) — lines
    become hex strings of codes instead of literal strings."""
    body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
    for j, ln in enumerate(text.split("\n")):
        if j:
            body += b"0 -14 Td\n"
        if codes is None:
            body += b"(" + _pdf_escape(ln) + b") Tj\n"
        else:
            body += (
                b"<" + "".join(f"{codes[ch]:04x}" for ch in ln).encode()
                + b"> Tj\n"
            )
    body += b"ET"
    return bytes(body)


def _build_cid_font(pages: list[str]) -> tuple[dict, bytes, bytes]:
    """(char → code, ToUnicode CMap stream bytes, Type0 font dict
    bytes with ``%d`` placeholder for the ToUnicode object number).
    Codes are a per-document table (1..N over the distinct chars) so
    a reader that ignored the CMap would produce garbage — the
    fixture BITES."""
    chars = sorted({ch for p in pages for ln in p.split("\n") for ch in ln})
    codes = {ch: i + 1 for i, ch in enumerate(chars)}
    if len(codes) > 0xFFFE:
        raise ValueError("pdf: cid fixture limited to 65534 chars")
    cmap = bytearray(
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
        b"begincmap\n/CMapName /Synth-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
    )
    items = sorted(codes.items(), key=lambda kv: kv[1])
    for i in range(0, len(items), 100):  # spec: <=100 per block
        block = items[i : i + 100]
        cmap += b"%d beginbfchar\n" % len(block)
        for ch, code in block:
            dst = ch.encode("utf-16-be").hex().encode()
            cmap += b"<%04x> <" % code + dst + b">\n"
        cmap += b"endbfchar\n"
    cmap += b"endcmap\nCMapName currentdict /CMap defineresource pop\n" \
        b"end\nend"
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
        b"/Encoding /Identity-H /DescendantFonts [<< /Type /Font "
        b"/Subtype /CIDFontType2 /BaseFont /SynthCID /CIDSystemInfo "
        b"<< /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> "
        b">>] /ToUnicode %d 0 R >>"
    )
    return codes, bytes(cmap), font


_FILTERS = {
    "flate": (zlib.compress, b"/FlateDecode"),
    "lzw": (_lzw_encode, b"/LZWDecode"),
}


def encode_pdf_text(
    pages: list[str],
    compress: bool = True,
    layout: str = "classic",
    filter_name: str = "flate",
    encrypt: str | None = None,
    cid_font: bool = False,
) -> bytes:
    """Write a PDF: one Helvetica content stream per page (``Tj``
    per line, ``Td`` line advance) — fixtures any external viewer
    opens, and the roundtrip fixture family for
    :func:`extract_pdf_text`.

    ``layout="classic"`` (default) is PDF 1.4 with a real xref
    TABLE; ``layout="objstm"`` is PDF 1.5 with every document
    dictionary (catalog, pages node, font, page dicts) packed in a
    compressed ``/ObjStm`` and a cross-reference STREAM
    (``/Type /XRef``, ``/W [1 4 2]``, PNG-Up-predicted Flate) —
    content streams stay top-level per the spec rule that streams
    cannot live inside object streams. ``filter_name`` ("flate" or
    "lzw") selects the compression filter for content streams (and
    the ObjStm body) when ``compress`` is true.

    ``encrypt`` (round 10): ``None`` | ``"rc4-40"`` (R2) | ``"rc4"``
    (R3 128-bit) | ``"aes"`` (R4 /AESV2) | ``"aes256"`` (R6 /AESV3)
    — writes a standard-security-handler file with EMPTY user+owner
    passwords (the owner-locked shape), every stream encrypted
    except the xref stream, ``/Encrypt`` + ``/ID`` in the trailer /
    xref-stream dictionary. Fixture half of
    :mod:`.pdfcrypt` — deterministic (salts/IVs derive from the
    document ID, which derives from the page text).

    ``cid_font`` (round 10 s2): write the text through a ``/Type0``
    CID font — content strings become 2-byte codes from a
    per-document table (1..N over the distinct chars) and a
    ``/ToUnicode`` CMap stream maps codes back to UTF-16BE. A reader
    that ignored the CMap would extract garbage, so the fixture
    pins the embedded-font decode path real corpora need."""
    if layout not in ("classic", "objstm"):
        raise ValueError(f"pdf: unknown layout {layout!r}")
    enc_fn, filt_name = _FILTERS[filter_name]

    crypt = None
    enc_trailer = b""
    if encrypt is not None:
        from .pdfcrypt import make_encryption

        id0 = hashlib.md5(
            "\f".join(pages).encode("utf-8", "replace")
        ).digest()
        enc_dict_bytes, crypt = make_encryption(encrypt, id0)
        idhex = b"<" + id0.hex().encode() + b">"
        enc_trailer = (
            b" /Encrypt " + enc_dict_bytes
            + b" /ID [" + idhex + idhex + b"]"
        )

    def stream_obj(data: bytes, extra: bytes = b"", num: int = 0) -> bytes:
        filt = b""
        if compress:
            data = enc_fn(data)
            filt = b" /Filter " + filt_name
        if crypt is not None:
            # spec order: filters encode, THEN encryption (readers
            # decrypt before filter decoding)
            data = crypt.encrypt_stream(num, 0, data)
        head = b"<< /Length %d%s%s >>" % (len(data), filt, extra)
        return head + b"\nstream\n" + data + b"\nendstream"

    n_pages = len(pages)
    codes = None
    cid_cmap = b""
    cid_font_fmt = b""
    if cid_font:
        codes, cid_cmap, cid_font_fmt = _build_cid_font(pages)
    if layout == "classic":
        objs: list[bytes] = []  # bodies, object number = index + 1
        # 1: catalog, 2: pages node, 3: font; per page: page, stream;
        # cid_font adds the ToUnicode CMap stream as the LAST object
        page_obj_nums = [4 + 2 * i for i in range(n_pages)]
        tounicode_num = 4 + 2 * n_pages
        kids = b" ".join(b"%d 0 R" % n for n in page_obj_nums)
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
        )
        objs.append(
            cid_font_fmt % tounicode_num if cid_font else
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        for i, text in enumerate(pages):
            stream_num = page_obj_nums[i] + 1
            objs.append(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> "
                b"/Contents %d 0 R >>" % stream_num
            )
            objs.append(
                stream_obj(_content_stream(text, codes), num=stream_num)
            )
        if cid_font:
            objs.append(stream_obj(cid_cmap, num=tounicode_num))

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
            b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, enc_trailer, xref_pos)
        )
        return bytes(out)

    # --- objstm layout (PDF 1.5) ---
    # numbering: 1 catalog, 2 pages node, 3 font, 4..3+n page dicts
    # (all INSIDE the ObjStm); 4+n..3+2n content streams (top-level);
    # [cid_font: 4+2n the ToUnicode CMap stream (top-level — streams
    # cannot live in an ObjStm)]; then the ObjStm container; then
    # the xref stream
    page_nums = [4 + i for i in range(n_pages)]
    content_nums = [4 + n_pages + i for i in range(n_pages)]
    tounicode_num = 4 + 2 * n_pages
    objstm_num = tounicode_num + (1 if cid_font else 0)
    xref_num = objstm_num + 1

    packed: list[tuple[int, bytes]] = []
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    packed.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    packed.append(
        (2, b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages)
    )
    packed.append(
        (
            3,
            cid_font_fmt % tounicode_num if cid_font else
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        )
    )
    for pnum, cnum in zip(page_nums, content_nums):
        packed.append(
            (
                pnum,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> "
                b"/Contents %d 0 R >>" % cnum,
            )
        )
    stm_body = bytearray()
    header = bytearray()
    for onum, obody in packed:
        header += b"%d %d " % (onum, len(stm_body))
        stm_body += obody + b"\n"
    objstm_extra = b" /Type /ObjStm /N %d /First %d" % (
        len(packed), len(header),
    )
    objstm_obj = stream_obj(
        bytes(header) + bytes(stm_body), objstm_extra, num=objstm_num
    )

    out = bytearray(b"%PDF-1.5\n%\xc2\xb5\xc2\xb6\n")
    offsets_by_num: dict[int, int] = {}
    for cnum, text in zip(content_nums, pages):
        offsets_by_num[cnum] = len(out)
        out += b"%d 0 obj\n" % cnum + stream_obj(
            _content_stream(text, codes), num=cnum
        ) + b"\nendobj\n"
    if cid_font:
        offsets_by_num[tounicode_num] = len(out)
        out += b"%d 0 obj\n" % tounicode_num + stream_obj(
            cid_cmap, num=tounicode_num
        ) + b"\nendobj\n"
    offsets_by_num[objstm_num] = len(out)
    out += b"%d 0 obj\n" % objstm_num + objstm_obj + b"\nendobj\n"
    xref_pos = len(out)
    offsets_by_num[xref_num] = xref_pos

    # xref stream entries, W = [1 4 2]: object 0 free, packed
    # objects type 2 (container, index), top-level type 1 (offset)
    size = xref_num + 1
    rows: list[bytes] = []
    for num in range(size):
        if num == 0:
            rows.append(struct.pack(">B I H", 0, 0, 0xFFFF))
        elif num <= 3 + n_pages:
            idx = next(i for i, (o, _b) in enumerate(packed) if o == num)
            rows.append(struct.pack(">B I H", 2, objstm_num, idx))
        else:
            rows.append(struct.pack(">B I H", 1, offsets_by_num[num], 0))
    row_len = 7
    pred = bytearray()
    prev = bytes(row_len)
    for r in rows:  # PNG Up predictor, as real writers emit
        pred.append(2)
        pred += bytes((r[j] - prev[j]) & 0xFF for j in range(row_len))
        prev = r
    xdata = zlib.compress(bytes(pred))
    out += b"%d 0 obj\n" % xref_num
    out += (
        b"<< /Type /XRef /Size %d /Root 1 0 R%s /W [1 4 2] "
        b"/Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns %d >> /Length %d >>"
        % (size, enc_trailer, row_len, len(xdata))
    )
    out += b"\nstream\n" + xdata + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


# ---------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------


def synthesize_pdf_from_text(
    df, text="text", id_col="doc_id", pages_mod=3, layout="mixed"
):
    """Deterministic synthetic PDF corpus — the document analog of
    ``synthesize_image_from_text``: per doc a REAL multi-page PDF
    (``1 + len(text) % pages_mod`` pages; the text splits across
    pages by word round-robin), so the extraction plumbing gets a
    value-level oracle without shipping binary fixtures. Returns
    ``(doc_id, n_pages, media binary)``.

    ``layout``: "classic" (PDF 1.4 xref table), "objstm" (PDF 1.5
    object + xref streams), or "mixed" (default, round 10) — the
    corpus alternates deterministically on ``doc_id``: layout on
    ``% 2`` (classic / objstm), filter on ``% 4`` (Flate / LZW), and
    ENCRYPTION on ``% 8`` (none / RC4-40 / RC4-128 / AES-128 /
    AES-256, 5 of 8 docs encrypted with empty passwords — the
    owner-locked shape), so ONE oracle gates every reader path
    including the standard security handler (the extracted text is
    layout/filter/encryption-invariant)."""
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
                if layout == "mixed":
                    lay = "classic" if did % 2 == 0 else "objstm"
                    filt = "flate" if did % 4 < 2 else "lzw"
                    enc = (
                        None, "rc4", "aes", None,
                        "aes256", None, "rc4-40", "aes",
                    )[did % 8]
                    # alternate 8-doc blocks of simple vs CID/Type0
                    # fonts: over a 16-doc period every (layout,
                    # filter, cipher) combo appears with BOTH font
                    # shapes, so the one oracle also pins the
                    # ToUnicode CMap decode path
                    cid = (did // 8) % 2 == 1
                else:
                    lay, filt, enc, cid = layout, "flate", None, False
                ids.append(did)
                npg.append(n)
                medias.append(
                    encode_pdf_text(
                        pages, layout=lay, filter_name=filt,
                        encrypt=enc, cid_font=cid,
                    )
                )
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
                    # typed quarantine reason (round 10): the prefix
                    # distinguishes encrypted / unsupported-feature /
                    # malformed at a glance, detail preserved after
                    msg = str(e)
                    if "encrypted" in msg:
                        kind = "encrypted"
                    elif "unsupported" in msg:
                        kind = "unsupported"
                    else:
                        kind = "malformed"
                    rows.append(
                        (did, None, None, None, False,
                         f"{kind}: {type(e).__name__}: {msg}")
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
