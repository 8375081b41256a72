"""Zero-dependency baseline TIFF codec (round 10).

Completes the still-image container family (PNG/JPEG/GIF/BMP/PNM):
TIFF is the scanned-document / scientific-imaging format a real
training corpus meets next to PDF. Same posture as the sibling
codecs: a correctness-first reference kernel with a fixture-writing
encoder, strict quarantine for what it does not understand, wired
into :func:`..multimodal.decode_image` behind magic-byte routing.

Scope:

- **Reader** (:func:`decode_tiff`): classic TIFF 6.0 baseline,
  both byte orders (II/MM), 8-bit grayscale (photometric 0/1 —
  WhiteIsZero inverts) and RGB/RGBA (photometric 2, ExtraSamples
  alpha), multi-strip, chunky planar config, compressions 1 (none),
  5 (LZW — the MSB-first 9→12-bit code stream shared with
  ``/LZWDecode``; TIFF always uses EarlyChange=1) and 32773
  (PackBits), horizontal differencing predictor (317 = 2). The
  FIRST IFD decodes; ``n_pages`` reports the IFD-chain length
  (multi-page TIFFs are common for scanned docs). Everything else
  (tiled, planar=2, 16-bit, palette, JPEG-in-TIFF, CCITT fax)
  raises ``ValueError`` naming the feature.
- **Writers**: :func:`encode_tiff` (single page, single or multi
  strip, 8-bit gray/RGB/RGBA, compression none/LZW/PackBits,
  optional predictor 2, either byte order) and
  :func:`encode_tiff_multipage` (chained IFDs — the scanned-document
  fixture shape) — files any external viewer opens.

Reference anchor: no analog in the reference (datasplash has no
image surface); north-star multimodal extension (BASELINE.json).
"""

from __future__ import annotations

import struct

from .pdf import _lzw_decode, _lzw_encode

#: tag ids the reader understands
_TAGS = {
    256: "width",
    257: "height",
    258: "bits_per_sample",
    259: "compression",
    262: "photometric",
    273: "strip_offsets",
    277: "samples_per_pixel",
    278: "rows_per_strip",
    279: "strip_byte_counts",
    284: "planar_config",
    317: "predictor",
    338: "extra_samples",
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits: n in 0..127 → copy n+1 literals; 129..255 →
    repeat next byte 257-n times; 128 → no-op (NOT end-of-data —
    that is the PDF RunLength difference)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c == 128:
            continue
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("tiff: truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        else:
            if i >= n:
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (fixture half): maximal runs, literal spans."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        start = i
        while i < n and i - start < 128:
            r2 = 1
            while i + r2 < n and data[i + r2] == data[i] and r2 < 2:
                r2 += 1
            if r2 >= 2 and i > start:
                break
            i += 1
        out += bytes([i - start - 1]) + data[start:i]
    return bytes(out)


def _read_ifd(raw: bytes, off: int, e: str):
    """One IFD at ``off``: ``({tag_name: value_or_tuple}, next_off)``."""
    if off + 2 > len(raw):
        raise ValueError("tiff: truncated IFD")
    (count,) = struct.unpack(e + "H", raw[off : off + 2])
    pos = off + 2
    if pos + 12 * count + 4 > len(raw):
        raise ValueError("tiff: truncated IFD")
    tags: dict = {}
    for _ in range(count):
        tag, typ, n = struct.unpack(e + "HHI", raw[pos : pos + 8])
        size = _TYPE_SIZE.get(typ, 1) * n
        if size <= 4:
            body = raw[pos + 8 : pos + 8 + size]
        else:
            (voff,) = struct.unpack(e + "I", raw[pos + 8 : pos + 12])
            if voff + size > len(raw):
                raise ValueError("tiff: tag value outside file")
            body = raw[voff : voff + size]
        pos += 12
        name = _TAGS.get(tag)
        if name is None:
            continue
        if typ == 3:
            vals = struct.unpack(e + "H" * n, body[: 2 * n])
        elif typ == 4:
            vals = struct.unpack(e + "I" * n, body[: 4 * n])
        elif typ in (1, 6, 7):
            vals = tuple(body[:n])
        else:  # rationals etc. — none of our tags use them
            continue
        tags[name] = vals if n > 1 else vals[0]
    (nxt,) = struct.unpack(e + "I", raw[pos : pos + 4])
    return tags, nxt


def decode_tiff(raw: bytes) -> dict:
    """Decode the FIRST page of a TIFF into the
    :func:`..multimodal.decode_image` dict shape; ``n_pages``
    reports the IFD-chain length."""
    import numpy as np

    if len(raw) < 8 or raw[:2] not in (b"II", b"MM"):
        raise ValueError("tiff: missing II/MM byte-order mark")
    e = "<" if raw[:2] == b"II" else ">"
    (magic,) = struct.unpack(e + "H", raw[2:4])
    if magic != 42:
        raise ValueError("tiff: bad magic (not classic TIFF)")
    (ifd_off,) = struct.unpack(e + "I", raw[4:8])
    tags, nxt = _read_ifd(raw, ifd_off, e)
    n_pages = 1
    seen = {ifd_off}
    walk = nxt
    while walk and walk not in seen and n_pages < 10000:
        seen.add(walk)
        _t2, walk2 = _read_ifd(raw, walk, e)
        n_pages += 1
        walk = walk2

    w = tags.get("width")
    h = tags.get("height")
    if not w or not h:
        raise ValueError("tiff: missing dimensions")
    spp = tags.get("samples_per_pixel", 1)
    bps = tags.get("bits_per_sample", 8)
    if isinstance(bps, tuple):
        if any(b != bps[0] for b in bps):
            raise ValueError("tiff: mixed bits-per-sample unsupported")
        bps = bps[0]
    if bps != 8:
        raise ValueError(f"tiff: {bps}-bit samples unsupported")
    if tags.get("planar_config", 1) != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    comp = tags.get("compression", 1)
    if comp not in (1, 5, 32773):
        raise ValueError(f"tiff: compression {comp} unsupported")
    photo = tags.get("photometric", 1)
    if photo not in (0, 1, 2):
        raise ValueError(f"tiff: photometric {photo} unsupported")
    if photo == 2 and spp not in (3, 4):
        raise ValueError("tiff: RGB needs 3 or 4 samples per pixel")
    if photo in (0, 1) and spp != 1:
        raise ValueError("tiff: grayscale needs 1 sample per pixel")

    offs = tags.get("strip_offsets")
    cnts = tags.get("strip_byte_counts")
    if offs is None or cnts is None:
        raise ValueError("tiff: missing strip offsets/counts")
    if not isinstance(offs, tuple):
        offs = (offs,)
    if not isinstance(cnts, tuple):
        cnts = (cnts,)
    rps = tags.get("rows_per_strip", h)
    row_bytes = w * spp
    out = bytearray()
    rows_done = 0
    for si, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(raw):
            raise ValueError("tiff: strip outside file")
        seg = raw[o : o + c]
        if comp == 5:
            seg = _lzw_decode(seg, 1)  # TIFF LZW is EarlyChange=1
        elif comp == 32773:
            seg = _packbits_decode(seg)
        strip_rows = min(rps, h - rows_done)
        if len(seg) < strip_rows * row_bytes:
            raise ValueError("tiff: truncated strip data")
        out += seg[: strip_rows * row_bytes]
        rows_done += strip_rows
    if rows_done < h:
        raise ValueError("tiff: strips cover fewer rows than height")
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp)
    if tags.get("predictor", 1) == 2:  # horizontal differencing
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    elif tags.get("predictor", 1) not in (1, 2):
        raise ValueError(
            f"tiff: predictor {tags['predictor']} unsupported"
        )
    if photo == 0:  # WhiteIsZero
        px = (255 - px.astype(np.int64)).astype(np.uint8)
    if spp == 1:
        mode, ch = "L", 1
    elif spp == 3:
        mode, ch = "RGB", 3
    else:
        mode, ch = "RGBA", 4
    return {
        "width": int(w), "height": int(h), "channels": ch,
        "mode": mode, "bit_depth": 8,
        "pixels": np.ascontiguousarray(px),
        "n_pages": n_pages,
    }


def _encode_page(
    px,
    compression: str,
    predictor: bool,
    e: str,
    base: int,
    rows_per_strip: int | None,
) -> tuple[bytes, int]:
    """One page laid out as ``[IFD | overflow values | strip data]``
    with all internal pointers ABSOLUTE relative to ``base`` (the
    block's position in the file). Returns ``(blob, next_ifd_field
    _offset_within_blob)`` so a multipage writer can chain pages by
    patching the next-IFD pointer."""
    import struct as _s

    import numpy as np

    h, w, spp = px.shape
    photo = 1 if spp == 1 else 2
    comp_code = {"none": 1, "lzw": 5, "packbits": 32773}[compression]

    body = px
    if predictor:
        d = px.astype(np.int64)
        body = np.concatenate(
            [d[:, :1], (d[:, 1:] - d[:, :-1]) & 0xFF], axis=1
        ).astype(np.uint8)

    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        seg = body[y0 : y0 + rps].tobytes()
        if compression == "lzw":
            seg = _lzw_encode(seg, 1)
        elif compression == "packbits":
            seg = _packbits_encode(seg)
        strips.append(seg)

    def short(v):
        return _s.pack(e + "HH", v, 0)

    n_strips = len(strips)
    entries = []
    entries.append((256, 3, 1, short(w)))
    entries.append((257, 3, 1, short(h)))
    if spp == 1:
        entries.append((258, 3, 1, short(8)))
    else:
        entries.append((258, 3, spp, _s.pack(e + "H" * spp, *([8] * spp))))
    entries.append((259, 3, 1, short(comp_code)))
    entries.append((262, 3, 1, short(photo)))
    entries.append((273, 4, n_strips, b"STRIP_OFFS"))
    entries.append((277, 3, 1, short(spp)))
    entries.append((278, 3, 1, short(min(rps, h))))
    entries.append(
        (279, 4, n_strips,
         _s.pack(e + "I" * n_strips, *[len(s2) for s2 in strips]))
    )
    if predictor:
        entries.append((317, 3, 1, short(2)))
    if spp == 4:
        entries.append((338, 3, 1, short(2)))  # unassociated alpha

    ifd_size = 2 + 12 * len(entries) + 4
    next_field_off = 2 + 12 * len(entries)
    overflow_off = base + ifd_size
    overflow = bytearray()
    fixed: list[bytes] = []
    strip_off_entry = None
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if val == b"STRIP_OFFS":
            strip_off_entry = i
            fixed.append(b"")
            continue
        if len(val) <= 4:
            fixed.append(val.ljust(4, b"\x00"))
        else:
            fixed.append(_s.pack(e + "I", overflow_off + len(overflow)))
            overflow += val
    offs_bytes_len = 4 * n_strips
    offs_pos = overflow_off + len(overflow)
    data_start = offs_pos + (offs_bytes_len if offs_bytes_len > 4 else 0)
    strip_offs = []
    cur = data_start
    for s2 in strips:
        strip_offs.append(cur)
        cur += len(s2)
    packed_offs = _s.pack(e + "I" * n_strips, *strip_offs)
    if offs_bytes_len > 4:
        fixed[strip_off_entry] = _s.pack(e + "I", offs_pos)
        overflow += packed_offs
    else:
        fixed[strip_off_entry] = packed_offs.ljust(4, b"\x00")

    blob = bytearray()
    blob += _s.pack(e + "H", len(entries))
    for (tag, typ, cnt, _v), fx in zip(entries, fixed):
        blob += _s.pack(e + "HHI", tag, typ, cnt) + fx
    blob += _s.pack(e + "I", 0)  # next IFD (patched by multipage)
    blob += overflow
    for s2 in strips:
        blob += s2
    return bytes(blob), next_field_off


def _as_page_array(pixels):
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] not in (1, 3, 4):
        raise ValueError("tiff encode: 1, 3, or 4 channels")
    return px


def encode_tiff(
    pixels,
    compression: str = "none",
    predictor: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Baseline TIFF writer (fixture half): 8-bit gray / RGB / RGBA,
    single or multi strip, ``compression`` in {"none", "lzw",
    "packbits"}, optional horizontal-differencing predictor, either
    byte order."""
    import struct as _s

    e = ">" if big_endian else "<"
    blob, _nf = _encode_page(
        _as_page_array(pixels), compression, predictor, e, 8,
        rows_per_strip,
    )
    out = bytearray()
    out += b"MM" if big_endian else b"II"
    out += _s.pack(e + "H", 42)
    out += _s.pack(e + "I", 8)
    out += blob
    return bytes(out)


def encode_tiff_multipage(
    pages,
    compression: str = "none",
    predictor: bool = False,
    big_endian: bool = False,
) -> bytes:
    """Multi-page TIFF writer (the scanned-document fixture shape):
    one IFD per page, chained by next-IFD pointers; every page
    carries its own strips. :func:`decode_tiff` decodes page one and
    reports the chain length in ``n_pages``."""
    import struct as _s

    if not pages:
        raise ValueError("tiff encode: no pages")
    e = ">" if big_endian else "<"
    out = bytearray()
    out += b"MM" if big_endian else b"II"
    out += _s.pack(e + "H", 42)
    out += _s.pack(e + "I", 8)
    patch_at = None
    for page in pages:
        base = len(out)
        if patch_at is not None:
            out[patch_at : patch_at + 4] = _s.pack(e + "I", base)
        blob, nf = _encode_page(
            _as_page_array(page), compression, predictor, e, base, None
        )
        patch_at = base + nf
        out += blob
    return bytes(out)
