"""Zero-dependency GIF and BMP codecs (round 9).

Closes the detected-but-undecodable gap: :func:`..multimodal.
sniff_media_type` routes ``gif`` and ``bmp`` magics, and until now
:func:`..multimodal.decode_image` quarantined them. Both formats are
fully public specs (GIF87a/89a, Windows BITMAPINFOHEADER); like the
PNG/JPEG/WAV codecs these are correctness-first reference kernels —
numpy-vectorized where the data is bulk (palette expansion, BMP row
assembly), plain Python for the GIF LZW entropy loop (the documented
slow path; a SIMD codec library plugs into the same ``decode_image``
kernel slot).

Scope:

- GIF: 87a + 89a, global/local color tables, interlaced and
  non-interlaced, LZW with variable code width / deferred clear,
  GCE transparency (transparent index → RGBA). ``decode_gif``
  returns the FIRST frame (the thumbnailer convention) plus the
  frame count; ``decode_gif_frames`` (round 10) composites the FULL
  animation — sub-rectangle frames at offsets, per-frame
  transparency, disposal methods 0-3 — and returns sampled
  canvas-sized RGBA composites, routed through
  :func:`..multimodal.video_frame_features` next to MJPEG.
  Encoders: ``encode_gif`` (single-frame, ≤256-color, optional
  interlace) and ``encode_gif_animation`` (per-frame local tables,
  GCE disposal/transparency, NETSCAPE loop) — the fixture
  generators.
- BMP: BITMAPINFOHEADER (and the V4/V5 supersets — same prefix
  layout), uncompressed BI_RGB at 8 (palette), 24 (BGR), and 32
  (BGRA) bits, bottom-up and top-down rows, 4-byte row padding.
  BI_RLE/BI_BITFIELDS and 1/4-bit raise ``ValueError`` naming the
  feature (quarantine contract). Encoder: 24-bit BI_RGB and 8-bit
  grayscale-palette — the fixture generator.

Reference anchor: no analog in the reference (datasplash has no
image surface); north-star multimodal extension (BASELINE.json).
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW: LSB-first bitstream, variable code width
    starting at ``min_code_size + 1``, clear/EOI codes, dictionary
    capped at 4096 with deferred clear. Returns exactly ``n_pixels``
    indices (trailing garbage after EOI is ignored; running short
    raises — the truncation signal)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [[i] for i in range(clear)] + [[], []]
    table = list(base)
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    bits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while bits < width:
            if pos >= n:
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("gif: invalid initial LZW code")
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the cScSc special case
        else:
            raise ValueError("gif: invalid LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("gif: LZW stream ended early")
    return out[:n_pixels]


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """GIF-variant LZW encoder (fixture half): emits an initial
    clear, grows the code width in lockstep with the decoder, resets
    on a full dictionary, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: reset, like most encoders
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        buf = (idx,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


#: interlace passes: (row offset, row step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_header(raw: bytes):
    """Signature + logical screen descriptor + global color table.
    Returns ``(screen_w, screen_h, gct, pos)``."""
    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: missing GIF87a/89a signature")
    if len(raw) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", raw[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("gif: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    return sw, sh, gct, pos


def _iter_gif_frames(raw: bytes, gct, pos: int):
    """Block walk from ``pos``: yields one dict per image descriptor
    with its LAZY pixel payload — ``decode()`` runs the LZW +
    de-interlace + index-bounds checks only when called, so callers
    that need just frame COUNTS (or the first frame) skip the
    entropy work for the rest. The preceding graphic-control
    extension's disposal method and transparent index ride along
    (one GCE governs exactly the next image, per 89a)."""
    import numpy as np

    disposal = 0
    transparent = None
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos + 2 > len(raw):
                raise ValueError("gif: truncated extension")
            label = raw[pos + 1]
            pos += 2
            # graphic control: disposal + transparency for the NEXT
            # image
            if label == 0xF9 and pos < len(raw) and raw[pos] >= 4:
                if pos + 5 > len(raw):
                    raise ValueError("gif: truncated extension")
                gce_flags = raw[pos + 1]
                disposal = (gce_flags >> 2) & 7
                transparent = raw[pos + 4] if (gce_flags & 1) else None
            while pos < len(raw) and raw[pos] != 0:  # skip sub-blocks
                pos += 1 + raw[pos]
            pos += 1  # block terminator
        elif b == 0x2C:  # image descriptor
            start = pos
            if pos + 10 > len(raw):
                raise ValueError("gif: truncated image descriptor")
            left, top, iw, ih, iflags = struct.unpack(
                "<HHHHB", raw[pos + 1 : pos + 10]
            )
            pos += 10
            lct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                lct = np.frombuffer(
                    raw[pos : pos + 3 * n], dtype=np.uint8
                )
                if lct.size != 3 * n:
                    raise ValueError("gif: truncated local color table")
                lct = lct.reshape(n, 3)
                pos += 3 * n
            if pos >= len(raw):
                raise ValueError("gif: truncated image data")
            min_code = raw[pos]
            pos += 1
            parts = []
            while True:
                if pos >= len(raw):
                    raise ValueError("gif: truncated image data")
                ln = raw[pos]
                pos += 1
                if ln == 0:
                    break
                parts.append(raw[pos : pos + ln])
                if len(parts[-1]) != ln:
                    raise ValueError("gif: truncated image data")
                pos += ln

            def decode(
                lct=lct, min_code=min_code, parts=parts,
                iw=iw, ih=ih, iflags=iflags,
            ):
                if lct is None:
                    raise ValueError("gif: image with no color table")
                if not (1 <= min_code <= 11):
                    raise ValueError("gif: invalid LZW minimum code size")
                idx = _lzw_decode(min_code, b"".join(parts), iw * ih)
                grid = np.asarray(idx, dtype=np.int64).reshape(ih, iw)
                if iflags & 0x40:  # interlaced: reorder rows
                    de = np.empty_like(grid)
                    src = 0
                    for off, step in _GIF_INTERLACE:
                        for r in range(off, ih, step):
                            de[r] = grid[src]
                            src += 1
                    grid = de
                if int(grid.max(initial=0)) >= len(lct):
                    raise ValueError(
                        "gif: pixel index outside color table"
                    )
                return grid

            yield {
                "left": left, "top": top, "width": iw, "height": ih,
                "lct": lct, "disposal": disposal,
                "transparent": transparent, "decode": decode,
                "byte_offset": start, "byte_length": pos - start,
            }
            disposal = 0
            transparent = None
        else:
            raise ValueError(f"gif: unknown block 0x{b:02X}")


def decode_gif(raw: bytes) -> dict:
    """Decode a GIF87a/89a file's FIRST image frame into the
    :func:`..multimodal.decode_image` dict shape (RGB, or RGBA when
    the frame's graphic-control extension marks a transparent
    index). Animated files decode frame one and report the total
    frame count in ``n_frames`` (use :func:`decode_gif_frames` for
    full animation compositing); ``bit_depth`` reports the color
    table's index width."""
    import numpy as np

    _sw, _sh, gct, pos = _gif_header(raw)
    first = None
    n_frames = 0
    for fr in _iter_gif_frames(raw, gct, pos):
        n_frames += 1
        if first is None:
            first = (fr["decode"](), fr["lct"], fr["width"],
                     fr["height"], fr["transparent"])
    if first is None:
        raise ValueError("gif: no image frame")
    grid, lct, iw, ih, transparent = first
    rgb = lct[grid]  # (H, W, 3) palette expansion
    if transparent is not None and transparent < len(lct):
        alpha = np.where(grid == transparent, 0, 255).astype(np.uint8)
        px = np.dstack([rgb, alpha])
        mode, ch = "RGBA", 4
    else:
        px = rgb
        mode, ch = "RGB", 3
    return {
        "width": iw, "height": ih, "channels": ch, "mode": mode,
        "bit_depth": 8, "pixels": px.astype(np.uint8),
        "n_frames": n_frames,
    }


def decode_gif_frames(raw: bytes, every_n: int = 1) -> list[dict]:
    """Full animated-GIF decode with GIF89a disposal compositing
    (round 10 — completes the video-ish story next to
    ``split_mjpeg``): every frame is composited onto the logical
    screen (frames may be sub-rectangles at an offset; transparent
    pixels leave the canvas unchanged; disposal 2 clears the frame
    rect, disposal 3 restores the pre-frame canvas), and every
    ``every_n``-th COMPOSITE is returned as a canvas-sized RGBA
    array. All frames must decode (compositing needs each one), so
    sampling saves emission, not entropy work — the honest contract
    for a format whose frames are deltas. Returns
    ``[{frame_idx, n_frames, width, height, pixels, byte_length},
    ...]``; raises ``ValueError`` on the same malformed shapes as
    :func:`decode_gif`, plus frames that exceed the canvas."""
    import numpy as np

    sw, sh, gct, pos = _gif_header(raw)
    frames = list(_iter_gif_frames(raw, gct, pos))
    if not frames:
        raise ValueError("gif: no image frame")
    every_n = max(1, int(every_n))
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    out: list[dict] = []
    for k, fr in enumerate(frames):
        left, top = fr["left"], fr["top"]
        iw, ih = fr["width"], fr["height"]
        if left + iw > sw or top + ih > sh:
            raise ValueError("gif: frame outside logical screen")
        before = canvas.copy() if fr["disposal"] == 3 else None
        grid = fr["decode"]()
        lct = fr["lct"]
        rgba = np.empty((ih, iw, 4), dtype=np.uint8)
        rgba[:, :, :3] = lct[grid]
        rgba[:, :, 3] = 255
        region = canvas[top : top + ih, left : left + iw]
        t = fr["transparent"]
        if t is not None:
            opaque = grid != t
            region[opaque] = rgba[opaque]
        else:
            region[:] = rgba
        if k % every_n == 0:
            out.append(
                {
                    "frame_idx": k, "n_frames": len(frames),
                    "width": sw, "height": sh,
                    "pixels": canvas.copy(),
                    "byte_length": fr["byte_length"],
                }
            )
        if fr["disposal"] == 2:  # restore to background = clear rect
            canvas[top : top + ih, left : left + iw] = 0
        elif fr["disposal"] == 3 and before is not None:
            canvas = before
    return out


def encode_gif_animation(
    frames,
    offsets=None,
    disposals=None,
    delay_cs: int = 4,
    loop: bool = True,
) -> bytes:
    """Animated GIF89a encoder (fixture generator for
    :func:`decode_gif_frames`): each frame is a uint8 ``(H, W)``
    grayscale, ``(H, W, 3)`` RGB, or ``(H, W, 4)`` RGBA array
    (alpha < 128 → transparent pixels, encoded via a reserved
    palette index + GCE transparency flag); ``offsets`` places each
    frame on the logical screen (default all at (0, 0));
    ``disposals`` gives each frame's GCE disposal method (default
    1 = leave). Per-frame LOCAL color tables; a NETSCAPE2.0 loop
    application extension when ``loop`` (exercises the decoder's
    generic extension skip)."""
    import numpy as np

    if not frames:
        raise ValueError("gif encode: no frames")
    arrs = []
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        if a.ndim == 2:
            a = np.dstack([a, a, a])
        if a.ndim != 3 or a.shape[2] not in (3, 4):
            raise ValueError("gif encode: expected (H,W[,3|4]) frames")
        arrs.append(a)
    offsets = offsets or [(0, 0)] * len(arrs)
    disposals = disposals or [1] * len(arrs)
    sw = max(o[0] + a.shape[1] for o, a in zip(offsets, arrs))
    sh = max(o[1] + a.shape[0] for o, a in zip(offsets, arrs))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0, 0, 0)  # no global table
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for a, (left, top), disp in zip(arrs, offsets, disposals):
        h, w = a.shape[:2]
        has_alpha = a.shape[2] == 4
        rgb = a[:, :, :3]
        trans_mask = (a[:, :, 3] < 128) if has_alpha else None
        flat = rgb.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        tidx = None
        if trans_mask is not None and bool(trans_mask.any()):
            tidx = len(colors)  # reserved index after real colors
            if tidx > 255:
                raise ValueError("gif encode: more than 255 colors + alpha")
        elif len(colors) > 256:
            raise ValueError("gif encode: more than 256 distinct colors")
        n_used = len(colors) + (1 if tidx is not None else 0)
        ctbits = max(1, int(n_used - 1).bit_length())
        n = 1 << ctbits
        table = np.zeros((n, 3), dtype=np.uint8)
        table[: len(colors)] = colors
        grid = inverse.reshape(h, w)
        if tidx is not None:
            grid = np.where(trans_mask, tidx, grid)
        # GCE: disposal + transparency
        gce_flags = (disp & 7) << 2
        if tidx is not None:
            gce_flags |= 1
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, gce_flags, delay_cs,
            tidx if tidx is not None else 0, 0,
        )
        out += struct.pack(
            "<BHHHHB", 0x2C, left, top, w, h, 0x80 | ((ctbits - 1) & 7)
        )
        out += table.tobytes()
        min_code = max(2, ctbits)
        lzw = _lzw_encode(min_code, [int(v) for v in grid.reshape(-1)])
        out.append(min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """Single-frame GIF89a encoder (fixture generator): builds a
    global color table from the image's distinct colors (≤256
    required), LZW-compresses the index stream, optional interlace.
    Accepts uint8 ``(H, W)`` grayscale or ``(H, W, 3)`` RGB."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError(f"gif encode: {ch} channels unsupported")
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif encode: more than 256 distinct colors")
    # color table size: power of two ≥ max(len, 2)
    ctbits = max(1, int(len(colors) - 1).bit_length())
    n = 1 << ctbits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    grid = inverse.reshape(h, w)
    if interlace:
        rows = []
        for off, step in _GIF_INTERLACE:
            rows.extend(range(off, h, step))
        grid = grid[rows]
    min_code = max(2, ctbits)
    lzw = _lzw_encode(min_code, [int(v) for v in grid.reshape(-1)])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ctbits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------


def _bmp_rle8(data: bytes, w: int, h: int, stride: int):
    """BI_RLE8 decompression (round 10): encoded runs
    ``(count, index)``, escapes ``00 00`` end-of-line, ``00 01``
    end-of-bitmap, ``00 02 dx dy`` delta (skipped pixels stay 0,
    the spec's undefined-pixel convention), ``00 n≥3`` absolute mode
    (word-aligned). Returns uint8 ``(h, stride)`` in FILE order
    (bottom-up; the caller flips)."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run
            if y >= h or x + c > w:
                raise ValueError("bmp: RLE8 run outside bitmap")
            out[y, x : x + c] = v
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if i + 2 > n:
                raise ValueError("bmp: truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("bmp: RLE8 delta outside bitmap")
        else:  # absolute mode: v literal indexes, word-aligned
            if y >= h or x + v > w or i + v > n:
                raise ValueError("bmp: RLE8 absolute run outside bitmap")
            out[y, x : x + v] = np.frombuffer(
                data[i : i + v], dtype=np.uint8
            )
            x += v
            i += v + (v & 1)
    raise ValueError("bmp: RLE8 stream missing end-of-bitmap")


def encode_bmp_rle8(pixels) -> bytes:
    """8-bit grayscale-palette BMP with BI_RLE8 compression (fixture
    half): encodes each row as maximal runs with absolute-mode
    spans for non-repeating stretches, EOL after each row, EOD at
    the end. Input: uint8 ``(H, W)``."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("bmp rle8 encode: expected (H, W) grayscale")
    h, w = px.shape
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 3 or (x + run >= w and run >= 1):
                body += bytes([run, row[x]])
                x += run
            else:
                # absolute span until the next run of >= 3
                start = x
                while x < w and x - start < 255:
                    r2 = 1
                    while (
                        x + r2 < w and row[x + r2] == row[x] and r2 < 3
                    ):
                        r2 += 1
                    if r2 >= 3:
                        break
                    x += r2
                span = x - start
                if span >= 3:
                    body += bytes([0, span]) + row[start:x].tobytes()
                    if span & 1:
                        body += b"\x00"
                else:  # too short for absolute mode: tiny runs
                    for j in range(start, x):
                        body += bytes([1, row[j]])
        body += b"\x00\x00"  # EOL
    body += b"\x00\x01"  # EOD
    pal = bytearray()
    for i in range(256):
        pal += bytes([i, i, i, 0])
    data_off = 14 + 40 + 1024
    size = data_off + len(body)
    out = bytearray(b"BM")
    out += struct.pack("<IHHI", size, 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 2835, 2835, 256, 0,
    )
    out += bytes(pal)
    out += bytes(body)
    return bytes(out)


def decode_bmp(raw: bytes) -> dict:
    """Decode an uncompressed (BI_RGB) Windows BMP —
    BITMAPINFOHEADER or its V4/V5 supersets — at 8 (palette), 24
    (BGR), or 32 (BGRA) bits per pixel, bottom-up or top-down.
    RLE/bitfields/sub-byte depths raise ``ValueError`` naming the
    feature."""
    import numpy as np

    if raw[:2] != b"BM" or len(raw) < 54:
        raise ValueError("bmp: missing BM header")
    data_off = struct.unpack("<I", raw[10:14])[0]
    dib = struct.unpack("<I", raw[14:18])[0]
    if dib < 40:
        raise ValueError(f"bmp: DIB header size {dib} unsupported")
    w, h_raw = struct.unpack("<ii", raw[18:26])
    planes, bpp = struct.unpack("<HH", raw[26:30])
    compression = struct.unpack("<I", raw[30:34])[0]
    if compression == 1 and bpp != 8:
        raise ValueError("bmp: BI_RLE8 requires 8-bit pixels")
    if compression not in (0, 1):
        raise ValueError(f"bmp: compression {compression} unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"bmp: {bpp}-bit unsupported")
    if w <= 0 or h_raw == 0:
        raise ValueError("bmp: invalid dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if compression == 1:
        if top_down:  # RLE bitmaps are bottom-up per spec
            raise ValueError("bmp: top-down RLE8 is invalid")
        stride = (w + 3) & ~3
        rows = _bmp_rle8(raw[data_off:], w, h, stride)
        rows = rows[::-1]
    else:
        stride = (w * bpp // 8 + 3) & ~3
        end = data_off + stride * h
        if end > len(raw):
            raise ValueError("bmp: truncated pixel data")
        rows = np.frombuffer(raw[data_off:end], dtype=np.uint8).reshape(
            h, stride
        )
        if not top_down:
            rows = rows[::-1]
    if bpp == 8:
        n_colors = struct.unpack("<I", raw[46:50])[0] or 256
        pal_off = 14 + dib
        pal = np.frombuffer(
            raw[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        )
        if pal.size != 4 * n_colors:
            raise ValueError("bmp: truncated palette")
        pal = pal.reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRX → RGB
        idx = rows[:, :w].astype(np.int64)
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("bmp: pixel index outside palette")
        px = pal[idx]
        # an all-gray palette decodes as grayscale (the common
        # synthetic/scientific case), else RGB
        if bool((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
            return {
                "width": w, "height": h, "channels": 1, "mode": "L",
                "bit_depth": 8, "pixels": px[:, :, :1].astype(np.uint8),
            }
        return {
            "width": w, "height": h, "channels": 3, "mode": "RGB",
            "bit_depth": 8, "pixels": px.astype(np.uint8),
        }
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return {
            "width": w, "height": h, "channels": 3, "mode": "RGB",
            "bit_depth": 8, "pixels": np.ascontiguousarray(px),
        }
    px = rows[:, : w * 4].reshape(h, w, 4)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = px[:, :, 2]
    out[:, :, 1] = px[:, :, 1]
    out[:, :, 2] = px[:, :, 0]
    out[:, :, 3] = px[:, :, 3]
    return {
        "width": w, "height": h, "channels": 4, "mode": "RGBA",
        "bit_depth": 8, "pixels": out,
    }


def encode_bmp(pixels, top_down: bool = False) -> bytes:
    """BMP encoder (fixture generator): 24-bit BI_RGB for color
    input, 8-bit grayscale-palette for 2-D input; bottom-up by
    default (the common layout) or top-down (negative height)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and px.shape[2] != 3:
        raise ValueError("bmp encode: expected (H,W) or (H,W,3)")
    h, w = px.shape[:2]
    if gray:
        stride = (w + 3) & ~3
        pal = bytearray()
        for i in range(256):
            pal += bytes([i, i, i, 0])
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, :w] = px
        data_off = 14 + 40 + 1024
        bpp = 8
        pal_bytes = bytes(pal)
    else:
        stride = (w * 3 + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB → BGR
        data_off = 14 + 40
        bpp = 24
        pal_bytes = b""
    if not top_down:
        body = body[::-1]
    size = data_off + stride * h
    out = bytearray(b"BM")
    out += struct.pack("<IHHI", size, 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0,
        stride * h, 2835, 2835, 256 if gray else 0, 0,
    )
    out += pal_bytes
    out += body.tobytes()
    return bytes(out)
