"""Zero-dependency JPEG codec (round 8 baseline — VERDICT r7 item 2;
round 9 adds progressive, the ~6-10%-of-web-corpora tail).

Scope: BASELINE SEQUENTIAL (SOF0/SOF1) and PROGRESSIVE (SOF2) JFIF —
together the formats essentially all real-corpus images use. Decoder
handles grayscale and YCbCr color, arbitrary sampling factors 1–2
per axis (so 4:4:4, 4:2:2, and 4:2:0 streams all decode), 8- and
16-bit quantization tables, restart markers (DRI/RSTn), dimensions
that are not multiples of the MCU size, baseline NON-INTERLEAVED
multi-scan files (one SOS per component subset, T.81 A.2), and for
progressive the full T.81 G.2 scan algebra: interleaved/
non-interleaved DC scans, spectral selection, successive
approximation (DC and AC refinement), and EOB-run coding. Arithmetic-coded, hierarchical, lossless, and 12-bit
streams raise ``ValueError`` with the specific unsupported feature —
at corpus scale those rows quarantine through the ``ok=false``
contract of ``image_features`` rather than killing the stage.

The encoders exist for fixtures and synthetic corpora: quality-scaled
Annex-K quantization tables (libjpeg's 5000/q · 200−2q scaling),
4:4:4 or 4:2:0 sampling, standard Annex-K Huffman tables, byte
stuffing; the progressive encoder emits a 4-kind scan script (DC/AC
first + refinement) whose decode is pinned bit-identical to the
baseline path — enough to produce real JPEGs any external decoder
accepts.

Everything here is built from the public JPEG spec (ITU-T T.81 /
ISO 10918-1, Annex F/K) — the same tables every open codec ships.
Like the PNG/WAV codecs this is the correctness-first reference
kernel: per-pixel work is numpy-vectorized per 8×8 block (the DCT is
two 8×8 matrix multiplies), the entropy loop is Python and therefore
the slow path; a SIMD codec library plugs into the same
``decode_image`` kernel slot in a full deployment.

Reference anchor: no analog in the reference (datasplash has no
image surface); north-star multimodal extension (BASELINE.json).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------
# Public Annex-K constants (ITU-T T.81)
# ---------------------------------------------------------------------

#: zigzag scan order: index i of the scan -> (row, col) flat index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 — luminance quantization table (quality 50 base)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.2 — chrominance quantization table
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 — standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix():
    """Orthonormal 8×8 DCT-II basis M: M[u,x] = c(u)·cos((2x+1)uπ/16),
    c(0)=√⅛, c(u>0)=√¼. Forward DCT of block f is M·f·Mᵀ, inverse is
    Mᵀ·F·M — two 8×8 matmuls, the vectorized heart of both codec
    halves."""
    import numpy as np

    x = np.arange(8)
    u = x[:, None]
    m = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    scale = np.full(8, np.sqrt(2 / 8))
    scale[0] = np.sqrt(1 / 8)
    return m * scale[:, None]


def _quality_tables(quality: int):
    """IJG quality scaling of the Annex-K base tables: scale =
    5000/q (q<50) else 200−2q; entries clip to [1, 255]."""
    import numpy as np

    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (np.array(base, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out  # flattened in NATURAL (row-major) order


def _build_huffman_codes(bits, vals):
    """Annex C code assignment: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, value-bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(w, coef, dc_codes, ac_codes, pred: int) -> int:
    """Huffman-encode one zigzagged, quantized 8×8 block; returns the
    new DC predictor."""
    dc = int(coef[0])
    s, bitsv = _magnitude(dc - pred)
    c, ln = dc_codes[s]
    w.write(c, ln)
    if s:
        w.write(bitsv, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coef[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coef[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        s, bitsv = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        w.write(c, ln)
        w.write(bitsv, s)
        run = 0
    if last_nz != 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def _prepare_blocks(pixels, quality: int, subsample: bool):
    """Shared encoder front half: RGB→YCbCr, chroma downsampling,
    forward DCT + quantization into per-component ``(gh, gw, 64)``
    int32 zigzag coefficient grids. Used by both the baseline and
    progressive encoders — the two differ only in entropy coding."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError(f"jpeg encode: {ch} channels unsupported")
    qluma, qchroma = _quality_tables(quality)

    if ch == 3:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qtabs = [qluma, qchroma, qchroma]
        factors = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qtabs = [qluma]
        factors = [(1, 1)]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    M = _dct_matrix()
    zz = np.array(ZIGZAG)
    blocks_per_plane = []
    for plane, qt, (fx, fy) in zip(planes, qtabs, factors):
        if (fx, fy) != (hmax, vmax):
            # box-downsample chroma by the factor ratio (pad odd dims
            # by edge replication first so the 2x2 mean is defined)
            ry, rx = vmax // fy, hmax // fx
            ph = -(-plane.shape[0] // ry) * ry
            pw = -(-plane.shape[1] // rx) * rx
            p = np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            plane = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        gh, gw = mcuy * fy, mcux * fx  # block-grid dims for this comp
        padded = np.pad(
            plane,
            ((0, gh * 8 - plane.shape[0]), (0, gw * 8 - plane.shape[1])),
            mode="edge",
        )
        qmat = qt.reshape(8, 8).astype(np.float64)
        coefs = np.empty((gh, gw, 64), dtype=np.int32)
        for by in range(gh):
            for bx in range(gw):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                F = M @ blk @ M.T
                q = np.round(F / qmat).astype(np.int32)
                coefs[by, bx] = q.reshape(64)[zz]
        blocks_per_plane.append(coefs)

    return (
        h, w, ch, qluma, qchroma, factors, hmax, vmax, mcux, mcuy,
        blocks_per_plane,
    )


def encode_jpeg_baseline(
    pixels,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    interleaved: bool = True,
) -> bytes:
    """Encode uint8 ``(H, W)`` grayscale or ``(H, W, 3)`` RGB as a
    baseline sequential JFIF JPEG: quality-scaled Annex-K
    quantization, standard Annex-K Huffman tables, 4:4:4 sampling by
    default or 4:2:0 (2×2 luma factors, box-downsampled chroma) with
    ``subsample=True`` — the common real-corpus layout, and the
    fixture that exercises the decoder's upsampling path.
    ``interleaved=False`` (color only) writes one SOS PER COMPONENT
    instead of the single interleaved scan — the legal-but-rare
    non-interleaved sequential layout (T.81 A.2), the fixture for the
    decoder's multi-scan accumulation path. Output is a real JPEG
    any decoder accepts."""
    (
        h, w, ch, qluma, qchroma, factors, hmax, vmax, mcux, mcuy,
        blocks_per_plane,
    ) = _prepare_blocks(pixels, quality, subsample)

    dc_l = _build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if not interleaved and ch > 1:
        if restart_interval:
            raise ValueError(
                "jpeg encode: restart_interval unsupported with "
                "interleaved=False"
            )
        out = _frame_headers(h, w, ch, qluma, qchroma, factors, 0xFFC0, 0)
        for ci in range(ch):
            fx, fy = factors[ci]
            wb = -(-(-(-w * fx // hmax)) // 8)
            hb = -(-(-(-h * fy // vmax)) // 8)
            dc_codes = dc_l if ci == 0 else dc_c
            ac_codes = ac_l if ci == 0 else ac_c
            wtr = _BitWriter()
            pred = 0
            for by in range(hb):
                for bx in range(wb):
                    pred = _encode_block(
                        wtr, blocks_per_plane[ci][by, bx],
                        dc_codes, ac_codes, pred,
                    )
            wtr.flush()
            out += _seg(
                0xFFDA,
                bytes([1, ci + 1, 0x00 if ci == 0 else 0x11])
                + b"\x00\x3f\x00",
            )
            out += wtr.buf
        out += b"\xff\xd9"
        return bytes(out)

    wtr = _BitWriter()
    preds = [0] * ch
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                # byte-align (1-fill), emit RSTn, reset DC predictors
                wtr.flush()
                wtr.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ch
            for ci in range(ch):
                fx, fy = factors[ci]
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                for by in range(fy):
                    for bx in range(fx):
                        preds[ci] = _encode_block(
                            wtr,
                            blocks_per_plane[ci][
                                my * fy + by, mx * fx + bx
                            ],
                            dc_codes, ac_codes, preds[ci],
                        )
            mcu_count += 1
    wtr.flush()

    out = _frame_headers(
        h, w, ch, qluma, qchroma, factors, 0xFFC0, restart_interval
    )
    # SOS
    scomps = b""
    for ci in range(ch):
        scomps += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += _seg(0xFFDA, bytes([ch]) + scomps + b"\x00\x3f\x00")
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _frame_headers(
    h, w, ch, qluma, qchroma, factors, sof_marker, restart_interval
) -> bytearray:
    """SOI + JFIF APP0 + DQT + SOF + DHT (+ DRI) — everything before
    the first SOS, shared by the baseline (SOF0) and progressive
    (SOF2) encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    # DQT: zigzag order on the wire
    out += _seg(0xFFDB, bytes([0]) + bytes(int(qluma[z]) for z in ZIGZAG))
    if ch == 3:
        out += _seg(
            0xFFDB, bytes([1]) + bytes(int(qchroma[z]) for z in ZIGZAG)
        )
    comps = b""
    for ci in range(ch):
        fx, fy = factors[ci]
        comps += bytes([ci + 1, (fx << 4) | fy, 0 if ci == 0 else 1])
    out += _seg(sof_marker, struct.pack(">BHHB", 8, h, w, ch) + comps)
    # DHT
    out += _seg(
        0xFFC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    )
    out += _seg(
        0xFFC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    )
    if ch == 3:
        out += _seg(
            0xFFC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        )
        out += _seg(
            0xFFC4, bytes([0x11] + AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS)
        )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg_progressive(
    pixels,
    quality: int = 85,
    subsample: bool = False,
    successive: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 grayscale/RGB as a PROGRESSIVE (SOF2) JFIF JPEG —
    the fixture generator for the progressive decode path (~6-10% of
    real web corpora). Same DCT/quantization front half as the
    baseline encoder (:func:`_prepare_blocks`), different entropy
    plan: with ``successive=True`` the scan script exercises all four
    progressive scan kinds — DC first at Al=1, per-component AC first
    (1..63) at Al=1, DC refinement, per-component AC refinement —
    and with ``successive=False`` a pure spectral-selection script
    (DC then per-component AC, Al=0). EOB runs are capped at one
    block so the standard Annex-K tables suffice (longer-run symbols
    0x10..0xE0 are absent from them); the decoder handles arbitrary
    runs. Output is a real progressive JPEG any decoder accepts."""
    (
        h, w, ch, qluma, qchroma, factors, hmax, vmax, mcux, mcuy,
        blocks,
    ) = _prepare_blocks(pixels, quality, subsample)

    dc_tabs = [
        _build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    def tab(ci):  # luma tables for comp 0, chroma for the rest
        return 0 if ci == 0 else 1

    # per-comp non-interleaved block dims (AC scans cover these; the
    # interleaved grid's extra padding blocks stay DC-only, cropped
    # away at reconstruction)
    nb = []
    for ci in range(ch):
        fx, fy = factors[ci]
        cw, chh = -(-w * fx // hmax), -(-h * fy // vmax)
        nb.append((-(-chh // 8), -(-cw // 8)))

    def sos(ns_comps, ss, se, ah, al):
        body = bytes([len(ns_comps)])
        for ci in ns_comps:
            if ss == 0:
                body += bytes([ci + 1, tab(ci) << 4])
            else:
                body += bytes([ci + 1, tab(ci)])
        return _seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    ri = int(restart_interval)

    def maybe_restart(wtr, unit, state):
        """Baseline-style restart emission at unit START: byte-align,
        RSTn, and let the caller reset DC predictors."""
        if ri and unit and unit % ri == 0:
            wtr.flush()
            wtr.buf += bytes([0xFF, 0xD0 + state[0]])
            state[0] = (state[0] + 1) & 7
            return True
        return False

    def dc_first(al):
        wtr = _BitWriter()
        preds = [0] * ch
        rst = [0]
        for my in range(mcuy):
            for mx in range(mcux):
                if maybe_restart(wtr, my * mcux + mx, rst):
                    preds = [0] * ch
                for ci in range(ch):
                    fx, fy = factors[ci]
                    dcc = dc_tabs[tab(ci)]
                    for by in range(fy):
                        for bx in range(fx):
                            v = int(
                                blocks[ci][my * fy + by, mx * fx + bx, 0]
                            ) >> al
                            s, bitsv = _magnitude(v - preds[ci])
                            c, ln = dcc[s]
                            wtr.write(c, ln)
                            if s:
                                wtr.write(bitsv, s)
                            preds[ci] = v
        wtr.flush()
        return bytes(wtr.buf)

    def dc_refine(al):
        wtr = _BitWriter()
        rst = [0]
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(wtr, my * mcux + mx, rst)
                for ci in range(ch):
                    fx, fy = factors[ci]
                    for by in range(fy):
                        for bx in range(fx):
                            wtr.write(
                                (int(
                                    blocks[ci][my * fy + by, mx * fx + bx, 0]
                                ) >> al) & 1,
                                1,
                            )
        wtr.flush()
        return bytes(wtr.buf)

    def ac_first(ci, al):
        wtr = _BitWriter()
        acc = ac_tabs[tab(ci)]
        hb, wb = nb[ci]
        rst = [0]
        for by in range(hb):
            for bx in range(wb):
                maybe_restart(wtr, by * wb + bx, rst)
                row = blocks[ci][by, bx]
                vals = [0] * 64
                lnz = 0
                for k in range(1, 64):
                    c0 = int(row[k])
                    t = abs(c0) >> al
                    if t:
                        vals[k] = t if c0 > 0 else -t
                        lnz = k
                run = 0
                for k in range(1, lnz + 1):
                    v = vals[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = acc[0xF0]
                        wtr.write(c, ln)
                        run -= 16
                    s, bitsv = _magnitude(v)
                    c, ln = acc[(run << 4) | s]
                    wtr.write(c, ln)
                    wtr.write(bitsv, s)
                    run = 0
                if lnz < 63:
                    c, ln = acc[0x00]  # EOB (run of exactly 1)
                    wtr.write(c, ln)
        wtr.flush()
        return bytes(wtr.buf)

    def ac_refine(ci, al):
        wtr = _BitWriter()
        acc = ac_tabs[tab(ci)]
        hb, wb = nb[ci]
        rst = [0]
        for by in range(hb):
            for bx in range(wb):
                maybe_restart(wtr, by * wb + bx, rst)
                row = blocks[ci][by, bx]
                t = [0] * 64
                eob_idx = 0
                for k in range(1, 64):
                    t[k] = abs(int(row[k])) >> al
                    if t[k] == 1:
                        eob_idx = k
                r = 0
                br: list[int] = []
                for k in range(1, 64):
                    if t[k] == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_idx:
                        c, ln = acc[0xF0]
                        wtr.write(c, ln)
                        r -= 16
                        for b in br:
                            wtr.write(b, 1)
                        br = []
                    if t[k] > 1:
                        br.append(t[k] & 1)  # correction bit
                        continue
                    # newly-significant coefficient (magnitude 1)
                    c, ln = acc[(r << 4) | 1]
                    wtr.write(c, ln)
                    wtr.write(1 if int(row[k]) > 0 else 0, 1)
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    c, ln = acc[0x00]  # EOB (run of exactly 1)
                    wtr.write(c, ln)
                    for b in br:
                        wtr.write(b, 1)
        wtr.flush()
        return bytes(wtr.buf)

    out = _frame_headers(h, w, ch, qluma, qchroma, factors, 0xFFC2, ri)
    all_comps = list(range(ch))
    if successive:
        out += sos(all_comps, 0, 0, 0, 1) + dc_first(1)
        for ci in all_comps:
            out += sos([ci], 1, 63, 0, 1) + ac_first(ci, 1)
        out += sos(all_comps, 0, 0, 1, 0) + dc_refine(0)
        for ci in all_comps:
            out += sos([ci], 1, 63, 1, 0) + ac_refine(ci, 0)
    else:
        out += sos(all_comps, 0, 0, 0, 0) + dc_first(0)
        for ci in all_comps:
            out += sos([ci], 1, 63, 0, 0) + ac_first(ci, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


#: LUT cache keyed by table CONTENT: corpora overwhelmingly reuse the
#: standard Annex-K tables (and a synthesized corpus reuses them
#: exactly), so without this a TINY image pays more for its two
#: 65536-entry LUT builds than for its decode — the ×100 probe
#: (500k 8-16px images) measured 17.7 s bit-serial → 35.4 s with
#: uncached LUTs → 17.9 s cached (tiny corpora are ENCODE-bound, so
#: the decoder rewrite shows there as parity; a 256×256 image
#: decodes 458 ms → 58 ms). Bounded: cleared wholesale if exotic
#: per-image tables ever grow it past 64.
_HUFF_LUT_CACHE: dict[tuple, list[int]] = {}


def _build_huffman_lut(bits, vals):
    """Flat 2^16 lookup for one Huffman table: entry = every 16-bit
    window whose prefix is a code, value = ``symbol << 5 | length``
    (length ≤ 16 fits 5 bits); 0 = invalid prefix. Decode cost drops
    from one dict probe PER BIT to one list index per SYMBOL
    (measured 8× end-to-end on a 256×256 image); builds are cached
    by table content (see :data:`_HUFF_LUT_CACHE`)."""
    import numpy as np

    key = (tuple(bits), tuple(vals))
    cached = _HUFF_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (vals[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()  # python list: ~2x faster indexing than ndarray
    if len(_HUFF_LUT_CACHE) >= 64:
        _HUFF_LUT_CACHE.clear()
    _HUFF_LUT_CACHE[key] = out
    return out


class _FastBits:
    """Bit reader over a DESTUFFED entropy segment. Peeks may run
    past the end (virtually 1-padded, like the encoder's fill bits);
    CONSUMING past the real end raises — that is the truncation
    signal."""

    __slots__ = ("d", "n", "pos", "acc", "bits", "consumed", "total")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.bits = 0
        self.consumed = 0
        self.total = 8 * len(data)

    def peek16(self) -> int:
        while self.bits < 16:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.d[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF  # virtual pad
            self.bits += 8
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def consume(self, k: int) -> None:
        self.consumed += k
        if self.consumed > self.total:
            raise ValueError("jpeg: truncated entropy stream")
        self.bits -= k
        self.acc &= (1 << self.bits) - 1

    def get(self, k: int) -> int:
        while self.bits < k:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.d[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF
            self.bits += 8
        v = (self.acc >> (self.bits - k)) & ((1 << k) - 1)
        self.consume(k)
        return v


def _entropy_segments(raw: bytes, pos: int) -> tuple[list[bytes], int]:
    """Destuffed entropy byte segments from the scan-data start to
    the terminating marker — one segment per restart interval (the
    RSTn markers are the separators; 0xFF00 stuffing removed), plus
    the offset of that terminating marker's 0xFF so a multi-scan
    (progressive) parse can resume there. The single scan over 0xFF
    positions replaces the per-byte stuffing checks of the old bit
    reader."""
    n = len(raw)
    segments: list[bytes] = []
    parts: list[bytes] = []
    last = pos
    i = raw.find(b"\xff", pos)
    while i != -1:
        if i + 1 >= n:
            raise ValueError("jpeg: truncated entropy stream")
        nxt = raw[i + 1]
        if nxt == 0x00:
            parts.append(raw[last : i + 1])  # keep the FF, drop the 00
            last = i + 2
        elif 0xD0 <= nxt <= 0xD7:
            parts.append(raw[last:i])
            segments.append(b"".join(parts))
            parts = []
            last = i + 2
        else:  # real marker: end of entropy data
            parts.append(raw[last:i])
            segments.append(b"".join(parts))
            return segments, i
        i = raw.find(b"\xff", last)
    raise ValueError("jpeg: truncated entropy stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(raw: bytes) -> dict:
    """Decode a baseline sequential JPEG. Returns the
    :func:`..multimodal.decode_image` dict shape: ``{"width",
    "height", "channels", "mode", "bit_depth", "pixels": uint8
    (H, W, C)}`` with C = 1 (grayscale) or 3 (RGB, JFIF YCbCr
    inverse). Sampling factors 1–2 per axis upsample by pixel
    replication. Progressive/arithmetic/12-bit streams raise
    ``ValueError`` naming the unsupported feature."""
    import numpy as np

    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    store = None  # progressive: per-comp coefficient accumulators
    n_scans = 0
    zz = np.array(ZIGZAG)

    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        body = raw[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("jpeg: truncated segment")
        pos += 2 + seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    t = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
                else:
                    t = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                nat = np.empty(64, dtype=np.int32)
                nat[zz] = t  # wire order is zigzag
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = (bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"jpeg: {prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF marker 0xFF{marker:02X} (non-baseline) "
                "unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tda = body[1 + 2 * si : 3 + 2 * si]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append(
                    {**comp, "dc": tda >> 4, "ac": tda & 0xF}
                )
            if frame["progressive"]:
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                if store is None:
                    store = _alloc_coef_store(frame)
                pos = _decode_progressive_scan(
                    raw, pos, frame, store, scan, htables,
                    restart_interval, ss, se, ahal >> 4, ahal & 0xF,
                )
                n_scans += 1
                continue
            if ns != len(frame["comps"]):
                # baseline NON-INTERLEAVED / multi-scan (T.81 A.2):
                # each scan carries a subset of the frame components;
                # accumulate coefficients per scan and reconstruct at
                # EOI, sharing the progressive store machinery
                if store is None:
                    store = _alloc_coef_store(frame)
                pos = _decode_baseline_partial_scan(
                    raw, pos, frame, store, scan, htables,
                    restart_interval,
                )
                n_scans += 1
                continue
            return _decode_scan(
                raw, pos, frame, scan, qtables, htables,
                restart_interval,
            )
        # APPn/COM and everything else: skipped
    if n_scans and store is not None:
        # progressive: all scans decoded — reconstruct from the
        # accumulated coefficients (quantization tables resolved
        # here; a scan-less component reconstructs as flat zeros,
        # matching libjpeg's partial-render behavior)
        for comp, meta in zip(frame["comps"], store):
            if comp["tq"] not in qtables:
                raise ValueError("jpeg: missing huffman/quant table")
            meta["qt"] = qtables[comp["tq"]]
        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        return _reconstruct(store, frame["h"], frame["w"], hmax, vmax)
    raise ValueError("jpeg: no SOS marker found")


def _alloc_coef_store(frame) -> list[dict]:
    """Per-component coefficient accumulators for a progressive
    frame: one 64-long zigzag row per block on the INTERLEAVED grid
    (``mcuy·v × mcux·h`` — the superset of the non-interleaved grid,
    so single-component scans write into its top-left corner with
    the same row stride). Rows are plain lists: the entropy loops
    index them per-coefficient, and :func:`_reconstruct` batches
    them into one ndarray at the end."""
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("jpeg: sampling factors beyond 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    store = []
    for c in frame["comps"]:
        gh, gw = mcuy * c["v"], mcux * c["h"]
        # per-component block dims for NON-interleaved scans
        cw = -(-fw * c["h"] // hmax)
        chh = -(-fh * c["v"] // vmax)
        store.append(
            {
                "coef": [[0] * 64 for _ in range(gh * gw)],
                "gw": gw, "gh": gh,
                "fx": c["h"], "fy": c["v"],
                "wb": -(-cw // 8), "hb": -(-chh // 8),
                "mcux": mcux, "mcuy": mcuy,
            }
        )
    return store


def _decode_progressive_scan(
    raw, pos, frame, store, scan, htables, restart_interval, ss, se, ah, al
):
    """Entropy-decode ONE progressive scan (T.81 G.2) into the
    persistent coefficient store; returns the offset of the marker
    terminating the scan's entropy data. Four scan kinds: DC first
    (ss=0, ah=0 — Huffman diff coding, value << al), DC refinement
    (one raw bit per block, OR-ed at bit al), AC first (single
    component, EOB-run coding, values << al), AC refinement
    (correction bits for known coefficients + newly-significant
    ±1<<al). Restart markers reset DC predictors and the EOB run,
    exactly as in baseline."""
    comp_idx = {c["id"]: i for i, c in enumerate(frame["comps"])}
    members = [store[comp_idx[c["id"]]] for c in scan]

    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: invalid progressive DC scan band")
        if ah == 0:
            for c in scan:
                if (0, c["dc"]) not in htables:
                    raise ValueError("jpeg: missing huffman/quant table")
            luts = [
                _build_huffman_lut(*htables[(0, c["dc"])]) for c in scan
            ]
        else:
            luts = [None] * len(scan)  # DC refinement: raw bits, no table
    else:
        if len(scan) != 1:
            raise ValueError(
                "jpeg: progressive AC scan must be single-component"
            )
        if not (ss <= se <= 63):
            raise ValueError("jpeg: invalid progressive AC scan band")
        if (1, scan[0]["ac"]) not in htables:
            raise ValueError("jpeg: missing huffman/quant table")
        ac_lut = _build_huffman_lut(*htables[(1, scan[0]["ac"])])

    interleaved = len(scan) > 1
    if ss == 0 and interleaved:
        mcux, mcuy = members[0]["mcux"], members[0]["mcuy"]
        total_units = mcux * mcuy
    else:
        # non-interleaved: one block per MCU over the comp's own grid
        m = members[0]
        total_units = m["wb"] * m["hb"]

    segments, end = _entropy_segments(raw, pos)
    per_seg = restart_interval if restart_interval else total_units
    unit = 0
    for seg in segments:
        if unit >= total_units:
            break
        bits = _FastBits(seg)
        preds = [0] * len(scan)
        eobrun = 0
        for _ in range(min(per_seg, total_units - unit)):
            if ss == 0:
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    for ci, m in enumerate(members):
                        fx, fy, gw = m["fx"], m["fy"], m["gw"]
                        coef = m["coef"]
                        for by in range(fy):
                            for bx in range(fx):
                                row = coef[
                                    (my * fy + by) * gw + (mx * fx + bx)
                                ]
                                if ah == 0:
                                    preds[ci] = _dc_first(
                                        row, luts[ci], bits, preds[ci], al
                                    )
                                else:
                                    if bits.get(1):
                                        row[0] |= 1 << al
                else:
                    m = members[0]
                    by, bx = divmod(unit, m["wb"])
                    row = m["coef"][by * m["gw"] + bx]
                    if ah == 0:
                        preds[0] = _dc_first(
                            row, luts[0], bits, preds[0], al
                        )
                    else:
                        if bits.get(1):
                            row[0] |= 1 << al
            else:
                m = members[0]
                by, bx = divmod(unit, m["wb"])
                row = m["coef"][by * m["gw"] + bx]
                if ah == 0:
                    eobrun = _ac_first_band(
                        row, ss, se, al, bits, ac_lut, eobrun
                    )
                else:
                    eobrun = _ac_refine_band(
                        row, ss, se, al, bits, ac_lut, eobrun
                    )
            unit += 1
    if unit < total_units:
        raise ValueError("jpeg: truncated entropy stream")
    return end


def _decode_baseline_partial_scan(
    raw, pos, frame, store, scan, htables, restart_interval
):
    """Entropy-decode ONE baseline scan that does not cover all frame
    components (non-interleaved / multi-scan sequential, T.81 A.2)
    into the coefficient store; returns the terminating marker's
    offset. Interleaved subset scans use the FRAME's MCU structure;
    single-component scans run one block per MCU over the component's
    own (non-padded) block grid. The per-block entropy rules are the
    strict baseline ones (:func:`_baseline_block` — twin of the
    fused loop in :func:`_decode_scan`, which stays inlined because
    it is the measured hot path)."""
    comp_idx = {c["id"]: i for i, c in enumerate(frame["comps"])}
    members = [store[comp_idx[c["id"]]] for c in scan]
    luts = []
    for c in scan:
        for key in ((0, c["dc"]), (1, c["ac"])):
            if key not in htables:
                raise ValueError("jpeg: missing huffman/quant table")
        luts.append(
            (
                _build_huffman_lut(*htables[(0, c["dc"])]),
                _build_huffman_lut(*htables[(1, c["ac"])]),
            )
        )
    interleaved = len(scan) > 1
    if interleaved:
        mcux, mcuy = members[0]["mcux"], members[0]["mcuy"]
        total_units = mcux * mcuy
    else:
        m = members[0]
        total_units = m["wb"] * m["hb"]
    segments, end = _entropy_segments(raw, pos)
    per_seg = restart_interval if restart_interval else total_units
    unit = 0
    for seg in segments:
        if unit >= total_units:
            break
        bits = _FastBits(seg)
        preds = [0] * len(scan)
        for _ in range(min(per_seg, total_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for ci, m in enumerate(members):
                    dc_lut, ac_lut = luts[ci]
                    fx, fy, gw = m["fx"], m["fy"], m["gw"]
                    for by in range(fy):
                        for bx in range(fx):
                            row = m["coef"][
                                (my * fy + by) * gw + (mx * fx + bx)
                            ]
                            preds[ci] = _baseline_block(
                                row, dc_lut, ac_lut, bits, preds[ci]
                            )
            else:
                m = members[0]
                by, bx = divmod(unit, m["wb"])
                row = m["coef"][by * m["gw"] + bx]
                preds[0] = _baseline_block(
                    row, luts[0][0], luts[0][1], bits, preds[0]
                )
            unit += 1
    if unit < total_units:
        raise ValueError("jpeg: truncated entropy stream")
    return end


def _baseline_block(row, dc_lut, ac_lut, bits, pred):
    """One full-band sequential block: DC diff + run-length AC, with
    the same strict symbol rules as the fused hot loop in
    :func:`_decode_scan` (invalid size-0 AC symbols and index
    overruns raise instead of mis-decoding)."""
    peek16, consume, get = bits.peek16, bits.consume, bits.get
    v = dc_lut[peek16()]
    if v == 0:
        raise ValueError("jpeg: invalid huffman code")
    consume(v & 31)
    s = v >> 5
    if s:
        d = get(s)
        pred += d if d >= (1 << (s - 1)) else d - (1 << s) + 1
    row[0] = pred
    k = 1
    while k < 64:
        v = ac_lut[peek16()]
        if v == 0:
            raise ValueError("jpeg: invalid huffman code")
        consume(v & 31)
        rs = v >> 5
        s = rs & 15
        if s == 0:
            if rs == 0xF0:  # ZRL
                k += 16
                if k > 63:
                    raise ValueError("jpeg: AC index out of range")
                continue
            if rs != 0x00:
                raise ValueError(f"jpeg: invalid AC symbol 0x{rs:02X}")
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("jpeg: AC index out of range")
        d = get(s)
        row[k] = d if d >= (1 << (s - 1)) else d - (1 << s) + 1
        k += 1
    return pred


def _dc_first(row, dc_lut, bits, pred, al):
    """One block of a first DC scan: Huffman size + diff bits, new
    predictor returned; the stored coefficient is pred << al."""
    v = dc_lut[bits.peek16()]
    if v == 0:
        raise ValueError("jpeg: invalid huffman code")
    bits.consume(v & 31)
    s = v >> 5
    if s:
        d = bits.get(s)
        pred += d if d >= (1 << (s - 1)) else d - (1 << s) + 1
    row[0] = pred << al
    return pred


def _ac_first_band(row, ss, se, al, bits, ac_lut, eobrun):
    """One block's band in a first AC scan: EOB-run coded runs of
    zeros + magnitude-coded coefficients shifted left by al."""
    if eobrun > 0:
        return eobrun - 1
    peek16, consume, get = bits.peek16, bits.consume, bits.get
    k = ss
    while k <= se:
        v = ac_lut[peek16()]
        if v == 0:
            raise ValueError("jpeg: invalid huffman code")
        consume(v & 31)
        rs = v >> 5
        s = rs & 15
        r = rs >> 4
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += get(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC index out of range")
        d = get(s)
        row[k] = (d if d >= (1 << (s - 1)) else d - (1 << s) + 1) << al
        k += 1
    return eobrun


def _ac_refine_band(row, ss, se, al, bits, ac_lut, eobrun):
    """One block's band in an AC refinement scan (T.81 G.1.2.3):
    newly-significant coefficients arrive as ±1<<al with a run of
    zero-HISTORY positions; every already-nonzero coefficient passed
    over consumes one correction bit. An EOB run still consumes
    correction bits for the remaining nonzero coefficients of each
    covered block."""
    p1 = 1 << al
    m1 = -p1
    peek16, consume, get = bits.peek16, bits.consume, bits.get
    k = ss
    if eobrun == 0:
        while k <= se:
            v = ac_lut[peek16()]
            if v == 0:
                raise ValueError("jpeg: invalid huffman code")
            consume(v & 31)
            rs = v >> 5
            s = rs & 15
            r = rs >> 4
            val = 0
            if s == 0:
                if r != 15:
                    # run INCLUDES the current block: its remaining
                    # correction bits still stream (the tail below
                    # consumes them, then decrements) — unlike
                    # AC-first, where covered blocks carry no bits
                    eobrun = 1 << r
                    if r:
                        eobrun += get(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "jpeg: invalid AC refinement symbol"
                    )
                val = p1 if get(1) else m1
            while k <= se:
                c = row[k]
                if c != 0:
                    if get(1) and (c & p1) == 0:
                        row[k] += p1 if c > 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val:
                if k > se:
                    raise ValueError("jpeg: AC index out of range")
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = row[k]
            if c != 0:
                if get(1) and (c & p1) == 0:
                    row[k] += p1 if c > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(raw, pos, frame, scan, qtables, htables, restart_interval):
    """Entropy-decode + reconstruct one baseline scan. The hot path
    is table-driven (round 8): the entropy stream destuffs ONCE into
    per-restart segments (:func:`_entropy_segments`), Huffman symbols
    resolve via a 16-bit-peek flat LUT (one list index per symbol
    instead of one dict probe per bit), coefficients land in one
    (n_blocks, 64) array per component, and dequantize + inverse
    zigzag + IDCT run as THREE numpy ops over all blocks at the end
    (einsum batch matmul) — measured 8× over the bit-serial form on
    a 256×256 image, bit-identical output (the roundtrip/DRI tests
    pin it)."""
    import numpy as np

    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("jpeg: sampling factors beyond 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    total_mcus = mcux * mcuy

    luts: dict[tuple[int, int], list[int]] = {}
    comps = []  # (dc_lut, ac_lut, coef_rows, grid_w, fx, fy)
    for c in scan:
        for key in ((0, c["dc"]), (1, c["ac"])):
            if key not in luts:
                if key not in htables:
                    raise ValueError("jpeg: missing huffman/quant table")
                luts[key] = _build_huffman_lut(*htables[key])
        if c["tq"] not in qtables:
            raise ValueError("jpeg: missing huffman/quant table")
        gh, gw = mcuy * c["v"], mcux * c["h"]
        comps.append(
            {
                "dc": luts[(0, c["dc"])],
                "ac": luts[(1, c["ac"])],
                "coef": [[0] * 64 for _ in range(gh * gw)],
                "gw": gw,
                "gh": gh,
                "fx": c["h"],
                "fy": c["v"],
                "qt": qtables[c["tq"]],
            }
        )

    segments, _ = _entropy_segments(raw, pos)
    per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    for seg in segments:
        if mcu >= total_mcus:
            break
        bits = _FastBits(seg)
        preds = [0] * len(comps)
        peek16 = bits.peek16
        consume = bits.consume
        get = bits.get
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for ci, comp in enumerate(comps):
                dc_lut = comp["dc"]
                ac_lut = comp["ac"]
                fx, fy, gw = comp["fx"], comp["fy"], comp["gw"]
                for by in range(fy):
                    for bx in range(fx):
                        row = comp["coef"][
                            (my * fy + by) * gw + (mx * fx + bx)
                        ]
                        v = dc_lut[peek16()]
                        if v == 0:
                            raise ValueError("jpeg: invalid huffman code")
                        consume(v & 31)
                        s = v >> 5
                        if s:
                            d = get(s)
                            preds[ci] += (
                                d if d >= (1 << (s - 1)) else d - (1 << s) + 1
                            )
                        row[0] = preds[ci]
                        k = 1
                        while k < 64:
                            v = ac_lut[peek16()]
                            if v == 0:
                                raise ValueError(
                                    "jpeg: invalid huffman code"
                                )
                            consume(v & 31)
                            rs = v >> 5
                            s = rs & 15
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    if k > 63:
                                        raise ValueError(
                                            "jpeg: AC index out of range"
                                        )
                                    continue
                                if rs != 0x00:
                                    # size-0 symbols other than EOB/ZRL
                                    # are illegal in baseline — treating
                                    # them as EOB would decode corrupt
                                    # streams silently
                                    raise ValueError(
                                        "jpeg: invalid AC symbol "
                                        f"0x{rs:02X}"
                                    )
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError(
                                    "jpeg: AC index out of range"
                                )
                            d = get(s)
                            row[k] = (
                                d if d >= (1 << (s - 1)) else d - (1 << s) + 1
                            )
                            k += 1
            mcu += 1
    if mcu < total_mcus:
        raise ValueError("jpeg: truncated entropy stream")

    return _reconstruct(comps, fh, fw, hmax, vmax)


def _reconstruct(comps, fh, fw, hmax, vmax) -> dict:
    """Batch reconstruction shared by the baseline and progressive
    paths: dequantize + inverse zigzag + IDCT for ALL blocks of a
    component in three vectorized ops, then chroma upsampling and
    (for color) the JFIF YCbCr inverse. ``comps`` rows carry
    ``coef`` (list of 64-long zigzag rows), ``gh``/``gw`` block-grid
    dims, ``fx``/``fy`` sampling factors, and ``qt``."""
    import numpy as np

    M = _dct_matrix()
    zz = np.array(ZIGZAG)
    full = []
    for comp in comps:
        coef = np.asarray(comp["coef"], dtype=np.float64)  # (n, 64) zigzag
        nat = np.empty_like(coef)
        nat[:, zz] = coef
        nat *= comp["qt"].reshape(64).astype(np.float64)
        blocks = np.einsum(
            "ij,njk,kl->nil", M.T, nat.reshape(-1, 8, 8), M
        ) + 128.0
        gh, gw = comp["gh"], comp["gw"]
        plane = (
            blocks.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        ry, rx = vmax // comp["fy"], hmax // comp["fx"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])

    if len(full) == 1:
        pix = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
        return {
            "width": fw, "height": fh, "channels": 1, "mode": "L",
            "bit_depth": 8, "pixels": pix,
        }
    if len(full) != 3:
        raise ValueError(f"jpeg: {len(full)}-component scan unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    pix = np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)
    return {
        "width": fw, "height": fh, "channels": 3, "mode": "RGB",
        "bit_depth": 8, "pixels": pix,
    }
