"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (BASELINE north-star extension).

Design for 100 TB: media bytes ride in a ``binary`` column next to a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes stream through
workers without driver involvement, and the *metadata* (small) is
what shuffles. No image/audio codec LIBRARIES exist in this
container (environment contract), but the decode paths are REAL
without them: :func:`decode_image` decodes PNG (all five scanline
filters, sequential + Adam7), binary PNM, baseline + progressive
JPEG (:mod:`.jpeg`), GIF incl. full animation compositing and BMP
incl. RLE8 (:mod:`.gifbmp`), and baseline TIFF (:mod:`.tiff`);
:func:`decode_wav` covers PCM, IEEE-float, and G.711 audio with
FLAC beside it (:mod:`.flac`); MP4/MOV structure parses via
:mod:`.mp4`; PDFs extract via :mod:`.pdf`; with
:func:`resize_nearest` + :func:`encode_png` completing the resize
stage. Formats that still genuinely need a codec library
(arithmetic-coded JPEG, lossy video/audio essence) plug into the
same kernel slots. :func:`media_features`
additionally keeps a deterministic byte-level extractor so the
multimodal plumbing stays oracle-checkable from the text corpus
(byte length + rolling checksum are engine-independent).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col

#: schema of the typed metadata struct carried beside media bytes
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, checksum bigint"


def as_media(
    df: DataFrame,
    bytes_col: ColumnLike,
    media_type: str,
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Wrap a binary column as a media column with a metadata struct
    (unknown dims until decode → nulls)."""
    return df.select(
        _col(id_col).alias("doc_id"),
        _col(bytes_col).cast("binary").alias("media"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _png_unfilter(data, height: int, stride: int, bpp: int):
    """Reverse the per-scanline PNG filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) over the inflated IDAT stream. Filtering is
    BYTE-wise per spec: ``stride`` is the scanline length in bytes
    and ``bpp`` the filter offset (bytes per pixel, min 1 — so this
    same loop serves 8-bit, 16-bit, and sub-byte palette rows).
    Up/None are numpy-vectorized; Sub/Average/Paeth walk the row
    (their inputs are prior RECONSTRUCTED bytes of the same row —
    inherently sequential). Returns uint8 (height, stride)."""
    import numpy as np

    if len(data) != height * (stride + 1):
        raise ValueError(
            f"png: IDAT length {len(data)} != {height}x({stride}+1)"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        f = data[pos]
        row = np.frombuffer(
            data[pos + 1 : pos + 1 + stride], dtype=np.uint8
        ).copy()
        pos += 1 + stride
        if f == 0:
            rec = row
        elif f == 2:
            rec = row + prev  # uint8 wrap == mod 256
        elif f in (1, 3, 4):
            rec = row
            ri = rec.astype(np.int32)
            pi = prev.astype(np.int32)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                if f == 1:
                    rec[i] = (ri[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (ri[i] + ((a + int(pi[i])) >> 1)) & 0xFF
                else:  # Paeth
                    b = int(pi[i])
                    c = int(pi[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    rec[i] = (ri[i] + pr) & 0xFF
                ri[i] = rec[i]
        else:
            raise ValueError(f"png: unknown filter type {f}")
        out[y] = rec
        prev = out[y]
    return out


def _unpack_subbyte(rows, width: int, depth: int):
    """Unpack 1/2/4-bit packed scanlines (big-endian bit order within
    each byte, per PNG spec) into one value per pixel: uint8
    (height, width)."""
    import numpy as np

    bits = np.unpackbits(rows, axis=1)  # (h, stride*8)
    per = bits[:, : width * depth].reshape(rows.shape[0], width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (per * weights).sum(axis=2).astype(np.uint8)


#: Adam7 pass geometry (PNG spec / libpng table):
#: (row_start, col_start, row_step, col_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (0, 4, 8, 8),
    (4, 0, 8, 4),
    (0, 2, 4, 4),
    (2, 0, 4, 2),
    (0, 1, 2, 2),
    (1, 0, 2, 1),
)


def _png_rows_to_values(rows, width: int, samples: int, depth: int):
    """Packed unfiltered scanlines → (h, width, samples) uint8 raw
    sample values: 16-bit takes the big-endian high byte (round-
    toward-zero 16→8), sub-byte depths unpack to one value per pixel
    (palette indexes / unscaled gray levels — the caller applies
    palette or gray scaling)."""
    h = rows.shape[0]
    if depth == 16:
        return rows[:, 0::2][:, : width * samples].reshape(
            h, width, samples
        )
    if depth in (1, 2, 4):
        return _unpack_subbyte(rows, width, depth)[:, :, None]
    return rows[:, : width * samples].reshape(h, width, samples)


def _decode_png(raw: bytes):
    """PNG decode: 8- and 16-bit gray/LA/RGB/RGBA, 1/2/4/8-bit
    palette (color type 3, PLTE + optional tRNS → RGBA), 1/2/4-bit
    grayscale, interlace 0 (sequential) AND 1 (Adam7 — each of the
    seven passes unfilters independently and scatters onto the
    canvas by its pass geometry; round 10). 16-bit samples
    down-convert to their high byte — pixels are always uint8
    (H, W, C); the source precision is reported in ``bit_depth``."""
    import struct
    import zlib

    import numpy as np

    pos = len(_PNG_SIG)
    width = height = None
    depth = color = None
    plte = None
    trns = None
    idat = b""
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if interlace not in (0, 1):
                raise ValueError(
                    f"png: unknown interlace method {interlace}"
                )
            if color in _PNG_CHANNELS and depth not in (8, 16):
                if not (color == 0 and depth in (1, 2, 4)):
                    raise ValueError(
                        f"png: unsupported bit depth {depth} for "
                        f"color type {color}"
                    )
            elif color == 3:
                if depth not in (1, 2, 4, 8):
                    raise ValueError(
                        f"png: unsupported bit depth {depth} for "
                        "palette"
                    )
            elif color not in _PNG_CHANNELS:
                raise ValueError(f"png: unsupported color type {color}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color == 3:
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    samples = 1 if color == 3 else _PNG_CHANNELS[color]
    bpp = max(1, (samples * depth) // 8)
    data = zlib.decompress(idat)
    if interlace:  # Adam7: seven independently-filtered sub-images
        vals = np.zeros((height, width, samples), dtype=np.uint8)
        pos2 = 0
        for rs, cs, rstep, cstep in _ADAM7:
            pw = (width - cs + cstep - 1) // cstep
            ph = (height - rs + rstep - 1) // rstep
            if pw <= 0 or ph <= 0:  # empty pass emits no bytes
                continue
            stride_p = (pw * samples * depth + 7) // 8
            seg = data[pos2 : pos2 + ph * (stride_p + 1)]
            pos2 += ph * (stride_p + 1)
            rows_p = _png_unfilter(seg, ph, stride_p, bpp)
            vals[rs::rstep, cs::cstep] = _png_rows_to_values(
                rows_p, pw, samples, depth
            )
        if pos2 != len(data):
            raise ValueError("png: IDAT length mismatch (adam7)")
    else:
        stride = (width * samples * depth + 7) // 8
        rows = _png_unfilter(data, height, stride, bpp)
        vals = _png_rows_to_values(rows, width, samples, depth)
    if color == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        idx = vals[:, :, 0]
        if idx.max(initial=0) >= len(plte):
            raise ValueError("png: palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            pixels = np.concatenate([rgb, alpha[idx][..., None]], axis=2)
            mode, ch = "RGBA", 4
        else:
            pixels, mode, ch = rgb, "RGB", 3
    elif depth in (1, 2, 4):  # grayscale sub-byte
        scale = 255 // ((1 << depth) - 1)  # 1→255, 2→85, 4→17: exact
        pixels = (vals[:, :, 0] * np.uint8(scale))[..., None]
        mode, ch = "L", 1
    else:  # 8-bit direct, or 16-bit already high-byte converted
        pixels = vals
        mode, ch = _PNG_MODE[color], samples
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "mode": mode,
        "bit_depth": int(depth),
        "pixels": pixels,
    }


def _decode_pnm(raw: bytes):
    """P5 (gray) / P6 (RGB) binary PNM. maxval > 255 means 2-byte
    big-endian samples (16-bit); those down-convert to the high byte,
    same contract as 16-bit PNG."""
    import numpy as np

    tokens: list[bytes] = []
    pos = 2  # past magic
    while len(tokens) < 3 and pos < len(raw):
        c = raw[pos : pos + 1]
        if c == b"#":  # comment to EOL
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(raw) and not raw[pos : pos + 1].isspace():
                pos += 1
            tokens.append(raw[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 65535:
        raise ValueError(f"pnm: maxval {maxval} out of spec")
    wide = maxval > 255
    ch = 3 if raw[:2] == b"P6" else 1
    need = width * height * ch * (2 if wide else 1)
    body = raw[pos : pos + need]
    if len(body) != need:
        raise ValueError(f"pnm: body {len(body)} != {need}")
    arr = np.frombuffer(body, dtype=np.uint8)
    if wide:
        arr = arr[0::2]  # big-endian high byte
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "mode": "RGB" if ch == 3 else "L",
        "bit_depth": 16 if wide else 8,
        "pixels": arr.reshape(height, width, ch),
    }


def decode_image(raw: bytes) -> dict:
    """Zero-dependency image decode (round-6: the former stub is now
    a real decoder — no codec libraries exist in this container, but
    PNG needs only stdlib ``zlib`` and PNM none at all).

    Supports: PNG (8/16-bit gray/gray+alpha/RGB/RGBA, 1/2/4-bit
    grayscale, 1/2/4/8-bit palette with optional tRNS transparency,
    sequential AND Adam7-interlaced — all five scanline filters,
    round 10 for Adam7), binary PNM (P5/P6,
    8- and 16-bit), and — rounds 8/9 (VERDICT items) — baseline
    sequential AND progressive JPEG (grayscale + YCbCr, sampling
    factors 1–2 per axis so 4:4:4/4:2:2/4:2:0 all decode, restart
    markers, 8/16-bit quant tables, spectral selection + successive
    approximation; see :mod:`.jpeg`). 16-bit samples down-convert to
    their high byte; ``bit_depth`` reports the source precision.
    Returns ``{"width", "height", "channels", "mode", "bit_depth",
    "pixels": uint8 ndarray (H, W, C)}``. Unsupported/unknown
    formats raise ``ValueError`` (arithmetic-coded JPEG, video
    containers, etc. — plug PIL/cv2 into the same kernel slot in a
    full deployment; the entropy/unfilter loops are where a SIMD
    codec would slot for hot-path throughput)."""
    if raw[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(raw)
    if raw[:2] in (b"P5", b"P6"):
        return _decode_pnm(raw)
    if raw[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return decode_jpeg(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        from .gifbmp import decode_gif

        return decode_gif(raw)
    if raw[:2] == b"BM":
        from .gifbmp import decode_bmp

        return decode_bmp(raw)
    if raw[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        from .tiff import decode_tiff

        return decode_tiff(raw)
    raise ValueError(
        f"decode_image: unrecognized format (magic {raw[:4]!r}); "
        "PNG, binary PNM, JPEG (baseline+progressive), GIF, BMP, and "
        "TIFF are supported without codec libraries"
    )


def encode_png(pixels, interlace: bool = False) -> bytes:
    """Minimal PNG encoder (filter 0, 8-bit) for uint8 ``(H, W)`` or
    ``(H, W, C)`` arrays with C in {1, 2, 3, 4} — the re-encode half
    of the resize stage. ``interlace=True`` writes Adam7 (the seven
    passes in spec order, each scanline filter 0) — the fixture half
    of the round-10 interlaced decode path."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0
    )
    if interlace:
        parts = []
        for rs, cs, rstep, cstep in _ADAM7:
            sub = px[rs::rstep, cs::cstep]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(
                b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])
            )
        scan = b"".join(parts)
    else:
        scan = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels, target_w: int, target_h: int):
    """Nearest-neighbor resize (pixel-center sampling) via pure numpy
    fancy indexing — the default pixel kernel for
    :func:`resize_images`."""
    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    ys = np.minimum(
        ((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64), h - 1
    )
    xs = np.minimum(
        ((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64), w - 1
    )
    return pixels[ys][:, xs]


def media_features(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Deterministic byte-level feature extraction via ``mapInPandas``
    — the stand-in for decode+featurize with identical plumbing.

    Features: payload size and a base-257 rolling checksum mod
    2^31−1 (both reproducible in SQL from the source text, so the
    whole multimodal path is oracle-checkable)."""
    import numpy as np
    import pandas as pd

    P = (1 << 31) - 1

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            datas = [bytes(r) if r is not None else b"" for r in b[media_col]]
            texts = [d.decode("utf-8") for d in datas]
            n = len(texts)
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            maxlen = int(lens.max()) if n else 0
            # code-point matrix via utf-32 reinterpretation (no per-char
            # Python); Horner fold vectorized ACROSS docs, sequential
            # only over positions. acc·257 + cp < 2^41 — exact in int64.
            mat = np.zeros((n, maxlen), dtype=np.int64)
            for i, t in enumerate(texts):
                if t:
                    mat[i, : len(t)] = np.frombuffer(
                        t.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
            acc = np.zeros(n, dtype=np.int64)
            for j in range(maxlen):
                stepped = (acc * 257 + mat[:, j]) % P
                acc = np.where(j < lens, stepped, acc)
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].to_numpy(),
                    "n_bytes": np.array([len(d) for d in datas], dtype=np.int32),
                    "checksum": acc,
                }
            )

    return df.select(id_col, media_col).mapInPandas(extract, schema=FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, mode string, "
    "n_bytes int, ok boolean, err string"
)


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """REAL decoded image metadata via ``mapInPandas``: per image,
    :func:`decode_image` dimensions/channels/mode. Undecodable rows
    (unknown format, truncated stream) yield ``ok=false`` with the
    error text instead of failing the stage — at corpus scale a
    poison image must never kill the pipeline; filter ``ok`` and
    route failures to a quarantine sink. Bytes never shuffle: the
    stage consumes the binary column where it lives and emits only
    the small typed feature row. ``passthrough`` names extra input
    columns copied onto the output (metadata rides WITH the feature
    row instead of a corpus-scale join back afterwards — at 100 TB
    the join-back is the expensive anti-pattern)."""
    import pandas as pd

    extra = list(passthrough or [])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, (doc_id, raw) in enumerate(zip(b[id_col], b[media_col])):
                data = bytes(raw) if raw is not None else b""
                tail = tuple(b[c].iloc[i] for c in extra)
                try:
                    d = decode_image(data)
                    rows.append(
                        (doc_id, d["width"], d["height"], d["channels"],
                         d["mode"], len(data), True, None) + tail
                    )
                except Exception as e:
                    rows.append(
                        (doc_id, None, None, None, None, len(data),
                         False, f"{type(e).__name__}: {e}") + tail
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels", "mode",
                    "n_bytes", "ok", "err", *extra,
                ],
            )

    schema = IMAGE_FEATURE_SCHEMA
    if extra:
        by_name = {f.name: f for f in df.schema.fields}
        from pyspark.sql.types import StructType

        tail_schema = StructType([by_name[c] for c in extra])
        schema = IMAGE_FEATURE_SCHEMA + ", " + ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in tail_schema
        )
    return df.select(id_col, media_col, *extra).mapInPandas(
        extract, schema=schema
    )


def frame_sample_plan(
    df: DataFrame, every_n: int, id_col: ColumnLike = "doc_id"
) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame index
    based on metadata (``n_frames``), without decoding — the shape of
    a video pipeline stage where the decode kernel is pluggable.
    Rows explode JVM-side; the stub keeps frames as (doc_id, frame_idx)."""
    return df.select(
        _col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_plan(
    df: DataFrame,
    target_w: int,
    target_h: int,
    keep_aspect: bool = True,
) -> DataFrame:
    """Resize *plan*: per-image output dimensions + scale factor from
    METADATA only (no decode, pure Column math). With ``keep_aspect``
    the image letterboxes into the target (scale = min of the two
    ratios, rounded output dims); otherwise dims are exactly the
    target. Unknown source dims (null width/height) pass through as
    nulls — the decode stage resolves them at kernel time.

    This is the JVM half of a resize stage; pair with
    :func:`resize_images` for the (pluggable) pixel kernel.
    """
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    if keep_aspect:
        scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
        out_w = F.round(w * scale).cast("int")
        out_h = F.round(h * scale).cast("int")
    else:
        scale = F.lit(None).cast("double")
        out_w, out_h = F.lit(target_w), F.lit(target_h)
    return df.withColumn(
        "resize",
        F.struct(
            out_w.alias("out_w"), out_h.alias("out_h"), scale.alias("scale")
        ),
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    kernel=None,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Arrow-batched resize stage: bytes → ``kernel(raw, w, h)`` →
    resized bytes. The default kernel is the REAL zero-dependency
    path: :func:`decode_image` (PNG/PNM) → :func:`resize_nearest` →
    :func:`encode_png`; pass ``kernel=`` to plug a codec-library
    implementation (JPEG, SIMD resizers) with the same signature.
    Output schema ``(doc_id, media binary)``; bytes stay
    executor-side, only metadata shuffles downstream.
    """
    import pandas as pd

    def default_kernel(raw: bytes, w: int, h: int) -> bytes:
        return encode_png(resize_nearest(decode_image(raw)["pixels"], w, h))

    k = kernel if kernel is not None else default_kernel

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = [k(bytes(b), target_w, target_h) for b in pdf[media_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col], "media": out})

    return df.select(id_col, media_col).mapInPandas(
        run, schema="doc_id bigint, media binary"
    )


def _ulaw_table():
    """ITU-T G.711 µ-law byte → int16 expansion table (the CCITT
    reference ``ulaw2linear`` formula, vectorized)."""
    import numpy as np

    u = ~np.arange(256, dtype=np.int64) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_table():
    """ITU-T G.711 A-law byte → int16 expansion table (the CCITT
    reference ``alaw2linear`` formula, vectorized)."""
    import numpy as np

    a = np.arange(256, dtype=np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0, t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_wav_g711(samples, sample_rate: int = 8000, law: str = "ulaw") -> bytes:
    """G.711 WAV encoder (format 7 µ-law / 6 A-law) for int16
    ``(frames,)`` or ``(frames, channels)`` arrays — the fixture
    half of the round-10 telephony-audio decode path. Compression
    picks, per sample, the law byte whose expansion is NEAREST the
    input (exact inverse of the decode table — so expand(compress(x))
    is the canonical G.711 quantization of x)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    frames, ch = arr.shape
    table = _ulaw_table() if law == "ulaw" else _alaw_table()
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int64)
    idx = np.searchsorted(sorted_vals, arr.astype(np.int64).reshape(-1))
    idx = np.clip(idx, 0, 255)
    lo = np.clip(idx - 1, 0, 255)
    take_lo = np.abs(sorted_vals[lo] - arr.reshape(-1)) <= np.abs(
        sorted_vals[idx] - arr.reshape(-1)
    )
    best = np.where(take_lo, lo, idx)
    payload = order[best].astype(np.uint8).tobytes()
    fmt_code = 7 if law == "ulaw" else 6
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, fmt_code, ch, sample_rate,
            sample_rate * ch, ch, 8,
        )
        + b"data"
        + struct.pack("<I", len(payload))
    )
    return hdr + payload


def decode_wav(raw: bytes) -> dict:
    """Zero-dependency WAV decode (round 7 — the audio analog of the
    round-6 PNG unstub: RIFF/WAVE needs only ``struct`` + numpy):
    integer PCM (format 1: 8-bit unsigned, 16-bit signed LE) and —
    since round 8 (VERDICT r7 item 6) — IEEE float (format 3: 32/64
    bit), the most common real-corpus variant after PCM, any channel
    count in all cases. Float samples convert to the int16 domain
    (clip [-1, 1] → round(v · 32767)) so every downstream consumer
    sees ONE integer sample type; ``bit_depth`` reports the SOURCE
    precision and ``audio_format`` the source codec. Returns
    ``{"sample_rate", "n_channels", "bit_depth", "audio_format",
    "n_samples", "samples": int16/uint8 ndarray (frames, channels)}``.
    Compressed codecs (ADPCM, mp3-in-RIFF, …) raise ``ValueError``
    (they genuinely need a codec library — same pluggable-kernel
    contract as JPEG)."""
    import struct

    import numpy as np

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (clen,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format == 1 and bits == 16:
        arr = np.frombuffer(
            data[: len(data) - (len(data) % (2 * n_channels))], "<i2"
        )
    elif audio_format == 1 and bits == 8:
        arr = np.frombuffer(
            data[: len(data) - (len(data) % n_channels)], np.uint8
        )
    elif audio_format == 3 and bits in (32, 64):
        width = bits // 8
        fl = np.frombuffer(
            data[: len(data) - (len(data) % (width * n_channels))],
            "<f4" if bits == 32 else "<f8",
        )
        arr = np.round(np.clip(fl, -1.0, 1.0) * 32767.0).astype(np.int16)
    elif audio_format in (6, 7) and bits == 8:
        # G.711 A-law (6) / µ-law (7) — round 10: the telephony/
        # call-center corpus formats; pure 256-entry table expansion
        table = _alaw_table() if audio_format == 6 else _ulaw_table()
        arr = table[
            np.frombuffer(
                data[: len(data) - (len(data) % n_channels)], np.uint8
            )
        ]
    elif audio_format == 1:
        raise ValueError(f"wav: PCM bit depth {bits} unsupported")
    elif audio_format == 3:
        raise ValueError(f"wav: float bit depth {bits} unsupported")
    elif audio_format in (6, 7):
        raise ValueError(f"wav: G.711 bit depth {bits} unsupported")
    else:
        raise ValueError(
            f"wav: compressed format {audio_format} unsupported"
        )
    frames = len(arr) // n_channels if n_channels else 0
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "bit_depth": int(bits),
        "audio_format": int(audio_format),
        "n_samples": int(frames),
        "samples": arr[: frames * n_channels].reshape(frames, n_channels),
    }


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Minimal PCM-16 WAV encoder for int16 ``(frames,)`` or
    ``(frames, channels)`` arrays — the produce half of the audio
    round-trip (and the synthetic-corpus generator's backend)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    frames, ch = arr.shape
    payload = arr.astype("<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16,
            1,
            ch,
            sample_rate,
            sample_rate * ch * 2,
            ch * 2,
            16,
        )
        + b"data"
        + struct.pack("<I", len(payload))
    )
    return hdr + payload


def encode_wav_float(samples, sample_rate: int = 16000) -> bytes:
    """IEEE-float (format 3, 32-bit) WAV encoder for float ``(frames,)``
    or ``(frames, channels)`` arrays in [-1, 1] — fixture/synthesis
    backend for the float decode path (:func:`decode_wav` format 3)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    frames, ch = arr.shape
    payload = arr.astype("<f4").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16,
            3,
            ch,
            sample_rate,
            sample_rate * ch * 4,
            ch * 4,
            32,
        )
        + b"data"
        + struct.pack("<I", len(payload))
    )
    return hdr + payload


def synthesize_wav_from_text(
    df: DataFrame,
    text: ColumnLike = "text",
    id_col: ColumnLike = "doc_id",
    sample_rate: int = 16000,
    max_samples: int = 2048,
    container: str = "wav",
) -> DataFrame:
    """Deterministic synthetic audio corpus: per doc, a REAL mono
    clip whose samples derive from the text's code points
    (``((cp · 2654435761) mod 65536) − 32768`` — exact BIGINT math,
    reproducible in SQL), truncated at ``max_samples``.
    ``container``: "wav" (PCM-16 RIFF), "flac" (round 10 — the
    lossless codec, same exact samples), or "mixed" (doc_id % 2
    alternates, so ONE oracle gates both decode paths — the signal
    stats are container-invariant by losslessness). This is the
    audio analog of the multimodal text-bytes fixture: it gives the
    decode/feature plumbing a value-level oracle without shipping
    binary fixtures."""
    import numpy as np
    import pandas as pd

    from .flac import encode_flac

    name_id = id_col if isinstance(id_col, str) else "doc_id"

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            wavs = []
            for did, t in zip(b[name_id], b["_t"]):
                t = (t or "")[: int(max_samples)]
                codes = (
                    np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                    .astype(np.int64)
                )
                v = ((codes * 2654435761) % 65536 - 32768).astype(np.int16)
                use_flac = container == "flac" or (
                    container == "mixed" and did % 2 == 1
                )
                wavs.append(
                    encode_flac(v.astype(np.int64), sample_rate)
                    if use_flac
                    else encode_wav(v, sample_rate)
                )
            yield pd.DataFrame(
                {name_id: b[name_id].to_numpy(), "media": wavs}
            )

    return df.select(
        _col(id_col).alias(name_id), _col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{name_id} bigint, media binary")


def synthesize_image_from_text(
    df: DataFrame,
    text: ColumnLike = "text",
    id_col: ColumnLike = "doc_id",
    fmt: "ColumnLike | str" = "png",
    size: tuple[int, int] | None = None,
    quality: int = 90,
) -> DataFrame:
    """Deterministic synthetic image corpus — the image analog of
    :func:`synthesize_wav_from_text`: per doc, REAL container bytes
    (PNG or baseline JPEG) whose pixels derive from the text's code
    points, so the decode plumbing gets a value-level oracle without
    shipping binary fixtures.

    Dimensions: ``size=(w, h)`` fixed, else text-derived
    ``w = 8 + len(text) % 9``, ``h = 8 + len(text) % 7`` (both
    SQL-reproducible). Pixel ``j`` (row-major), channel ``c``:
    ``((cp_j + 1 + c) · 2654435761) mod 256`` with ``cp_j`` the
    j-th code point (0 past the end). ``fmt`` is a per-row column
    (or constant string): ``'png'`` → RGB PNG (lossless),
    ``'pngL'`` → grayscale PNG (lossless, c = 0 only),
    ``'pngI'`` → RGB PNG with Adam7 interlace (lossless — same
    pixels as ``'png'`` through the interlaced layout, round 10),
    ``'jpeg'`` → grayscale baseline 4:4:4, ``'jpeg420'`` →
    grayscale with restart markers (the 4:2:0 layout is a chroma
    concept; for grayscale the variant exercises DRI instead),
    ``'jpegP'`` → grayscale PROGRESSIVE (SOF2, the full 4-scan-kind
    successive-approximation script — decodes bit-identically to the
    baseline encoding of the same pixels), ``'gif'`` → grayscale
    GIF89a (palette from the distinct pixel values, lossless),
    ``'bmp'`` → grayscale 8-bit-palette BMP (lossless).
    Returns ``(doc_id, fmt, media binary)``."""
    import numpy as np
    import pandas as pd

    from .gifbmp import encode_bmp, encode_gif
    from .jpeg import encode_jpeg_baseline, encode_jpeg_progressive

    name_id = id_col if isinstance(id_col, str) else "doc_id"
    fmt_col = F.lit(fmt) if isinstance(fmt, str) else _col(fmt)

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            medias = []
            for t, f in zip(b["_t"], b["_fmt"]):
                t = t or ""
                if size is not None:
                    w, h = size
                else:
                    w, h = 8 + len(t) % 9, 8 + len(t) % 7
                n = w * h
                cps = np.zeros(n, dtype=np.int64)
                m = min(len(t), n)
                if m:
                    cps[:m] = np.frombuffer(
                        t[:m].encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                if f in ("png", "pngL", "pngI"):
                    nch = 3 if f in ("png", "pngI") else 1
                    chans = [
                        (((cps + 1 + c) * 2654435761) % 256).astype(np.uint8)
                        for c in range(nch)
                    ]
                    px = np.stack(chans, axis=1).reshape(h, w, nch)
                    medias.append(encode_png(px, interlace=f == "pngI"))
                else:
                    gray = (((cps + 1) * 2654435761) % 256).astype(
                        np.uint8
                    ).reshape(h, w)
                    if f == "jpegP":
                        medias.append(
                            encode_jpeg_progressive(gray, quality=quality)
                        )
                    elif f == "gif":
                        medias.append(encode_gif(gray))
                    elif f == "bmp":
                        medias.append(encode_bmp(gray))
                    elif f == "tiff":
                        from .tiff import encode_tiff

                        medias.append(
                            encode_tiff(gray, compression="lzw")
                        )
                    else:
                        medias.append(
                            encode_jpeg_baseline(
                                gray,
                                quality=quality,
                                restart_interval=2 if f == "jpeg420" else 0,
                            )
                        )
            yield pd.DataFrame(
                {
                    name_id: b[name_id].to_numpy(),
                    "fmt": b["_fmt"].to_numpy(),
                    "media": medias,
                }
            )

    return df.select(
        _col(id_col).alias(name_id),
        _col(text).alias("_t"),
        fmt_col.alias("_fmt"),
    ).mapInPandas(
        synth, schema=f"{name_id} bigint, fmt string, media binary"
    )


AHASH_SCHEMA = (
    "doc_id bigint, px_sum bigint, ahash string, ok boolean, err string"
)


def image_ahash(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint — the classic
    near-duplicate-image signal: decode → drop alpha → integer
    grayscale (floor channel mean) → 8×8 nearest resize →
    64-bit hash where bit ``j`` (row-major, MSB first) is set iff
    ``px_j · 64 > Σpx`` (strictly above the mean — integer-exact,
    no float in the hash). Returns ``(doc_id, px_sum, ahash)`` with
    ``ahash`` a 64-char '0'/'1' string (engine-portable; group or
    band it for bucketed near-dup joins exactly like simhash).
    Poison rows quarantine with ``ok=false``. Bytes never shuffle —
    only the 64-bit signature row crosses back; at corpus scale the
    hash groupBy is digest-width, same posture as exact dedup."""
    import numpy as np
    import pandas as pd

    def extract(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            rows = []
            for doc_id, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    d = decode_image(data)
                    px = d["pixels"].astype(np.int64)
                    if d["channels"] == 4:
                        px = px[:, :, :3]
                    elif d["channels"] == 2:
                        px = px[:, :, :1]
                    gray = px.sum(axis=2) // px.shape[2]
                    g8 = resize_nearest(gray, 8, 8).reshape(64)
                    s = int(g8.sum())
                    bits = "".join(
                        "1" if int(v) * 64 > s else "0" for v in g8
                    )
                    rows.append((doc_id, s, bits, True, None))
                except Exception as e:
                    rows.append(
                        (doc_id, None, None, False,
                         f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "px_sum", "ahash", "ok", "err"],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=AHASH_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, bit_depth int, "
    "n_samples bigint, peak int, sum_sq bigint, zero_crossings bigint, "
    "ok boolean, err string"
)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """REAL decoded audio features via ``mapInPandas``: per clip,
    :func:`decode_wav` (RIFF/WAVE: PCM, IEEE float, G.711) or —
    round 10, routed by the ``fLaC`` magic per row —
    :func:`..flac.decode_flac` header fields plus first-channel
    signal stats — peak amplitude, exact int64 energy (Σ v²), and
    strict zero-crossing count. Poison rows (truncated/unknown
    codec) yield ``ok=false`` + the error instead of failing the
    stage, the same quarantine contract as :func:`image_features`.
    Bytes never shuffle; only the typed feature row crosses back."""
    import numpy as np
    import pandas as pd

    from .flac import decode_flac

    def extract(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            rows = []
            for doc_id, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    d = (
                        decode_flac(data)
                        if data[:4] == b"fLaC"
                        else decode_wav(data)
                    )
                    v = d["samples"][:, 0].astype(np.int64)
                    peak = int(np.abs(v).max()) if len(v) else 0
                    sum_sq = int((v * v).sum())
                    zc = (
                        int(((v[1:] * v[:-1]) < 0).sum()) if len(v) > 1 else 0
                    )
                    rows.append(
                        (doc_id, d["sample_rate"], d["n_channels"],
                         d["bit_depth"], d["n_samples"], peak, sum_sq, zc,
                         True, None)
                    )
                except Exception as e:
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None,
                         False, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "bit_depth",
                    "n_samples", "peak", "sum_sq", "zero_crossings",
                    "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=AUDIO_FEATURE_SCHEMA
    )


def audio_chunk_plan(
    df: DataFrame,
    window_s: float,
    hop_s: float,
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Audio windowing *plan*: one row per (doc, chunk start-sample)
    from metadata (``sample_rate`` × assumed duration from
    ``n_frames``), no decode. Mirrors :func:`frame_sample_plan` for
    the audio modality; the sample-extraction kernel is pluggable."""
    sr = F.coalesce(F.col("meta.sample_rate"), F.lit(16000))
    total = F.coalesce(F.col("meta.n_frames"), F.lit(1)).cast("long")
    win = (sr.cast("double") * window_s).cast("long")
    hop = (sr.cast("double") * hop_s).cast("long")
    return df.select(
        _col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(total - win, F.lit(0).cast("long")),
                hop,
            )
        ).alias("start_sample"),
        win.alias("window_samples"),
    )


def split_mjpeg(raw: bytes) -> list[tuple[int, int]]:
    """Frame boundaries of an MJPEG elementary stream (concatenated
    baseline JPEGs — the payload shape of multipart/x-mixed-replace
    MJPEG and of MJPEG-in-AVI chunks). Walks each frame by its real
    marker structure — segment lengths for header markers, a
    stuffing-aware scan from SOS to EOI — so frames split correctly
    even when APPn payloads contain 0xFFD9-looking bytes. Returns
    ``[(offset, length), ...]``; raises ``ValueError`` on a stream
    that does not start with SOI or whose last frame is truncated."""
    import struct

    frames = []
    pos = 0
    n = len(raw)
    while pos < n:
        start = pos
        if raw[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"mjpeg: expected SOI at offset {pos}")
        pos += 2
        in_scan = False
        while True:
            if in_scan:
                # stuffing-aware scan: FF 00 = literal, FF D0-D7 =
                # restart, anything else is a real marker
                if pos + 1 >= n:
                    raise ValueError("mjpeg: truncated entropy stream")
                if raw[pos] != 0xFF:
                    pos += 1
                    continue
                nxt = raw[pos + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos += 2
                    continue
                in_scan = False
                continue
            if pos + 2 > n:
                raise ValueError("mjpeg: truncated frame header")
            if raw[pos] != 0xFF:
                raise ValueError(f"mjpeg: expected marker at {pos}")
            marker = raw[pos + 1]
            if marker == 0xD9:  # EOI — frame complete
                pos += 2
                frames.append((start, pos - start))
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if pos + 4 > n:
                raise ValueError("mjpeg: truncated segment header")
            (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
            pos += 2 + seglen
            if marker == 0xDA:  # SOS
                in_scan = True
    return frames


def synthesize_video_from_text(
    df: DataFrame,
    text: ColumnLike = "text",
    id_col: ColumnLike = "doc_id",
    max_frames: int = 5,
    quality: int = 88,
) -> DataFrame:
    """Deterministic synthetic video corpus: per doc, a REAL MJPEG
    stream of ``1 + len(text) % max_frames`` grayscale 8×8 JPEG
    frames whose pixels derive from the text's code points shifted
    by the frame index (``((cp_j + 1 + 7·frame) · 2654435761) mod
    256``) — the video analog of the image/audio synthesizers, so
    frame counting and sampled decode have a value-level oracle.
    Returns ``(doc_id, n_frames, media binary)``."""
    import numpy as np
    import pandas as pd

    from .jpeg import encode_jpeg_baseline

    name_id = id_col if isinstance(id_col, str) else "doc_id"

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            medias, counts = [], []
            for t in b["_t"]:
                t = t or ""
                nf = 1 + len(t) % int(max_frames)
                cps = np.zeros(64, dtype=np.int64)
                m = min(len(t), 64)
                if m:
                    cps[:m] = np.frombuffer(
                        t[:m].encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                stream = b"".join(
                    encode_jpeg_baseline(
                        (((cps + 1 + 7 * f) * 2654435761) % 256)
                        .astype(np.uint8)
                        .reshape(8, 8),
                        quality=quality,
                    )
                    for f in range(nf)
                )
                medias.append(stream)
                counts.append(nf)
            yield pd.DataFrame(
                {
                    name_id: b[name_id].to_numpy(),
                    "n_frames": counts,
                    "media": medias,
                }
            )

    return df.select(
        _col(id_col).alias(name_id), _col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{name_id} bigint, n_frames int, media binary")


def synthesize_gif_from_text(
    df: DataFrame,
    text: ColumnLike = "text",
    id_col: ColumnLike = "doc_id",
    max_frames: int = 5,
) -> DataFrame:
    """Deterministic synthetic ANIMATED-GIF corpus (round 10): per
    doc a real GIF89a animation of ``1 + len(text) % max_frames``
    full-canvas 8×8 grayscale frames whose pixels use the same
    text-derived formula as :func:`synthesize_video_from_text`
    (``((cp_j + 1 + 7·frame) · 2654435761) mod 256``). GIF is
    LOSSLESS, so unlike the JPEG-based video corpus the composited
    pixel VALUES are SQL-replayable — the gif_frames oracle pins
    ``px_sum`` exactly, gating LZW, palette expansion, compositing,
    and the sampling arithmetic in one query. Returns ``(doc_id,
    n_frames, media binary)``."""
    import numpy as np
    import pandas as pd

    from .gifbmp import encode_gif_animation

    name_id = id_col if isinstance(id_col, str) else "doc_id"

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            medias, counts = [], []
            for t in b["_t"]:
                t = t or ""
                nf = 1 + len(t) % int(max_frames)
                cps = np.zeros(64, dtype=np.int64)
                m = min(len(t), 64)
                if m:
                    cps[:m] = np.frombuffer(
                        t[:m].encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                frames = [
                    (((cps + 1 + 7 * f) * 2654435761) % 256)
                    .astype(np.uint8)
                    .reshape(8, 8)
                    for f in range(nf)
                ]
                medias.append(encode_gif_animation(frames))
                counts.append(nf)
            yield pd.DataFrame(
                {
                    name_id: b[name_id].to_numpy(),
                    "n_frames": counts,
                    "media": medias,
                }
            )

    return df.select(
        _col(id_col).alias(name_id), _col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{name_id} bigint, n_frames int, media binary")


VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, width int, height int, "
    "mode string, frame_bytes int, px_sum bigint, ok boolean, err string"
)


def video_frame_features(
    df: DataFrame,
    every_n: int = 1,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL video decode for the two containers a zero-dependency
    engine can carry: MJPEG elementary streams (split by marker
    structure — :func:`split_mjpeg` — each sampled frame through the
    baseline JPEG decoder) and, round 10, ANIMATED GIF (full
    disposal compositing — :func:`..gifbmp.decode_gif_frames` — each
    sampled row is the canvas-sized RGBA composite). The container
    is sniffed per row from magic bytes, so one mixed media column
    fans out to both paths. One typed row per SAMPLED frame with the
    stream's total frame count and the frame's integer pixel sum
    (``px_sum`` — summed over all channels; exact for the lossless
    GIF path, hence SQL-oracle-able). Quarantine is per-FRAME for
    MJPEG (a poison frame yields its own ``ok=false`` row while
    siblings decode) and per-STREAM for GIF (frames are deltas — a
    poison frame poisons every composite after it); an unsplittable
    or empty stream yields one ``ok=false`` row (``frame_idx =
    -1``). Bytes never shuffle — frames decode where the stream
    lives and only feature rows cross back (plug a real demuxer
    into the same kernel slot for mp4/mkv)."""
    import pandas as pd

    from .gifbmp import decode_gif_frames
    from .jpeg import decode_jpeg

    def extract(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            rows = []
            for doc_id, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                if data[:6] in (b"GIF87a", b"GIF89a"):
                    try:
                        for o in decode_gif_frames(data, every_n=every_n):
                            rows.append(
                                (doc_id, o["frame_idx"], o["n_frames"],
                                 o["width"], o["height"], "RGBA",
                                 o["byte_length"],
                                 int(o["pixels"].sum(dtype="int64")),
                                 True, None)
                            )
                    except Exception as e:
                        rows.append(
                            (doc_id, -1, None, None, None, None,
                             len(data), None, False,
                             f"{type(e).__name__}: {e}")
                        )
                    continue
                try:
                    frames = split_mjpeg(data)
                except Exception as e:
                    rows.append(
                        (doc_id, -1, None, None, None, None, len(data),
                         None, False, f"{type(e).__name__}: {e}")
                    )
                    continue
                nf = len(frames)
                if nf == 0:
                    # empty/null media splits to zero frames without
                    # raising — quarantine explicitly (frame_idx=-1)
                    # instead of silently dropping the doc, matching
                    # image_features / audio_features.
                    rows.append(
                        (doc_id, -1, 0, None, None, None, len(data),
                         None, False, "ValueError: empty stream")
                    )
                    continue
                for idx in range(0, nf, max(1, int(every_n))):
                    off, ln = frames[idx]
                    try:
                        d = decode_jpeg(data[off : off + ln])
                        rows.append(
                            (doc_id, idx, nf, d["width"], d["height"],
                             d["mode"], ln,
                             int(d["pixels"].sum(dtype="int64")),
                             True, None)
                        )
                    except Exception as e:
                        rows.append(
                            (doc_id, idx, nf, None, None, None, ln,
                             None, False, f"{type(e).__name__}: {e}")
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "width", "height",
                    "mode", "frame_bytes", "px_sum", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=VIDEO_FRAME_SCHEMA
    )


def sniff_media_type(media: ColumnLike) -> Column:
    """Container detection from magic bytes as a pure JVM expression —
    the routing stage BEFORE any decode kernel: route each row to its
    codec (or quarantine) without a Python round-trip, so a mixed
    media column fans out to per-format pipelines with zero overhead
    on the non-matching rows. Detects ``png``/``jpeg``/``pnm``/
    ``wav``/``flac``/``gif``/``bmp``/``tiff``/``mp4``/``webp``/
    ``pdf``/``ogg``/``mp3`` (ID3 or bare frame sync)/``zip``/
    ``gzip``/``warc``/``tar`` (+ ``empty``/``unknown``);
    ``jpeg`` covers MJPEG streams too (same SOI magic — use
    :func:`video_frame_features` when frame counts say video).

    hex(substring(...)) comparisons keep everything inside codegen;
    at 100 TB this predicate pushes into the scan stage and prunes
    decode work before bytes ever reach a worker kernel."""
    m = _col(media)
    hex4 = F.hex(F.substring(m, 1, 4))
    hex3 = F.hex(F.substring(m, 1, 3))
    hex2 = F.hex(F.substring(m, 1, 2))
    riff = F.hex(F.substring(m, 9, 4))
    return (
        F.when(m.isNull() | (F.length(m) == 0), F.lit("empty"))
        .when(hex4 == F.lit("89504E47"), F.lit("png"))
        .when(hex3 == F.lit("FFD8FF"), F.lit("jpeg"))
        .when(hex2.isin("5035", "5036"), F.lit("pnm"))  # P5 / P6
        .when(
            (hex4 == F.lit("52494646")) & (riff == F.lit("57415645")),
            F.lit("wav"),
        )
        .when(hex3 == F.lit("474946"), F.lit("gif"))
        .when(hex2 == F.lit("424D"), F.lit("bmp"))
        .when(
            hex4.isin("49492A00", "4D4D002A"), F.lit("tiff")
        )
        .when(hex4 == F.lit("664C6143"), F.lit("flac"))
        .when(
            F.hex(F.substring(m, 5, 4)) == F.lit("66747970"),
            F.lit("mp4"),  # ISO BMFF: 'ftyp' at offset 4
        )
        .when(
            (hex4 == F.lit("52494646")) & (riff == F.lit("57454250")),
            F.lit("webp"),
        )
        .when(hex4 == F.lit("25504446"), F.lit("pdf"))  # %PDF
        .when(hex4 == F.lit("4F676753"), F.lit("ogg"))  # OggS
        .when(hex3 == F.lit("494433"), F.lit("mp3"))  # ID3
        .when(
            # bare MPEG audio frame sync: FF Ex / FF Fx (FFD8 jpeg
            # already matched above)
            F.substring(hex2, 1, 3).isin("FFE", "FFF"),
            F.lit("mp3"),
        )
        .when(hex4 == F.lit("504B0304"), F.lit("zip"))
        .when(hex2 == F.lit("1F8B"), F.lit("gzip"))
        .when(hex4 == F.lit("57415243"), F.lit("warc"))  # WARC
        .when(
            F.hex(F.substring(m, 258, 5)) == F.lit("7573746172"),
            F.lit("tar"),  # 'ustar' at offset 257 (0-based)
        )
        .otherwise(F.lit("unknown"))
    )


# ---------------------------------------------------------------------
# AV sidecar pairing (round 13): WebDataset media + transcript samples
# ---------------------------------------------------------------------

AV_SAMPLE_SCHEMA = (
    "shard string, key string, n_members int, paired boolean, "
    "kind string, width int, height int, duration_s double, "
    "n_chars int, text string, ok boolean, err string"
)


def synthesize_av_tar_from_text(df, text="text", id_col="doc_id"):
    """Deterministic AV-corpus fixture (round 13): per doc ONE
    in-memory WebDataset tar shard holding the sample's members
    under the shared basename key ``d{doc_id}`` — a metadata-only
    MP4 (``synthesize_mp4_from_text``'s field formulas over the
    NORMALIZED text length) and a transcript sidecar (SRT for even
    doc_ids, WebVTT for odd, cues = words round-robin exactly like
    the subtitles gate). Sparse samples pin the pairing contract:
    every ``doc_id % 17 == 3`` doc OMITS its transcript, every
    ``doc_id % 19 == 5`` doc omits its media, and every ``doc_id %
    23 == 7`` doc's mp4 member is a POISON blob (no ftyp) so the
    per-sample typed quarantine gates too. Input normalization is
    the subtitles family's (markup specials + the shared divergent
    set → ``-``). Returns ``(doc_id, shard, data binary)``."""
    import io as _io
    import re as _re
    import tarfile as _tarfile

    from . import mp4 as _mp4
    from . import subtitles as _st
    from . import web as _web

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, shards, datas = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = _re.sub(r"[<>{}&]", "-", t)
                t = _re.sub(r"\s+", " ", t, flags=_re.ASCII).strip()
                n = len(t)
                nu = 1 + n % 3
                words = t.split(" ")
                nu = min(nu, len(words))
                cues = [" ".join(words[i::nu]) for i in range(nu)]
                buf = _io.BytesIO()
                with _tarfile.open(fileobj=buf, mode="w") as tf:
                    def add(name: str, payload: bytes) -> None:
                        info = _tarfile.TarInfo(name)
                        info.size = len(payload)
                        tf.addfile(info, _io.BytesIO(payload))

                    if did % 19 != 5:
                        if did % 23 == 7:
                            media = b"\x00\x00\x00\x08bad!"
                        else:
                            media = _mp4.encode_mp4_skeleton(
                                [
                                    {"handler": "vide",
                                     "codec": "avc1",
                                     "width": 8 + n % 9,
                                     "height": 8 + n % 7,
                                     "n_samples": n},
                                    {"handler": "soun",
                                     "codec": "mp4a",
                                     "channels": 1 + n % 2,
                                     "sample_rate": 16000},
                                ],
                                timescale=1000,
                                duration_s=float(1 + n % 30),
                            )
                        add("d%d.mp4" % did, media)
                    if did % 17 != 3:
                        if did % 2 == 0:
                            add("d%d.srt" % did, _st.encode_srt(cues))
                        else:
                            add("d%d.vtt" % did, _st.encode_vtt(cues))
                ids.append(did)
                shards.append("d%d.tar" % did)
                datas.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": ids, "shard": shards, "data": datas}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, shard string, data binary"
    )


def av_sample_features(df, shard_col="shard", data_col="data"):
    """WebDataset AV sample pairing + extraction in ONE kernel
    (round 13): tar shard bytes → member split (the same
    ``split_tar_members`` walk the binaryFile reader uses) → group
    by basename key → per sample, parse the ``.mp4`` member's
    metadata and extract the ``.srt``/``.vtt`` sidecar's transcript.
    One typed row per sample: pairing state (``paired``,
    ``n_members``), first-video-track dims + movie duration,
    transcript kind/chars/text, and the per-sample quarantine
    (``ok=false`` with a typed reason when the media member is
    poison — the transcript still extracts).

    Scale shape: a sample's members live in the SAME tar by the
    WebDataset convention, so pairing happens inside the shard task
    — deliberately NOT the generic ``tar_samples`` pivot, which
    would shuffle media bytes just to reunite rows that were never
    apart. Bytes never cross an Exchange; only sample rows do."""

    from ..sources.archives import split_tar_members
    from . import mp4 as _mp4
    from . import subtitles as _st

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for shard, raw in zip(b[shard_col], b[data_col]):
                members = split_tar_members(
                    shard, bytes(raw) if raw is not None else b""
                )
                samples: dict[str, dict[str, bytes]] = {}
                for _, _, key, ext, data in members:
                    samples.setdefault(key, {})[ext] = data
                for key in sorted(samples):
                    exts = samples[key]
                    kind = (
                        "srt" if "srt" in exts
                        else "vtt" if "vtt" in exts
                        else None
                    )
                    sub = exts.get(kind) if kind else None
                    media = exts.get("mp4")
                    ok, err = True, None
                    width = height = dur = None
                    if media is not None:
                        try:
                            meta = _mp4.parse_mp4(media)
                            vid = next(
                                (t for t in meta["tracks"]
                                 if t["handler"] == "vide"),
                                None,
                            )
                            if vid is not None:
                                width = int(vid["width"])
                                height = int(vid["height"])
                            dur = meta["duration_s"]
                        except Exception as e:
                            ok, err = False, (
                                f"{type(e).__name__}: {e}"
                            )
                    text = n_chars = None
                    if sub is not None:
                        s = sub.decode("utf-8", "replace")
                        text = (
                            _st.srt_to_text(s)
                            if kind == "srt"
                            else _st.vtt_to_text(s)
                        )
                        n_chars = len(text)
                    rows.append(
                        (
                            shard, key, len(exts),
                            media is not None and sub is not None,
                            kind, width, height, dur, n_chars, text,
                            ok, err,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "key", "n_members", "paired", "kind",
                    "width", "height", "duration_s", "n_chars",
                    "text", "ok", "err",
                ],
            )

    return df.select(shard_col, data_col).mapInPandas(
        extract, schema=AV_SAMPLE_SCHEMA
    )
