"""EXIF metadata for JPEG images (round 10 s2).

Camera-origin corpora need EXIF before any pixel work: the
**Orientation** tag decides whether a decoded image must rotate /
flip before hashing or training (the same photo shot in portrait vs
landscape would otherwise aHash apart), and Make/Model/DateTime are
the standard provenance/routing fields. Zero dependencies: EXIF is a
TIFF byte stream inside a JPEG ``APP1`` segment, so this module
walks the IFDs directly (both byte orders), reads the handful of
tags a pipeline uses, and applies the eight canonical orientation
transforms as pure numpy index flips.

Pieces:

- :func:`parse_exif` — ``APP1 Exif`` walk: IFD0
  (Make/Model/Orientation/DateTime) + the Exif sub-IFD
  (DateTimeOriginal, PixelX/YDimension). Missing APP1 → all-None
  (EXIF is optional, not a quarantine).
- :func:`apply_orientation` — the EXIF §4.6.4 transform table
  (1 identity, 2 flip-H, 3 rot-180, 4 flip-V, 5 transpose,
  6 rot-90-CW, 7 transverse, 8 rot-90-CCW) as numpy views.
- :func:`inject_exif` — writer half: splice a minimal valid APP1
  (II byte order, IFD0 + Exif sub-IFD) right after SOI of any JPEG,
  so fixtures are SQL-replayable.
- :func:`image_exif_features` — Spark surface: typed rows with the
  post-normalization dimensions (orientations 5–8 swap W/H); bytes
  never shuffle.

Reference anchor: no analog in the reference; north-star multimodal
extension (BASELINE.json). Format: EXIF 2.3 (JEITA CP-3451) = TIFF
6.0 IFDs + tag dictionary.
"""

from __future__ import annotations

import struct

#: the tags a curation pipeline actually routes on
_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x8769: "_exif_ifd",
}
_EXIF_TAGS = {
    0x9003: "datetime_original",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(t: bytes, off: int, e: str, tag_names: dict) -> dict:
    out: dict = {}
    if off + 2 > len(t):
        raise ValueError("exif: truncated IFD")
    (count,) = struct.unpack(e + "H", t[off : off + 2])
    pos = off + 2
    if pos + 12 * count > len(t):
        raise ValueError("exif: truncated IFD entries")
    for _ in range(count):
        tag, typ, n = struct.unpack(e + "HHI", t[pos : pos + 8])
        name = tag_names.get(tag)
        size = _TYPE_SIZE.get(typ, 1) * n
        if name is not None:
            if size <= 4:
                body = t[pos + 8 : pos + 8 + size]
            else:
                (voff,) = struct.unpack(e + "I", t[pos + 8 : pos + 12])
                if voff + size > len(t):
                    raise ValueError("exif: tag value outside segment")
                body = t[voff : voff + size]
            if typ == 2:  # ASCII, NUL-terminated
                out[name] = body.split(b"\x00", 1)[0].decode(
                    "latin-1", "replace"
                )
            elif typ == 3:
                out[name] = struct.unpack(e + "H", body[:2])[0]
            elif typ == 4:
                out[name] = struct.unpack(e + "I", body[:4])[0]
        pos += 12
    return out


def parse_exif(raw: bytes) -> dict:
    """EXIF fields from a JPEG's APP1 segment: ``{orientation, make,
    model, datetime, datetime_original, pixel_x, pixel_y,
    has_exif}`` — all None (``has_exif=False``) when no APP1 Exif
    segment exists. Malformed EXIF raises ``ValueError`` (quarantine
    at the caller, per the codec-family contract)."""
    none = {
        "orientation": None, "make": None, "model": None,
        "datetime": None, "datetime_original": None,
        "pixel_x": None, "pixel_y": None, "has_exif": False,
    }
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return none
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            break
        marker = raw[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data, no more APPn
            break
        (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        if marker == 0xE1 and raw[pos + 4 : pos + 10] == b"Exif\x00\x00":
            t = raw[pos + 10 : pos + 2 + seglen]
            if len(t) < 8:
                raise ValueError("exif: truncated TIFF header")
            if t[:2] == b"II":
                e = "<"
            elif t[:2] == b"MM":
                e = ">"
            else:
                raise ValueError("exif: bad TIFF byte order")
            (ifd0_off,) = struct.unpack(e + "I", t[4:8])
            tags = _read_ifd(t, ifd0_off, e, _IFD0_TAGS)
            sub = tags.pop("_exif_ifd", None)
            if sub is not None:
                tags.update(_read_ifd(t, sub, e, _EXIF_TAGS))
            out = dict(none)
            out.update({k: v for k, v in tags.items()})
            out["has_exif"] = True
            return out
        pos += 2 + seglen
    return none


def apply_orientation(pixels, orientation: int):
    """EXIF §4.6.4 normalization: return pixels as they should be
    VIEWED (numpy index transforms, no resampling). Orientations
    5-8 swap width and height."""
    import numpy as np

    o = orientation or 1
    if o == 2:
        return pixels[:, ::-1]
    if o == 3:
        return pixels[::-1, ::-1]
    if o == 4:
        return pixels[::-1, :]
    if o == 5:
        return np.swapaxes(pixels, 0, 1)
    if o == 6:
        return np.swapaxes(pixels, 0, 1)[:, ::-1]
    if o == 7:
        return np.swapaxes(pixels, 0, 1)[::-1, ::-1]
    if o == 8:
        return np.swapaxes(pixels, 0, 1)[::-1, :]
    return pixels


def build_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    datetime_original: str | None = None,
) -> bytes:
    """A minimal valid ``APP1 Exif`` segment (II byte order, IFD0 +
    Exif sub-IFD) — the fixture half."""
    e = "<"

    def entries_for(pairs, value_base):
        """pairs: [(tag, type, value)] sorted by tag; long ASCII
        values spill after the IFD at value_base."""
        blobs = b""
        out = b""
        for tag, typ, val in sorted(pairs):
            if typ == 3:
                out += struct.pack(e + "HHIHH", tag, 3, 1, val, 0)
            elif typ == 4:
                out += struct.pack(e + "HHII", tag, 4, 1, val)
            elif typ == 2:
                data = val.encode("latin-1", "replace") + b"\x00"
                if len(data) <= 4:
                    out += struct.pack(
                        e + "HHI", tag, 2, len(data)
                    ) + data.ljust(4, b"\x00")
                else:
                    out += struct.pack(
                        e + "HHII", tag, 2, len(data),
                        value_base + len(blobs),
                    )
                    blobs += data
        return out, blobs

    exif_pairs = []
    if datetime_original:
        exif_pairs.append((0x9003, 2, datetime_original))
    ifd0_pairs = [(0x0112, 3, orientation)]
    if make:
        ifd0_pairs.append((0x010F, 2, make))
    if model:
        ifd0_pairs.append((0x0110, 2, model))
    if datetime:
        ifd0_pairs.append((0x0132, 2, datetime))

    # layout: TIFF header (8) | IFD0 | IFD0 blobs | ExifIFD | blobs
    n0 = len(ifd0_pairs) + (1 if exif_pairs else 0)
    base0 = 8 + (2 + 12 * n0 + 4)
    # the Exif-IFD pointer is inline (type LONG), so the blob run's
    # length is known before the pointer's value: one probe pass for
    # the length, one real pass with the resolved offset
    _, blobs_probe = entries_for(ifd0_pairs, base0)
    exif_off = base0 + len(blobs_probe)
    all_pairs = ifd0_pairs + (
        [(0x8769, 4, exif_off)] if exif_pairs else []
    )
    body0, blobs0 = entries_for(all_pairs, base0)
    tiff = bytearray(b"II*\x00" + struct.pack(e + "I", 8))
    tiff += struct.pack(e + "H", n0) + body0 + struct.pack(e + "I", 0)
    tiff += blobs0
    if exif_pairs:
        n1 = len(exif_pairs)
        ifd1_size = 2 + 12 * n1 + 4
        base1 = len(tiff) + ifd1_size
        body1, blobs1 = entries_for(exif_pairs, base1)
        tiff += struct.pack(e + "H", n1) + body1 + struct.pack(e + "I", 0)
        tiff += blobs1
    payload = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_exif(jpeg: bytes, **kwargs) -> bytes:
    """Splice an APP1 Exif segment right after SOI of an existing
    JPEG (fixtures; real writers put APP1 first, as this does)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    return jpeg[:2] + build_exif_app1(**kwargs) + jpeg[2:]


EXIF_SCHEMA = (
    "doc_id bigint, has_exif boolean, orientation int, make string, "
    "model string, datetime string, width int, height int, "
    "ok boolean, err string"
)


def image_exif_features(df, id_col="doc_id", media_col="media"):
    """Per-image EXIF + normalized geometry rows: parse the APP1
    segment, decode the JPEG, apply :func:`apply_orientation`, and
    report the AS-VIEWED width/height (orientations 5-8 swap the
    coded dimensions) — the pre-hash normalization step a
    camera-origin corpus runs before perceptual dedup. Bytes never
    shuffle; poison rows quarantine per doc."""
    import pandas as pd

    def extract(batches):
        from . import jpeg as J

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    x = parse_exif(data)
                    d = J.decode_jpeg(data)
                    px = apply_orientation(
                        d["pixels"], x["orientation"] or 1
                    )
                    rows.append(
                        (did, x["has_exif"], x["orientation"],
                         x["make"], x["model"], x["datetime"],
                         px.shape[1], px.shape[0], True, None)
                    )
                except Exception as e:
                    rows.append(
                        (did, None, None, None, None, None, None,
                         None, False, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "has_exif", "orientation", "make",
                    "model", "datetime", "width", "height",
                    "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=EXIF_SCHEMA
    )


def synthesize_exif_corpus(df, text="text", id_col="doc_id"):
    """Deterministic EXIF'd JPEG corpus: the standard text-derived
    image (pixel rules of ``synthesize_image_from_text``) with an
    injected APP1 whose fields derive from the text — orientation
    ``1 + n % 8`` (all eight transforms exercised), make ``cam<n%5>``,
    model ``m<n%7>``, datetime from ``n`` — and every third doc
    carries NO EXIF (the optional-segment path). SQL-replayable.
    Returns ``(doc_id, media binary)``."""
    from pyspark.sql import functions as F
    import pandas as pd

    def synth(batches):
        import numpy as np

        from . import jpeg as J

        for b in batches:
            medias = []
            for did, t in zip(b[id_col], b["_t"]):
                t = t or ""
                n = len(t)
                w, h = 8 + n % 9, 8 + n % 7
                cps = [ord(c) for c in t]
                px = np.zeros((h, w), dtype=np.uint8)
                for j in range(h * w):
                    cp = cps[j] if j < len(cps) else 0
                    px[j // w, j % w] = ((cp + 1) * 2654435761) % 256
                jpg = J.encode_jpeg_baseline(px, quality=90)
                if did % 3 != 2:
                    jpg = inject_exif(
                        jpg,
                        orientation=1 + n % 8,
                        make=f"cam{n % 5}",
                        model=f"m{n % 7}",
                        datetime=(
                            f"20{10 + n % 15:02d}:{1 + n % 12:02d}:"
                            f"{1 + n % 28:02d} 00:00:00"
                        ),
                    )
                medias.append(jpg)
            yield pd.DataFrame(
                {id_col: b[id_col].to_numpy(), "media": medias}
            )

    return df.select(
        F.col(id_col), F.col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{id_col} bigint, media binary")
