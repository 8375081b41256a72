"""ISO BMFF (MP4/MOV) metadata extraction (round 10).

Video files in a training corpus need ROUTING decisions long before
any codec runs: which tracks exist, codec fourccs, dimensions,
duration, sample counts — the inputs to a frame-sampling plan and to
corpus stats/quarantine. A zero-dependency box parser delivers all
of that from the container structure alone (the same split the
multimodal design doc makes: plumbing real and tested, the lossy
codec kernel pluggable). MJPEG and animated GIF remain the two
containers this engine DECODES (``video_frame_features``); MP4/MOV
get first-class METADATA + plan support here.

Scope:

- **Reader** (:func:`parse_mp4`): box walk (32-bit and 64-bit
  largesize), ``ftyp`` brand, ``mvhd`` (version 0 + 1) movie
  timescale/duration, per-track ``tkhd`` (id, 16.16-fixed display
  dims), ``mdhd`` (media timescale/duration), ``hdlr`` (vide/soun),
  ``stsd`` first-entry fourcc with video (coded width/height) and
  audio (channels, sample rate) sample-entry fields, ``stsz`` sample
  count. Unknown boxes are skipped by size — the format's own
  forward-compat rule. Malformed sizes raise ``ValueError``.
- **Writer** (:func:`encode_mp4_skeleton`): a structurally valid
  metadata-only MP4 (``ftyp`` + full ``moov`` tree + empty ``mdat``)
  for given tracks — the fixture half.
- **Spark surface** (:func:`mp4_metadata_features`): typed rows with
  per-doc quarantine; bytes never shuffle.

Reference anchor: no analog in the reference; north-star multimodal
extension (BASELINE.json).
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _boxes(raw: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for the boxes in
    ``raw[start:end]``."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", raw[pos : pos + 4])
        btype = raw[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", raw[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < (body - pos) or pos + size > end:
            raise ValueError(f"mp4: bad box size for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _parse_mvhd(raw: bytes, a: int, b: int) -> tuple[int, int]:
    ver = raw[a]
    if ver == 1:
        ts, dur = struct.unpack(">IQ", raw[a + 20 : a + 32])
    else:
        ts, dur = struct.unpack(">II", raw[a + 12 : a + 20])
    return ts, dur


def _parse_tkhd(raw: bytes, a: int, b: int) -> tuple[int, float, float]:
    ver = raw[a]
    if ver == 1:
        (tid,) = struct.unpack(">I", raw[a + 20 : a + 24])
    else:
        (tid,) = struct.unpack(">I", raw[a + 12 : a + 16])
    w, h = struct.unpack(">II", raw[b - 8 : b])  # 16.16 fixed, at end
    return tid, w / 65536.0, h / 65536.0


def parse_mp4(raw: bytes) -> dict:
    """Parse MP4/MOV structure into ``{"brand", "timescale",
    "duration_s", "tracks": [{"track_id", "handler", "codec",
    "width", "height", "channels", "sample_rate", "duration_s",
    "n_samples"}, ...]}``."""
    if len(raw) < 12:
        raise ValueError("mp4: too short")
    head = list(_boxes(raw, 0, len(raw)))
    if not head or head[0][0] != b"ftyp":
        raise ValueError("mp4: missing ftyp")
    ft_a, ft_b = head[0][1], head[0][2]
    brand = raw[ft_a : ft_a + 4].decode("latin-1")

    out: dict = {"brand": brand, "timescale": None, "duration_s": None,
                 "tracks": []}
    moov = next(((a, b) for t, a, b in head if t == b"moov"), None)
    if moov is None:
        raise ValueError("mp4: missing moov")

    for btype, a, b in _boxes(raw, moov[0], moov[1]):
        if btype == b"mvhd":
            ts, dur = _parse_mvhd(raw, a, b)
            out["timescale"] = ts
            out["duration_s"] = round(dur / ts, 6) if ts else None
        elif btype == b"trak":
            trk: dict = {
                "track_id": None, "handler": None, "codec": None,
                "width": None, "height": None, "channels": None,
                "sample_rate": None, "duration_s": None,
                "n_samples": None,
            }
            _walk_trak(raw, a, b, trk)
            out["tracks"].append(trk)
    return out


def _walk_trak(raw: bytes, a: int, b: int, trk: dict) -> None:
    for btype, x, y in _boxes(raw, a, b):
        if btype == b"tkhd":
            tid, w, h = _parse_tkhd(raw, x, y)
            trk["track_id"] = tid
            if w:
                trk["width"] = int(w)
            if h:
                trk["height"] = int(h)
        elif btype == b"mdia":
            mts = None
            mdur = None
            for bt2, x2, y2 in _boxes(raw, x, y):
                if bt2 == b"mdhd":
                    ver = raw[x2]
                    if ver == 1:
                        mts, mdur = struct.unpack(
                            ">IQ", raw[x2 + 20 : x2 + 32]
                        )
                    else:
                        mts, mdur = struct.unpack(
                            ">II", raw[x2 + 12 : x2 + 20]
                        )
                elif bt2 == b"hdlr":
                    trk["handler"] = raw[x2 + 8 : x2 + 12].decode(
                        "latin-1"
                    )
                elif bt2 == b"minf":
                    for bt3, x3, y3 in _boxes(raw, x2, y2):
                        if bt3 == b"stbl":
                            _walk_stbl(raw, x3, y3, trk)
            if mts:
                trk["duration_s"] = round((mdur or 0) / mts, 6)


def _walk_stbl(raw: bytes, a: int, b: int, trk: dict) -> None:
    for btype, x, y in _boxes(raw, a, b):
        if btype == b"stsd":
            (n,) = struct.unpack(">I", raw[x + 4 : x + 8])
            if n >= 1 and x + 16 <= y:
                # first sample entry: size(4) fourcc(4) ...
                trk["codec"] = raw[x + 12 : x + 16].decode("latin-1")
                e = x + 8  # entry start
                if trk["handler"] == "vide" and e + 36 <= y:
                    w, h = struct.unpack(">HH", raw[e + 32 : e + 36])
                    trk["width"] = trk["width"] or w
                    trk["height"] = trk["height"] or h
                elif trk["handler"] == "soun" and e + 36 <= y:
                    # AudioSampleEntry: channels at +24, 16.16-fixed
                    # sample rate at +32
                    (ch,) = struct.unpack(">H", raw[e + 24 : e + 26])
                    (sr,) = struct.unpack(">I", raw[e + 32 : e + 36])
                    trk["channels"] = ch
                    trk["sample_rate"] = sr >> 16  # 16.16 fixed
        elif btype == b"stsz":
            (_sz, cnt) = struct.unpack(">II", raw[x + 4 : x + 12])
            trk["n_samples"] = cnt


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4_skeleton(
    tracks: list[dict],
    timescale: int = 1000,
    duration_s: float = 1.0,
    brand: str = "isom",
) -> bytes:
    """Structurally valid metadata-only MP4 (fixture half): each
    track dict takes ``handler`` ("vide"/"soun"), ``codec`` (fourcc),
    and for video ``width``/``height`` (+ optional ``n_samples``),
    for audio ``channels``/``sample_rate``."""
    dur = int(round(duration_s * timescale))
    mvhd = (
        b"\x00\x00\x00\x00"  # version/flags
        + struct.pack(">II", 0, 0)  # times
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + bytes(10)
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + bytes(24)
        + struct.pack(">I", len(tracks) + 1)  # next track id
    )
    moov_children = [_box(b"mvhd", mvhd)]
    for i, t in enumerate(tracks, 1):
        w = int(t.get("width") or 0)
        h = int(t.get("height") or 0)
        tkhd = (
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", i)  # track id
            + bytes(4)
            + struct.pack(">I", dur)
            + bytes(8)
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(
                ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                0x40000000,
            )
            + struct.pack(">II", w << 16, h << 16)
        )
        mdhd = (
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + struct.pack(">HH", 0x55C4, 0)  # language 'und'
        )
        handler = t["handler"].encode("latin-1")
        hdlr = (
            b"\x00\x00\x00\x00" + bytes(4) + handler + bytes(12)
            + b"h\x00"
        )
        fourcc = t["codec"].encode("latin-1")[:4].ljust(4, b" ")
        if t["handler"] == "vide":
            entry = (
                struct.pack(">I", 86)
                + fourcc
                + bytes(6)
                + struct.pack(">H", 1)  # data ref index
                + bytes(16)
                + struct.pack(">HH", w, h)
                + struct.pack(">II", 0x00480000, 0x00480000)
                + bytes(4)
                + struct.pack(">H", 1)
                + bytes(32)
                + struct.pack(">Hh", 0x18, -1)
            )
        else:
            entry = (
                struct.pack(">I", 36)
                + fourcc
                + bytes(6)
                + struct.pack(">H", 1)
                + bytes(8)
                + struct.pack(
                    ">HHHHI",
                    int(t.get("channels") or 2),
                    16, 0, 0,
                    (int(t.get("sample_rate") or 44100)) << 16,
                )
            )
        stsd = b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry
        stsz = (
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, int(t.get("n_samples") or 0))
        )
        stbl = _box(b"stsd", stsd) + _box(b"stsz", stsz)
        minf = _box(b"stbl", stbl)
        mdia = (
            _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr) + _box(b"minf", minf)
        )
        moov_children.append(
            _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))
        )
    ftyp = brand.encode("latin-1")[:4].ljust(4, b" ") + struct.pack(
        ">I", 0x200
    ) + b"isomiso2"
    return (
        _box(b"ftyp", ftyp)
        + _box(b"moov", b"".join(moov_children))
        + _box(b"mdat", b"")
    )


def synthesize_mp4_from_text(df, text="text", id_col="doc_id"):
    """Deterministic synthetic MP4 corpus: per doc a structurally
    valid metadata-only MP4 whose track fields derive from the text
    (video ``8+len%9 × 8+len%7`` at ``1+len%30`` seconds with
    ``len`` samples; mono/stereo mp4a audio at 16 kHz alternating on
    ``len%2``) — SQL-replayable, so the box walk gets a value-level
    oracle without shipping binary fixtures. Returns
    ``(doc_id, media binary)``."""
    from pyspark.sql import functions as F
    import pandas as pd

    def synth(batches):
        for b in batches:
            medias = []
            for t in b["_t"]:
                t = t or ""
                n = len(t)
                medias.append(
                    encode_mp4_skeleton(
                        [
                            {"handler": "vide", "codec": "avc1",
                             "width": 8 + n % 9, "height": 8 + n % 7,
                             "n_samples": n},
                            {"handler": "soun", "codec": "mp4a",
                             "channels": 1 + n % 2,
                             "sample_rate": 16000},
                        ],
                        timescale=1000,
                        duration_s=float(1 + n % 30),
                    )
                )
            yield pd.DataFrame(
                {id_col: b[id_col].to_numpy(), "media": medias}
            )

    return df.select(
        F.col(id_col), F.col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{id_col} bigint, media binary")


MP4_META_SCHEMA = (
    "doc_id bigint, brand string, duration_s double, n_tracks int, "
    "video_codec string, width int, height int, n_samples bigint, "
    "audio_codec string, channels int, sample_rate int, "
    "ok boolean, err string"
)


def mp4_metadata_features(df, id_col="doc_id", media_col="media"):
    """MP4/MOV metadata rows via ``mapInPandas``: one row per doc
    with movie duration, track counts, and the FIRST video and audio
    tracks' codec/dims/rate fields — the routing/quarantine stage a
    100 TB video corpus runs before any (pluggable) codec kernel.
    Poison rows quarantine per doc; bytes never shuffle."""
    import pandas as pd

    def extract(batches):
        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    d = parse_mp4(data)
                    vid = next(
                        (t for t in d["tracks"] if t["handler"] == "vide"),
                        None,
                    )
                    aud = next(
                        (t for t in d["tracks"] if t["handler"] == "soun"),
                        None,
                    )
                    rows.append(
                        (did, d["brand"], d["duration_s"],
                         len(d["tracks"]),
                         vid["codec"] if vid else None,
                         vid["width"] if vid else None,
                         vid["height"] if vid else None,
                         vid["n_samples"] if vid else None,
                         aud["codec"] if aud else None,
                         aud["channels"] if aud else None,
                         aud["sample_rate"] if aud else None,
                         True, None)
                    )
                except Exception as e:
                    rows.append(
                        (did, None, None, None, None, None, None, None,
                         None, None, None, False,
                         f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "brand", "duration_s", "n_tracks",
                    "video_codec", "width", "height", "n_samples",
                    "audio_codec", "channels", "sample_rate",
                    "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=MP4_META_SCHEMA
    )
