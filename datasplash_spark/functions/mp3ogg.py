"""MP3 and OGG container metadata extraction (round 10).

The compressed-audio analog of :mod:`.mp4`: a 100 TB audio corpus
needs ROUTING decisions (codec, channels, rate, duration, tag text)
long before any psychoacoustic decoder runs — the inputs to a
sampling plan, corpus stats, and quarantine. WAV/FLAC/G.711 are the
formats this engine DECODES (:mod:`.multimodal`, :mod:`.flac`);
MP3 and OGG get first-class metadata + fixture support here, zero
dependencies, from the container structure alone:

- **MP3** (:func:`parse_mp3`): ID3v2 tag walk (syncsafe size,
  v2.3/v2.4 frames, TIT2 title), MPEG-1/2/2.5 Layer I/II/III frame
  headers (bitrate/samplerate tables, padding arithmetic), frame
  iteration by computed length, trailing ID3v1 detection; duration
  = frames × samples-per-frame / rate.
- **OGG** (:func:`parse_ogg`): page walk (capture pattern, lacing
  tables, CRC-32 with the OGG polynomial VERIFIED per page — a
  corrupt page quarantines the doc), BOS/EOS flags, Vorbis and
  Opus identification headers (channels/rate/pre-skip), Vorbis-
  comment / OpusTags metadata (the COMMENT packet reassembles
  across lacing segments and continued pages; ``title``/``artist``
  surfaced like ID3), duration from the final granule position
  (Opus granules tick at 48 kHz minus pre-skip, per RFC 7845).
- **Writers** (:func:`encode_mp3`, :func:`encode_ogg`):
  structurally valid fixtures (real headers, zeroed payloads,
  correct OGG CRCs) — the SQL-replayable synthesis half.
- **Spark surface** (:func:`audio_metadata_features`): magic-byte
  routing (ID3 / frame sync → MP3, OggS → OGG) into ONE typed row
  per doc with per-doc quarantine; bytes never shuffle — parsing
  runs where the blob lives and only ~100-byte rows cross.

Reference anchor: no analog in the reference (datasplash has no
media surface); north-star multimodal extension (BASELINE.json).
Format sources: ISO 11172-3 (MPEG audio framing), id3.org (ID3v2),
RFC 3533 (OGG), Xiph Vorbis-I spec, RFC 7845 (Opus-in-OGG).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------

#: MPEG-1 bitrate table (kbps) per layer; index 0 = free, 15 = bad
_BITRATES_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
        384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320),
}
#: MPEG-2/2.5 bitrate table (kbps)
_BITRATES_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
        256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_text(body: bytes) -> str | None:
    """ID3v2 text-frame payload → str (encoding byte 0 latin-1,
    1/2 UTF-16(-BE), 3 UTF-8; trailing NULs stripped)."""
    if not body:
        return None
    enc = body[0]
    try:
        if enc == 0:
            s = body[1:].decode("latin-1")
        elif enc == 3:
            s = body[1:].decode("utf-8")
        elif enc in (1, 2):
            s = body[1:].decode("utf-16" if enc == 1 else "utf-16-be")
        else:
            return None
    except UnicodeDecodeError:
        return None
    return s.rstrip("\x00")


def _parse_id3v2(raw: bytes) -> tuple[int, str | None, str | None]:
    """(total tag length to skip, title, artist); (0, None, None)
    when no ID3v2 tag leads the file. Handles v2.2 (3-byte frame
    ids/sizes: TT2/TP1), v2.3 (plain 4-byte sizes, non-syncsafe
    extended header), v2.4 (syncsafe sizes, syncsafe extended
    header), and tag-level unsynchronisation (FF 00 → FF) — real
    tagger output sets all of these (review finding: the ext-header
    bytes would otherwise parse as a frame and misalign the walk)."""
    if raw[:3] != b"ID3" or len(raw) < 10:
        return 0, None, None
    ver = raw[3]
    flags = raw[5]
    size = _syncsafe(raw[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)
    tag = raw[10 : 10 + size]
    if flags & 0x80:  # unsynchronisation
        tag = tag.replace(b"\xff\x00", b"\xff")
    pos = 0
    if flags & 0x40 and len(tag) >= 4:  # extended header
        if ver >= 4:
            pos = _syncsafe(tag[0:4])  # v2.4: size INCLUDES itself
        else:
            (ehs,) = struct.unpack(">I", tag[0:4])
            pos = 4 + ehs  # v2.3: size EXCLUDES the size field
    if ver == 2:
        hdr = 6
        tmap = {b"TT2": 0, b"TP1": 1}
    else:
        hdr = 10
        tmap = {b"TIT2": 0, b"TPE1": 1}
    found: list[str | None] = [None, None]
    while pos + hdr <= len(tag):
        fid = tag[pos : pos + (3 if ver == 2 else 4)]
        if not fid.strip(b"\x00"):
            break  # padding
        if ver == 2:
            fsize = int.from_bytes(tag[pos + 3 : pos + 6], "big")
        elif ver >= 4:
            fsize = _syncsafe(tag[pos + 4 : pos + 8])
        else:
            (fsize,) = struct.unpack(">I", tag[pos + 4 : pos + 8])
        body = tag[pos + hdr : pos + hdr + fsize]
        slot = tmap.get(fid)
        if slot is not None and fsize >= 1:
            found[slot] = _id3_text(body)
        pos += hdr + fsize
    return total, found[0], found[1]


def _frame_header(raw: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos`` → (frame_len,
    bitrate_kbps, sample_rate, channels, samples_per_frame) or None
    when ``pos`` is not a sync point."""
    if pos + 4 > len(raw):
        return None
    b0, b1, b2, b3 = raw[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_code = (b1 >> 1) & 3  # 3=I, 2=II, 1=III, 0=reserved
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code  # 1, 2, 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    table = _BITRATES_V1 if version == 3 else _BITRATES_V2
    bitrate = table[layer][br_idx]
    rate = _RATES[version][sr_idx]
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    if layer == 1:
        spf = 384
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 3) else 576
        flen = spf // 8 * bitrate * 1000 // rate + padding
    return flen, bitrate, rate, channels, spf


def parse_mp3(raw: bytes) -> dict:
    """Walk an MP3: optional leading ID3v2, consecutive MPEG audio
    frames, optional trailing ID3v1. Returns ``{codec, bitrate_kbps,
    sample_rate, channels, n_frames, duration_s, title,
    has_id3v1}`` (fields from the FIRST frame header; duration sums
    per-frame samples). Raises ``ValueError`` for a missing sync, an
    inconsistent mid-stream header, or trailing garbage — the
    quarantine contract."""
    skip, title, artist = _parse_id3v2(raw)
    pos = skip
    first = _frame_header(raw, pos)
    if first is None:
        raise ValueError("mp3: no frame sync after tag")
    n_frames = 0
    total_samples = 0
    rate0 = first[2]
    while pos < len(raw):
        if raw[pos : pos + 3] == b"TAG" and len(raw) - pos == 128:
            return {
                "codec": "mp3", "bitrate_kbps": first[1],
                "sample_rate": rate0, "channels": first[3],
                "n_frames": n_frames,
                "duration_s": total_samples / rate0,
                "title": title, "artist": artist, "has_id3v1": True,
            }
        h = _frame_header(raw, pos)
        if h is None:
            raise ValueError(f"mp3: lost frame sync at byte {pos}")
        flen, _br, rate, _ch, spf = h
        if rate != rate0:
            raise ValueError("mp3: sample-rate change mid-stream")
        if flen <= 4 or pos + flen > len(raw):
            raise ValueError("mp3: truncated frame")
        n_frames += 1
        total_samples += spf
        pos += flen
    return {
        "codec": "mp3", "bitrate_kbps": first[1],
        "sample_rate": rate0, "channels": first[3],
        "n_frames": n_frames, "duration_s": total_samples / rate0,
        "title": title, "artist": artist, "has_id3v1": False,
    }


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    title: str | None = None,
    artist: str | None = None,
) -> bytes:
    """Structurally valid MPEG-1 Layer III fixture: optional ID3v2.3
    tag with TIT2/TPE1 frames, then ``n_frames`` CBR frames (real
    headers, zeroed payloads)."""
    br_idx = _BITRATES_V1[3].index(bitrate_kbps)
    sr_idx = _RATES[3].index(sample_rate)
    out = bytearray()
    if title is not None or artist is not None:
        frames = b""
        for fid, val in ((b"TIT2", title), (b"TPE1", artist)):
            if val is None:
                continue
            t = val.encode("latin-1", "replace")
            frames += fid + struct.pack(">IH", len(t) + 1, 0) + b"\x00" + t
        size = len(frames)
        out += b"ID3\x03\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        ) + frames
    flen = 144 * bitrate_kbps * 1000 // sample_rate  # padding 0
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2),
         (0x00 if channels == 2 else 0xC0)]
    )
    frame = hdr + bytes(flen - 4)
    out += frame * n_frames
    return bytes(out)


# ---------------------------------------------------------------------
# OGG
# ---------------------------------------------------------------------


def _ogg_crc_table() -> list[int]:
    # OGG CRC-32: poly 0x04C11DB7, MSB-first, init 0, no final xor
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_OGG_CRC = _ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    tab = _OGG_CRC
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tab[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ogg_page(
    header_type: int,
    granule: int,
    serial: int,
    seq: int,
    packets: list[bytes],
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += p
    page = bytearray(
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<qIII", granule, serial, seq, 0)
        + bytes([len(lacing)])
        + lacing
        + body
    )
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _parse_comments(pkt: bytes, skip: int) -> dict[str, str]:
    """Vorbis-comment block (shared by Vorbis and OpusTags): vendor
    string then ``n`` ``KEY=value`` UTF-8 entries; first-KEY-wins,
    keys lowercased. ``skip`` = codec magic length."""
    out: dict[str, str] = {}
    pos = skip
    if pos + 4 > len(pkt):
        return out
    (vlen,) = struct.unpack("<I", pkt[pos : pos + 4])
    pos += 4 + vlen
    if pos + 4 > len(pkt):
        return out
    (n,) = struct.unpack("<I", pkt[pos : pos + 4])
    pos += 4
    for _ in range(min(n, 4096)):
        if pos + 4 > len(pkt):
            break
        (clen,) = struct.unpack("<I", pkt[pos : pos + 4])
        pos += 4
        entry = pkt[pos : pos + clen]
        pos += clen
        k, sep, v = entry.partition(b"=")
        if sep:
            key = k.decode("utf-8", "replace").lower()
            out.setdefault(key, v.decode("utf-8", "replace"))
    return out


def parse_ogg(raw: bytes) -> dict:
    """Walk an OGG stream: verify every page's capture pattern and
    CRC, read the identification header (Vorbis or Opus), reassemble
    the COMMENT packet across lacing segments/pages (Vorbis-comment
    ``KEY=value`` tags — ``title``/``artist`` surfaced like ID3),
    track the final granule position. Returns ``{codec, channels,
    sample_rate, n_pages, duration_s, title, artist, tags}``. Raises
    ``ValueError`` for bad capture / CRC / version, multiplexed
    serials, unknown codecs, or a missing EOS flag — the quarantine
    contract."""
    pos = 0
    n_pages = 0
    serial0: int | None = None
    codec = None
    channels = 0
    rate = 0
    preskip = 0
    last_granule = 0
    saw_eos = False
    # first-two-packet reassembly (id + comment headers): bounded —
    # collection stops once two packets complete, CRC still verifies
    # every page
    packets: list[bytes] = []
    cur = bytearray()
    collecting = True
    while pos < len(raw):
        if raw[pos : pos + 4] != b"OggS":
            raise ValueError(f"ogg: bad capture pattern at byte {pos}")
        if pos + 27 > len(raw):
            # guard BEFORE the fixed-header reads: a truncated page
            # must raise the documented ValueError, not IndexError /
            # struct.error (quarantine contract)
            raise ValueError("ogg: truncated page header")
        if raw[pos + 4] != 0:
            raise ValueError("ogg: unknown page version")
        header_type = raw[pos + 5]
        granule, serial, _seq, crc = struct.unpack(
            "<qIII", raw[pos + 6 : pos + 26]
        )
        nsegs = raw[pos + 26]
        lacing = raw[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lacing)
        page_len = 27 + nsegs + body_len
        page = bytearray(raw[pos : pos + page_len])
        if len(page) < page_len:
            raise ValueError("ogg: truncated page body")
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("ogg: page CRC mismatch")
        if serial0 is None:
            serial0 = serial
        elif serial != serial0:
            raise ValueError("ogg: multiplexed streams unsupported")
        if collecting:
            body_pos = pos + 27 + nsegs
            for seg in lacing:
                cur += raw[body_pos : body_pos + seg]
                body_pos += seg
                if seg < 255:  # packet boundary
                    packets.append(bytes(cur))
                    cur.clear()
                    if len(packets) >= 2:
                        collecting = False
                        break
        if n_pages == 0:
            head = packets[0] if packets else bytes(cur)
            if len(head) < 16:
                raise ValueError("ogg: truncated id header")
            if head[:7] == b"\x01vorbis":
                codec = "vorbis"
                channels = head[11]
                (rate,) = struct.unpack("<I", head[12:16])
            elif head[:8] == b"OpusHead":
                codec = "opus"
                channels = head[9]
                (preskip,) = struct.unpack("<H", head[10:12])
                (rate,) = struct.unpack("<I", head[12:16])
            else:
                raise ValueError("ogg: unknown codec id header")
        if granule >= 0:
            last_granule = granule
        if header_type & 0x04:
            saw_eos = True
        n_pages += 1
        pos += page_len
    if n_pages == 0:
        raise ValueError("ogg: no pages")
    if not saw_eos:
        raise ValueError("ogg: missing EOS page")
    if codec == "opus":
        # Opus granules tick at 48 kHz regardless of input rate and
        # include the pre-skip (RFC 7845 §4); a trimmed stream whose
        # final granule undershoots the pre-skip clamps to zero
        # rather than reporting a negative duration
        duration = max(0, last_granule - preskip) / 48000
    else:
        duration = last_granule / rate if rate else 0.0
    tags: dict[str, str] = {}
    if len(packets) >= 2:
        c = packets[1]
        if c[:7] == b"\x03vorbis":
            tags = _parse_comments(c, 7)
        elif c[:8] == b"OpusTags":
            tags = _parse_comments(c, 8)
    return {
        "codec": codec, "channels": channels, "sample_rate": rate,
        "n_pages": n_pages, "duration_s": duration,
        "title": tags.get("title"), "artist": tags.get("artist"),
        "tags": tags,
    }


def encode_ogg(
    codec: str,
    channels: int,
    sample_rate: int,
    final_granule: int,
    n_data_pages: int = 1,
    serial: int = 0x6F676753,
    preskip: int = 312,
    title: str | None = None,
    artist: str | None = None,
) -> bytes:
    """Structurally valid single-stream OGG fixture: a BOS page with
    the Vorbis or Opus identification header, a comment-header page
    when ``title``/``artist`` are given (Vorbis-comment block /
    OpusTags), ``n_data_pages`` dummy data pages with increasing
    granules, EOS on the last (real CRCs throughout)."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<IiiI", sample_rate, 0, 0, 0)
            + b"\x66\x01"
        )
    elif codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIhB", preskip, sample_rate, 0, 0)
        )
    else:
        raise ValueError(f"ogg: unknown codec {codec!r}")
    out = bytearray(_ogg_page(0x02, 0, serial, 0, [ident]))
    seq = 1
    if title is not None or artist is not None:
        comments = []
        if title is not None:
            comments.append(b"TITLE=" + title.encode("utf-8"))
        if artist is not None:
            comments.append(b"ARTIST=" + artist.encode("utf-8"))
        vendor = b"datasplash-spark"
        body = struct.pack("<I", len(vendor)) + vendor
        body += struct.pack("<I", len(comments))
        for c in comments:
            body += struct.pack("<I", len(c)) + c
        if codec == "vorbis":
            pkt = b"\x03vorbis" + body + b"\x01"  # framing bit
        else:
            pkt = b"OpusTags" + body
        out += _ogg_page(0x00, 0, serial, seq, [pkt])
        seq += 1
    n_data_pages = max(1, n_data_pages)
    for i in range(n_data_pages):
        last = i == n_data_pages - 1
        granule = (
            final_granule if last
            else final_granule * (i + 1) // n_data_pages
        )
        out += _ogg_page(
            0x04 if last else 0x00, granule, serial, seq + i,
            [b"\x00" * 20],
        )
    return bytes(out)


# ---------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------

AUDIO_META_SCHEMA = (
    "doc_id bigint, container string, codec string, "
    "duration_s double, sample_rate int, channels int, "
    "bitrate_kbps int, n_units bigint, title string, "
    "ok boolean, err string"
)


def audio_metadata_features(df, id_col="doc_id", media_col="media"):
    """Route each blob by magic bytes (ID3 / MPEG frame sync → MP3,
    OggS → OGG) and parse its container metadata into ONE typed row:
    ``(doc_id, container, codec, duration_s, sample_rate, channels,
    bitrate_kbps, n_units, title, ok, err)`` — ``n_units`` is MP3
    frames / OGG pages; ``bitrate_kbps``/``title`` are MP3-only.
    Poison rows quarantine per doc; bytes never shuffle (parsing
    runs where the blob lives, only metadata rows cross)."""
    import pandas as pd

    def extract(batches):
        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    if data[:4] == b"OggS":
                        d = parse_ogg(data)
                        rows.append(
                            (did, "ogg", d["codec"], d["duration_s"],
                             d["sample_rate"], d["channels"], None,
                             d["n_pages"], d["title"], True, None)
                        )
                    elif data[:3] == b"ID3" or (
                        len(data) >= 2
                        and data[0] == 0xFF
                        and (data[1] & 0xE0) == 0xE0
                    ):
                        d = parse_mp3(data)
                        rows.append(
                            (did, "mp3", "mp3", d["duration_s"],
                             d["sample_rate"], d["channels"],
                             d["bitrate_kbps"], d["n_frames"],
                             d["title"], True, None)
                        )
                    else:
                        raise ValueError("audio: unknown container")
                except Exception as e:
                    rows.append(
                        (did, None, None, None, None, None, None,
                         None, None, False, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "container", "codec", "duration_s",
                    "sample_rate", "channels", "bitrate_kbps",
                    "n_units", "title", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=AUDIO_META_SCHEMA
    )


def synthesize_audio_meta_from_text(df, text="text", id_col="doc_id"):
    """Deterministic synthetic compressed-audio corpus, one container
    per doc on ``doc_id % 3``: MP3 (bitrate/rate/channels/frames and
    the ID3v2 TIT2 title all text-derived), OGG Vorbis, OGG Opus —
    every field rule is SQL-replayable so the frame arithmetic, tag
    walk, page CRCs, and granule math get a value-level oracle.
    Returns ``(doc_id, media binary)``."""
    from pyspark.sql import functions as F
    import pandas as pd

    def synth(batches):
        for b in batches:
            medias = []
            for did, t in zip(b[id_col], b["_t"]):
                t = t or ""
                n = len(t)
                if did % 3 == 0:
                    medias.append(
                        encode_mp3(
                            n_frames=1 + n % 50,
                            bitrate_kbps=(64, 128, 192)[n % 3],
                            sample_rate=(32000, 44100, 48000)[
                                (n // 3) % 3
                            ],
                            channels=1 + n % 2,
                            title=f"t{n % 100}",
                        )
                    )
                elif did % 3 == 1:
                    medias.append(
                        encode_ogg(
                            "vorbis",
                            channels=1 + n % 2,
                            sample_rate=(8000, 16000, 44100)[n % 3],
                            final_granule=n * 97,
                            n_data_pages=1 + n % 4,
                            title=f"t{n % 100}",
                        )
                    )
                else:
                    medias.append(
                        encode_ogg(
                            "opus",
                            channels=1 + n % 2,
                            sample_rate=48000,
                            final_granule=312 + n * 53,
                            n_data_pages=1 + n % 3,
                            title=f"t{n % 100}",
                        )
                    )
            yield pd.DataFrame(
                {id_col: b[id_col].to_numpy(), "media": medias}
            )

    return df.select(
        F.col(id_col), F.col(text).alias("_t")
    ).mapInPandas(synth, schema=f"{id_col} bigint, media binary")
