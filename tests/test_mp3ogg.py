"""MP3/OGG metadata kernel tests (round 10): frame arithmetic across
the full bitrate/rate/channel grid, ID3 tag walks, OGG page CRC
verification, quarantine contracts, and fixture→parser roundtrip
properties.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datasplash_spark.functions import mp3ogg as A


def test_mp3_roundtrip_grid():
    for br in (32, 64, 128, 192, 256, 320):
        for sr in (32000, 44100, 48000):
            for ch in (1, 2):
                d = A.parse_mp3(A.encode_mp3(5, br, sr, ch))
                assert (
                    d["bitrate_kbps"], d["sample_rate"], d["channels"],
                    d["n_frames"],
                ) == (br, sr, ch, 5)
                assert d["duration_s"] == 5 * 1152 / sr


def test_mp3_id3_tags():
    m = A.encode_mp3(3, title="hëllo")
    d = A.parse_mp3(m)
    assert d["title"] == "hëllo" and not d["has_id3v1"]
    # ID3v1 trailer detected, not parsed as frames
    d2 = A.parse_mp3(m + b"TAG" + bytes(125))
    assert d2["has_id3v1"] and d2["n_frames"] == 3
    # no tag at all
    assert A.parse_mp3(A.encode_mp3(2))["title"] is None


def test_mp3_quarantines():
    with pytest.raises(ValueError, match="no frame sync"):
        A.parse_mp3(b"\x00\x01\x02\x03")
    m = A.encode_mp3(2)
    with pytest.raises(ValueError, match="lost frame sync"):
        A.parse_mp3(m + b"garbage")
    with pytest.raises(ValueError, match="truncated frame"):
        A.parse_mp3(m[:-10])
    # mid-stream sample-rate change
    mixed = A.encode_mp3(1, sample_rate=44100) + A.encode_mp3(
        1, sample_rate=48000
    )
    with pytest.raises(ValueError, match="sample-rate change"):
        A.parse_mp3(mixed)


def test_ogg_roundtrip_and_crc():
    for codec, rate, gran in (
        ("vorbis", 44100, 44100 * 3),
        ("vorbis", 8000, 4000),
        ("opus", 48000, 312 + 96000),
    ):
        o = A.encode_ogg(codec, 2, rate, gran, n_data_pages=3)
        d = A.parse_ogg(o)
        assert d["codec"] == codec and d["n_pages"] == 4
        if codec == "opus":
            assert d["duration_s"] == (gran - 312) / 48000
        else:
            assert d["duration_s"] == gran / rate
    # single flipped byte anywhere in a page body → CRC quarantine
    o = A.encode_ogg("vorbis", 1, 8000, 800, 1)
    bad = o[:40] + bytes([o[40] ^ 1]) + o[41:]
    with pytest.raises(ValueError, match="CRC"):
        A.parse_ogg(bad)


def test_ogg_quarantines():
    o = A.encode_ogg("opus", 1, 48000, 1000, 2)
    with pytest.raises(ValueError, match="EOS"):
        A.parse_ogg(o[: o.rindex(b"OggS")])
    with pytest.raises(ValueError, match="capture pattern"):
        A.parse_ogg(b"NotOgg" + o)
    with pytest.raises(ValueError, match="unknown codec"):
        A.parse_ogg(A._ogg_page(0x06, 0, 1, 0, [b"\x01mystery" + bytes(8)]))
    with pytest.raises(ValueError, match="truncated id header"):
        A.parse_ogg(A._ogg_page(0x06, 0, 1, 0, [b"\x01myst"]))
    # two interleaved serials = multiplexed, unsupported
    p1 = A._ogg_page(
        0x02, 0, 1, 0,
        [b"\x01vorbis" + bytes(4) + b"\x01" + b"\x40\x1f\x00\x00"
         + bytes(13)],
    )
    p2 = A._ogg_page(0x04, 10, 2, 0, [b"x"])
    with pytest.raises(ValueError, match="multiplexed"):
        A.parse_ogg(p1 + p2)


def test_ogg_crc_known_zero_page():
    # CRC of the zeroed-field page must round-trip through the
    # generated table (self-consistency + a fixed regression value)
    page = A._ogg_page(0x02, 0, 0x12345678, 0, [b"OpusHead" + bytes(11)])
    assert A.parse_ogg.__name__  # table built at import
    import struct

    crc = struct.unpack("<I", page[22:26])[0]
    z = bytearray(page)
    z[22:26] = b"\x00\x00\x00\x00"
    assert A._ogg_crc(bytes(z)) == crc


@given(
    st.integers(min_value=1, max_value=80),
    st.sampled_from([32, 64, 96, 128, 160, 192, 224, 256, 320]),
    st.sampled_from([32000, 44100, 48000]),
    st.integers(min_value=1, max_value=2),
    st.one_of(st.none(), st.text(max_size=20)),
)
@settings(max_examples=60, deadline=None)
def test_mp3_roundtrip_property(nf, br, sr, ch, title):
    d = A.parse_mp3(A.encode_mp3(nf, br, sr, ch, title=title))
    want_title = (
        title.encode("latin-1", "replace").decode("latin-1").rstrip("\x00")
        if title is not None
        else None
    )
    assert d["n_frames"] == nf and d["bitrate_kbps"] == br
    assert d["sample_rate"] == sr and d["channels"] == ch
    assert d["title"] == want_title


@given(
    st.sampled_from(["vorbis", "opus"]),
    st.integers(min_value=1, max_value=8),
    st.sampled_from([8000, 16000, 44100, 48000]),
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_ogg_roundtrip_property(codec, ch, rate, gran, ndp):
    if codec == "opus":
        gran += 312  # granule includes pre-skip
    d = A.parse_ogg(A.encode_ogg(codec, ch, rate, gran, ndp))
    assert d["codec"] == codec and d["channels"] == ch
    assert d["n_pages"] == ndp + 1


def test_ogg_comment_tags():
    # tags roundtrip both codecs; a long title spans lacing segments
    long_title = "x" * 600
    for codec, rate, gran in (
        ("vorbis", 44100, 44100), ("opus", 48000, 312 + 4800),
    ):
        o = A.encode_ogg(
            codec, 2, rate, gran, 2, title=long_title, artist="The Band"
        )
        d = A.parse_ogg(o)
        assert d["title"] == long_title and d["artist"] == "The Band"
        assert d["n_pages"] == 4  # BOS + comment + 2 data
    # no comment header: data packet must NOT misparse as tags
    d = A.parse_ogg(A.encode_ogg("vorbis", 1, 8000, 800, 1))
    assert d["title"] is None and d["tags"] == {}


def test_ogg_comment_packet_spans_pages():
    # a comment packet CONTINUED onto a second page (lacing 255 at
    # page end + continuation flag) reassembles correctly
    import struct

    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
        + struct.pack("<IiiI", 8000, 0, 0, 0) + b"\x66\x01"
    )
    title = ("y" * 600).encode()
    body = struct.pack("<I", 6) + b"vendor" + struct.pack("<I", 1)
    body += struct.pack("<I", 6 + len(title)) + b"TITLE=" + title
    pkt = b"\x03vorbis" + body + b"\x01"
    serial = 7
    pages = bytearray(A._ogg_page(0x02, 0, serial, 0, [ident]))

    def raw_page(header_type, granule, seq, lacing, payload):
        p = bytearray(
            b"OggS\x00" + bytes([header_type])
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes([len(lacing)]) + bytes(lacing) + payload
        )
        p[22:26] = struct.pack("<I", A._ogg_crc(bytes(p)))
        return bytes(p)

    # first 255 bytes on page 1 (lacing [255] = packet continues),
    # remainder on page 2 with the continued-packet flag (0x01)
    pages += raw_page(0x00, 0, 1, [255], pkt[:255])
    rest = pkt[255:]
    pages += raw_page(0x01, 0, 2, [255, len(rest) - 255], rest)
    pages += A._ogg_page(0x04, 800, serial, 3, [b"\x00" * 20])
    d = A.parse_ogg(bytes(pages))
    assert d["title"] == "y" * 600
    assert d["n_pages"] == 4


def test_mp3_artist_tpe1():
    d = A.parse_mp3(A.encode_mp3(3, title="Song", artist="Bänd"))
    assert d["title"] == "Song" and d["artist"] == "Bänd"
    assert A.parse_mp3(A.encode_mp3(2))["artist"] is None
    d2 = A.parse_mp3(A.encode_mp3(2, artist="only"))
    assert d2["title"] is None and d2["artist"] == "only"


def test_ogg_truncated_raises_valueerror_not_indexerror():
    # quarantine contract: truncation anywhere raises ValueError
    o = A.encode_ogg("vorbis", 1, 8000, 800, 1)
    for cut in (4, 10, 20, 26):
        with pytest.raises(ValueError):
            A.parse_ogg(o[:cut])


def test_opus_duration_clamps_at_preskip():
    # a trimmed Opus stream whose final granule undershoots the
    # pre-skip must report 0, not a negative duration
    o = A.encode_ogg("opus", 1, 48000, 100, 1)  # granule < 312
    d = A.parse_ogg(o)
    assert d["duration_s"] == 0.0


def test_id3v23_extended_header_and_unsync():
    import struct

    # v2.3 tag with extended header (flag 0x40): 4-byte size
    # EXCLUDES itself; frames follow the ext header
    t = b"Title!"
    frame = b"TIT2" + struct.pack(">IH", len(t) + 1, 0) + b"\x00" + t
    ext = struct.pack(">I", 6) + b"\x00" * 6
    tag_body = ext + frame
    size = len(tag_body)
    hdr = b"ID3\x03\x00\x40" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
         (size >> 7) & 0x7F, size & 0x7F]
    )
    mp3 = hdr + tag_body + A.encode_mp3(1)
    assert A.parse_mp3(mp3)["title"] == "Title!"
    # unsynchronisation (flag 0x80): FF 00 in the tag reads as FF
    t2 = b"\xffX"  # latin-1 'ÿX'
    frame2 = b"TIT2" + struct.pack(">IH", len(t2) + 2, 0) + b"\x00" \
        + b"\xff\x00X"
    size2 = len(frame2)
    hdr2 = b"ID3\x03\x00\x80" + bytes(
        [(size2 >> 21) & 0x7F, (size2 >> 14) & 0x7F,
         (size2 >> 7) & 0x7F, size2 & 0x7F]
    )
    mp32 = hdr2 + frame2 + A.encode_mp3(1)
    assert A.parse_mp3(mp32)["title"] == "\xffX"


def test_id3v22_three_byte_frames():
    # ID3v2.2: 3-byte ids (TT2/TP1) and 3-byte sizes
    body_t = b"\x00Old Title"
    body_a = b"\x00Old Artist"
    frames = (
        b"TT2" + len(body_t).to_bytes(3, "big") + body_t
        + b"TP1" + len(body_a).to_bytes(3, "big") + body_a
    )
    size = len(frames)
    hdr = b"ID3\x02\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
         (size >> 7) & 0x7F, size & 0x7F]
    )
    d = A.parse_mp3(hdr + frames + A.encode_mp3(1))
    assert d["title"] == "Old Title" and d["artist"] == "Old Artist"
