"""Property-based tests (hypothesis) for the pure-Python layers —
going beyond the reference's example-based-only strategy (SURVEY §5:
"No property-based/randomized testing" in datasplash)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datasplash_spark.functions import edn
from datasplash_spark.objectmode import CombineFn, _canon, _key_bytes
from datasplash_spark.schema import bqize_keys, clean_name

# EDN-serializable values: keywords are strings starting with ':',
# plain strings must not start with ':' (that's the keyword marker).
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=30).filter(lambda s: not s.startswith(":")),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1, max_size=10
    ).map(lambda s: ":" + s),
)

_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
            ).map(lambda s: ":" + s),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


@given(_value)
@settings(max_examples=300, deadline=None)
def test_edn_roundtrip_property(v):
    assert edn.loads(edn.dumps(v)) == v


@given(st.sets(st.integers(min_value=-100, max_value=100), max_size=6))
@settings(max_examples=100, deadline=None)
def test_edn_set_roundtrip(s):
    assert edn.loads(edn.dumps(s)) == s


@given(_value, _value)
@settings(max_examples=200, deadline=None)
def test_canonical_key_bytes_equality(a, b):
    """Equal values ⇒ equal key bytes; the shuffle-key contract."""
    if a == b:
        assert _key_bytes(a) == _key_bytes(b)
    # canonicalization is deterministic
    assert _canon(a) == _canon(a)


@given(st.dictionaries(st.integers(), st.integers(), min_size=2, max_size=8))
@settings(max_examples=100, deadline=None)
def test_canonical_key_dict_order_independent(d):
    items = list(d.items())
    shuffled = dict(reversed(items))
    assert _key_bytes(d) == _key_bytes(shuffled)


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_combiner_split_merge_equals_direct(xs):
    """The 4-phase combiner contract: any split into partial
    accumulators merged together equals the straight fold — what makes
    map-side partial aggregation correct."""
    fn = CombineFn(
        initf=lambda: (0, 0),
        reducef=lambda acc, v: (acc[0] + v, acc[1] + 1),
        combinef=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        extractf=lambda acc: acc[0] / acc[1],
    )
    direct = fn.init()
    for v in xs:
        direct = fn.reduce(direct, v)
    for cut in range(1, len(xs) + 1):
        left = fn.init()
        for v in xs[:cut]:
            left = fn.reduce(left, v)
        right = fn.init()
        for v in xs[cut:]:
            right = fn.reduce(right, v)
        assert fn.extract(fn.merge(left, right)) == fn.extract(direct)


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
    )
)
@settings(max_examples=200, deadline=None)
def test_clean_name_idempotent(s):
    assert clean_name(clean_name(s)) == clean_name(s)
    assert "-" not in clean_name(s) and "?" not in clean_name(s)


@given(
    st.recursive(
        st.integers(),
        lambda c: st.dictionaries(
            st.text(alphabet="ab-?", min_size=1, max_size=5), c, max_size=3
        ),
        max_leaves=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_bqize_keys_produces_clean_keys(v):
    def all_keys_clean(x):
        if isinstance(x, dict):
            return all(
                "-" not in k and "?" not in k and all_keys_clean(val)
                for k, val in x.items()
            )
        return True

    assert all_keys_clean(bqize_keys(v))


# ---------------------------------------------------------------- round 6
# Pure-Python mirrors of the round-6 engine-exact kernels, fuzzed.


def _py_bpe_pass(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


@given(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=12),
    st.sampled_from(["a", "b", "ab", "ba"]),
    st.sampled_from(["a", "b", "ab", "ba"]),
)
@settings(max_examples=150, deadline=None)
def test_bpe_fold_string_accumulator_equals_list_walk(syms, a, b):
    """The string-accumulator merge fold (the form both engines
    evaluate) is equivalent to the reference list walk for ANY
    symbol sequence and merge pair — incl. overlapping runs like
    a,a,a and multi-char symbols."""
    acc = ""
    for x in syms:
        if (acc == a or acc.endswith(" " + a)) and x == b:
            acc = acc[: len(acc) - len(a)] + a + b
        elif acc == "":
            acc = x
        else:
            acc = acc + " " + x
    via_string = acc.split(" ") if acc else [""]
    via_list = _py_bpe_pass(list(syms), a, b)
    if not syms:
        assert acc == ""
    else:
        assert via_string == via_list


@given(
    st.lists(
        st.integers(min_value=0, max_value=2 ** 31 - 1),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=150, deadline=None)
def test_winnowing_density_and_coverage(hashes, w):
    """Winnowing invariants on arbitrary hash sequences: every
    selected fingerprint IS a sequence member; every window of w
    consecutive hashes contains at least one selected fingerprint
    VALUE (the coverage guarantee behind the w+k-1 sharing
    property)."""
    m = len(hashes)
    wins = [
        min(hashes[i : i + w]) for i in range(max(m - w + 1, 1))
    ]
    fps = set(wins)
    assert fps <= set(hashes)
    for i in range(max(m - w + 1, 1)):
        assert fps & set(hashes[i : i + w])


def _py_det_ln_u(m_hex: int) -> float:
    m = max(m_hex, 1)
    b = m.bit_length()
    t = float(m) / float(1 << (b - 1))
    z = (t - 1.0) / (t + 1.0)
    s = z * z
    cs = [0.3333333333333333, 0.2, 0.14285714285714285,
          0.1111111111111111, 0.09090909090909091, 0.07692307692307693]
    poly = cs[-1]
    for c in reversed(cs[:-1]):
        poly = c + s * poly
    return 2.0 * z * (1.0 + s * poly) + float(b - 33) * 0.6931471805599453


@given(st.integers(min_value=0, max_value=2 ** 32 - 1))
@settings(max_examples=500, deadline=None)
def test_det_ln_series_accuracy(m):
    """The atanh-series ln(u) used by weighted_sample(deterministic)
    stays within 2e-8 of true ln over the whole 32-bit uniform
    domain (statistical fidelity bound; exactness across engines is
    pinned separately by the oracle gate)."""
    import math

    approx = _py_det_ln_u(m)
    true = math.log(max(m, 1) / float(1 << 32))
    assert abs(approx - true) < 2e-8


# --------------------------------------------------------------- codecs
# Property fuzz for the round-9 codec surface: lossless containers
# roundtrip EXACTLY for arbitrary pixel content; the two JPEG entropy
# plans (baseline vs progressive) decode IDENTICALLY for arbitrary
# images and qualities. Dims stay small (the DCT/entropy cost is per
# block; the properties are about structure, not throughput).

_dims = st.tuples(
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=25),
)


@given(_dims, st.booleans(), st.booleans(), st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(dims, color, top_down, rnd):
    import numpy as np

    from datasplash_spark.functions import gifbmp as gb

    h, w = dims
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    d = gb.decode_bmp(gb.encode_bmp(img, top_down=top_down))
    exp = img if color else img[:, :, None]
    assert np.array_equal(d["pixels"], exp)
    assert (d["width"], d["height"]) == (w, h)


@given(
    _dims,
    st.integers(min_value=2, max_value=256),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(dims, n_colors, interlace, rnd):
    import numpy as np

    from datasplash_spark.functions import gifbmp as gb

    h, w = dims
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    # grayscale values drawn from a palette of n_colors distinct levels
    levels = rng.choice(256, size=min(n_colors, 256), replace=False)
    img = levels[rng.randint(0, len(levels), (h, w))].astype(np.uint8)
    d = gb.decode_gif(gb.encode_gif(img, interlace=interlace))
    assert d["n_frames"] == 1
    assert np.array_equal(d["pixels"][:, :, 0], img)
    assert np.array_equal(d["pixels"][:, :, 1], img)


@given(
    _dims,
    st.booleans(),
    st.sampled_from([25, 60, 85, 95]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_progressive_parity_property(dims, color, quality, succ, rnd):
    """For ANY image, quality, and scan script, progressive decode is
    bit-identical to baseline decode of the same pixels — both paths
    share the DCT/quant front half, so any divergence is an
    entropy-coding bug (the invariant the gated image_progressive
    query pins corpus-wide)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    h, w = dims
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    want = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=quality))
    got = J.decode_jpeg(
        J.encode_jpeg_progressive(img, quality=quality, successive=succ)
    )
    assert np.array_equal(got["pixels"], want["pixels"])


@given(
    st.binary(max_size=3000),
    st.integers(min_value=0, max_value=1),
    st.randoms(use_true_random=False),
)
@settings(max_examples=120, deadline=None)
def test_pdf_lzw_roundtrip_property(blob, early, rnd):
    """PDF LZW encoder/decoder are exact inverses for arbitrary
    bytes and both EarlyChange values; a structured low-entropy tail
    is appended so dictionary growth crosses the 9→10-bit width
    boundary in most examples (absolute correctness at the
    boundaries is pinned by the ISO 32000 worked example in
    test_extensions)."""
    from datasplash_spark.functions import pdf as P

    tail = bytes(
        rnd.randrange(4) * 17 for _ in range(rnd.randrange(0, 2000))
    )
    data = blob + tail
    assert P._lzw_decode(P._lzw_encode(data, early), early) == data


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\f"
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=4,
    ),
    st.sampled_from(["classic", "objstm"]),
    st.sampled_from(["flate", "lzw"]),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_property(pages, layout, filt, compress):
    """Writer → reader roundtrip for ANY text across both layouts,
    both filters, and raw streams: the extracted pages equal the
    input (modulo the writer's own line splitting, which is the
    newline identity)."""
    from datasplash_spark.functions import pdf as P

    # the writer encodes \r as an escape that reads back as \r, but
    # a bare \r\n collapses per PDF line semantics in the reader's
    # string machine only via explicit escapes — normalize input the
    # way the corpus path does (plain text, no control chars)
    pages = ["".join(ch for ch in p if ch >= " " or ch == "\n") for p in pages]
    raw = P.encode_pdf_text(
        pages, compress=compress, layout=layout, filter_name=filt
    )
    d = P.extract_pdf_text(raw)
    assert d["pages"] == pages and d["n_pages"] == len(pages)


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=2, max_value=16),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_gif_animation_roundtrip_property(n_frames, h, w, rnd):
    """Full-frame animated GIFs roundtrip losslessly through
    encode_gif_animation → decode_gif_frames for ANY frame count,
    dims, and pixel content (≤256 colors per frame by construction:
    uint8 grayscale)."""
    import numpy as np

    from datasplash_spark.functions import gifbmp as gb

    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    frames = [
        rng.randint(0, 256, (h, w)).astype(np.uint8)
        for _ in range(n_frames)
    ]
    outs = gb.decode_gif_frames(gb.encode_gif_animation(frames))
    assert len(outs) == n_frames
    for f, o in zip(frames, outs):
        assert o["n_frames"] == n_frames
        assert np.array_equal(o["pixels"][:, :, 0], f)
        assert np.array_equal(o["pixels"][:, :, 1], f)
        assert (o["pixels"][:, :, 3] == 255).all()


@given(
    _dims,
    st.sampled_from([1, 3, 4]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_png_adam7_parity_property(dims, ch, rnd):
    """For ANY image, the Adam7-interlaced encoding decodes to
    exactly the sequential encoding's pixels — the two IDAT layouts
    carry the same samples, so any divergence is a pass-geometry or
    per-pass unfilter bug."""
    import numpy as np

    from datasplash_spark.functions import multimodal as mm

    h, w = dims
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    il = mm.decode_image(mm.encode_png(img, interlace=True))
    seq = mm.decode_image(mm.encode_png(img))
    assert np.array_equal(il["pixels"], seq["pixels"])
    assert (il["width"], il["height"]) == (w, h)


@given(
    _dims,
    st.sampled_from([1, 3, 4]),
    st.sampled_from(["none", "lzw", "packbits"]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_property(dims, ch, comp, be, rnd):
    """TIFF writer → reader is lossless for ANY 8-bit image across
    channels, compressions, and byte orders (predictor exercised on
    the LZW path)."""
    import numpy as np

    from datasplash_spark.functions import tiff as T

    h, w = dims
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    raw = T.encode_tiff(
        img, compression=comp, predictor=comp == "lzw", big_endian=be,
        rows_per_strip=max(1, h // 2),
    )
    d = T.decode_tiff(raw)
    exp = img if ch != 1 else img[:, :, None]
    assert np.array_equal(d["pixels"], exp)
    assert (d["width"], d["height"]) == (w, h)


@given(
    st.integers(min_value=0, max_value=3000),
    st.sampled_from([1, 2]),
    st.sampled_from(["independent", "left-side", "right-side", "mid-side"]),
    st.sampled_from([8, 16, 24]),
    st.integers(min_value=16, max_value=1024),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_flac_roundtrip_property(n, nch, mode, bits, block, rnd):
    """FLAC writer → reader is LOSSLESS for any signal, channel
    count, stereo decorrelation mode, bit depth, and block size
    (stereo modes only apply to 2-channel input)."""
    import numpy as np

    from datasplash_spark.functions import flac as FL

    if nch == 1:
        mode = "independent"
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    lim = 1 << (bits - 1)
    # mix of smooth (predictor-friendly) and noisy segments
    smooth = (
        np.sin(np.linspace(0, 11, n)) * (lim // 2)
    ).astype(np.int64)
    noise = rng.randint(-lim, lim, n).astype(np.int64)
    sig = np.where(np.arange(n) % 3 == 0, noise, smooth)
    if nch == 2:
        sig = np.stack([sig, noise], axis=1)
    d = FL.decode_flac(
        FL.encode_flac(sig, bits=bits, block_size=block, channel_mode=mode)
    )
    exp = sig if nch == 2 else sig[:, None]
    assert d["n_samples"] == n and np.array_equal(d["samples"], exp)


_md_text = st.text(
    alphabet=st.sampled_from(
        list("abc xyz\n\t*_`#[]()<>!->~|\\=\"'.123")
    ),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(_md_text)
def test_markdown_extractor_total_and_canonical(src):
    """markdown_to_text is TOTAL over arbitrary marker soup (the
    router's quarantine must only ever see real decode failures, not
    extractor crashes) and its output honors the whitespace
    contract: no blank lines, no horizontal runs, no edge
    whitespace, and a second pass never un-collapses whitespace."""
    from datasplash_spark.functions.markdown import markdown_to_text

    out = markdown_to_text(src)
    assert isinstance(out, str)
    assert "\n\n" not in out
    assert "  " not in out and "\t" not in out
    assert out == out.strip()
    again = markdown_to_text(out)
    assert "\n\n" not in again and again == again.strip()


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600))
def test_document_sniff_total(raw):
    """sniff_document_kind never raises on arbitrary bytes and
    always lands in the routing alphabet — the router's dispatch is
    closed over whatever a crawl can contain."""
    from datasplash_spark.functions.doctext import sniff_document_kind

    kind = sniff_document_kind(raw)
    assert kind in {
        "", "pdf", "docx", "epub", "pptx", "odt", "zip", "rtf",
        "html", "latex", "xml", "vtt", "srt", "wiki", "md", "text",
    }
    assert (kind == "") == (raw == b"")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("abcdefgh")), min_size=1,
            max_size=12,
        ).map(lambda w: w),
        min_size=1,
        max_size=4,
    )
)
def test_markdown_writer_reader_parity_property(unit_words):
    """Property twin of the example-based parity test: for any
    clean-word units, the writer/reader round-trip recovers exactly
    the expected text."""
    from datasplash_spark.functions import markdown as md

    units = [" ".join([w, w + "x", w + "y"]) for w in unit_words]
    raw = md.encode_markdown(units, title="T x")
    got = md.markdown_to_text(raw.decode("utf-8"))
    assert got == md.markdown_expected_text(units, title="T x")


# ---------------------------------------------------------------
# Round-13 modality families: writer → reader round-trip laws over
# generated unit lists (the gate proves one deterministic corpus;
# these prove the grammar for ARBITRARY grammar-safe content, the
# same class the synthesizers normalize into).
# ---------------------------------------------------------------

_unit = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .-?!",
    max_size=40,
).map(lambda s: " ".join(s.split()))
_units = st.lists(_unit, min_size=1, max_size=5)


@given(_units, st.integers(min_value=0, max_value=999))
@settings(max_examples=120, deadline=None)
def test_log_dialects_roundtrip_property(units, doc_id):
    from datasplash_spark.functions import logtext as lg

    for d in (
        "syslog", "iso", "clf", "syslog5424", "logfmt", "jsonlog"
    ):
        text, stats = lg._log_scan(
            lg.encode_log(units, doc_id, d).decode("utf-8")
        )
        assert text == lg.log_expected_text(units, doc_id, d)
        exp = lg.log_expected_stats(units, d)
        assert {k: stats[k] for k in exp} == exp


@given(_units, st.integers(min_value=0, max_value=999))
@settings(max_examples=120, deadline=None)
def test_feed_grammars_roundtrip_property(units, doc_id):
    from datasplash_spark.functions import feeds as fd

    for atom in (False, True):
        enc = fd.encode_atom if atom else fd.encode_rss
        raw = enc(units, doc_id)
        assert fd.feed_to_text(raw) == fd.feed_expected_text(
            units, doc_id, atom
        )
        assert fd.feed_entry_count(raw) == len(units)


@given(_units, st.integers(min_value=0, max_value=999))
@settings(max_examples=120, deadline=None)
def test_ics_roundtrip_property(units, doc_id):
    from datasplash_spark.functions import calendar as ca

    raw = ca.encode_ics(units, doc_id).decode("utf-8")
    assert ca.ics_to_text(raw) == ca.ics_expected_text(
        units, doc_id
    )
    assert ca.ics_event_count(raw) == len(units)


@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFF
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=150, deadline=None)
def test_charset_transport_roundtrip_property(text):
    """BOM'd UTF-16/32 payloads decode back to the exact original
    text for arbitrary non-surrogate content. Text starting with
    U+0000 is excluded for the LE pair: ``FF FE 00 00`` is
    byte-identical as 'UTF-32-LE BOM' and 'UTF-16-LE BOM + NUL',
    and the sniff prefers UTF-32 per the Unicode convention (pinned
    in test_charset_bom_ambiguity_prefers_utf32)."""
    from datasplash_spark.functions import charset as cs

    if text.startswith("\x00"):
        text = "x" + text
    for kind, codec, bom in (
        ("utf16le", "utf-16-le", b"\xff\xfe"),
        ("utf16be", "utf-16-be", b"\xfe\xff"),
        ("utf32le", "utf-32-le", b"\xff\xfe\x00\x00"),
        ("utf32be", "utf-32-be", b"\x00\x00\xfe\xff"),
    ):
        raw = bom + text.encode(codec)
        assert cs.sniff_transport_encoding(raw) == kind
        assert cs.decode_transport(kind, raw) == text.encode(
            "utf-8"
        )


def test_charset_bom_ambiguity_prefers_utf32():
    """``FF FE 00 00`` is both a UTF-32-LE BOM and a UTF-16-LE BOM
    followed by U+0000; the sniff prefers UTF-32 per the Unicode
    convention (real text does not begin with NUL). Found by
    hypothesis; pinned so the preference never silently flips."""
    from datasplash_spark.functions import charset as cs

    assert cs.sniff_transport_encoding(
        b"\xff\xfe\x00\x00"
    ) == "utf32le"
    # the unambiguous LE cases still route utf16le
    assert cs.sniff_transport_encoding(
        b"\xff\xfe" + "x\x00y".encode("utf-16-le")
    ) == "utf16le"


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_charset_fallback_total_property(raw):
    """decode_fallback never raises on arbitrary bytes and names
    the codec it used; valid UTF-8 round-trips exactly."""
    from datasplash_spark.functions import charset as cs

    enc, text = cs.decode_fallback(raw)
    assert enc in ("utf-8", "cp1252")
    if enc == "utf-8" and not raw.startswith(b"\xef\xbb\xbf"):
        assert text == raw.decode("utf-8")
