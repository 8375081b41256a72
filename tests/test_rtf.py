"""RTF extraction tests (round 11): structural scanner vs the
regex-pass failure modes — destination groups, \\uN fallback
skipping, \\binN raw-byte runs, hex escapes — plus round-trips
through the fixture writer and the Spark surface.
"""

from datasplash_spark.functions.rtf import (
    encode_rtf,
    rtf_text_features,
    rtf_to_text,
)


def test_roundtrip_basic():
    paras = ["hello world", "second paragraph here", "third"]
    raw = encode_rtf(paras)
    assert rtf_to_text(raw.decode("ascii")) == "\n".join(paras)


def test_font_table_and_info_dropped():
    raw = encode_rtf(["visible"]).decode("ascii")
    assert "Times New Roman" in raw and "synthetic" in raw
    out = rtf_to_text(raw)
    assert "Times" not in out and "synthetic" not in out
    assert out == "visible"


def test_unicode_escape_with_fallback_skip():
    # \uc1: one fallback char after \uN must be skipped
    assert rtf_to_text(r"{\rtf1 \uc1 caf\u233?e}") == "café" + "e"
    # round-trip through the writer
    assert rtf_to_text(encode_rtf(["café ünïcode"]).decode("ascii")) == (
        "café ünïcode"
    )
    # \uc2 skips two fallback chars
    assert rtf_to_text(r"{\rtf1 \uc2 a\u233??b}") == "aéb"
    # negative codepoint form (signed 16-bit)
    assert rtf_to_text(r"{\rtf1 \uc1 \u-10179?\u-8704? }") != ""


def test_bin_raw_bytes_skipped():
    # \bin5 is followed by 5 RAW bytes that may contain braces — a
    # regex/naive pass treats them as group closers and desyncs,
    # popping past the root so the trailing text is lost; the
    # scanner skips exactly 5 bytes, keeping the group structure
    # aligned ('after' is OUTSIDE the dropped pict group)
    src = "{\\rtf1 before {\\pict\\bin5 }}}}}} after}"
    out = rtf_to_text(src)
    assert out == "before after"


def test_escapes_and_specials():
    assert rtf_to_text(r"{\rtf1 a\~b \'e9 \{x\} \\y}") == "a b é {x} \\y"
    # tabs survive as separators but normalize to single spaces
    # (same whitespace contract as the LaTeX scanner)
    assert rtf_to_text(r"{\rtf1 one\tab two\par three}") == (
        "one two\nthree"
    )
    assert rtf_to_text(r"{\rtf1 it\rquote s \ldblquote q\rdblquote }") == (
        "it's \"q\""
    )


def test_starred_destinations_drop():
    src = r"{\rtf1 keep {\*\themedata 0011aabb} this}"
    assert rtf_to_text(src) == "keep this"


def test_lenient_on_malformed():
    assert rtf_to_text("{\\rtf1 unbalanced {group") == "unbalanced group"
    assert rtf_to_text("\\") == ""
    assert rtf_to_text("{\\rtf1 \\'zz bad hex}") == "bad hex"


def test_rtf_features_spark(spark):
    good = encode_rtf(["alpha beta", "gamma"])
    docs = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"not rtf at all")),
        ],
        "doc_id bigint, media binary",
    )
    rows = {r.doc_id: r for r in rtf_text_features(docs).collect()}
    assert rows[1].ok and rows[1].text == "alpha beta\ngamma"
    assert not rows[2].ok and "rtf" in rows[2].err


def test_field_result_survives_instruction_drops():
    # the visible text of a hyperlink is the field RESULT; only the
    # field INSTRUCTION (the URL machinery) drops
    src = (
        r"{\rtf1 see {\field{\*\fldinst HYPERLINK "
        r'"https://x.example"}{\fldrslt the linked words}} here}'
    )
    assert rtf_to_text(src) == "see the linked words here"
