"""Office-document modality tests (round 11): DOCX/EPUB writer →
extractor round-trips, the parts of each spec the naive extractor
gets wrong (field codes, spine order), and typed quarantines.
"""

import re
import zipfile
import io

import pytest

from datasplash_spark.functions import office as O


def test_docx_roundtrip_and_run_merge():
    paras = ["hello world foo bar", "", "single", "a b c d e f g"]
    r = O.parse_docx(O.encode_docx(paras))
    assert r["paragraphs"] == paras
    assert r["n_units"] == 4
    assert r["text"] == "\n".join(paras)


def test_docx_field_instruction_text_excluded():
    # the synthesized package plants a PAGEREF instrText run in every
    # paragraph; the naive all-text-nodes walk would include it
    raw = O.encode_docx(["visible text"])
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        part = zf.read("word/document.xml")
    assert b"PAGEREF" in part and b"instrText" in part
    r = O.parse_docx(raw)
    assert "PAGEREF" not in r["text"]
    assert r["text"] == "visible text"


def test_docx_tab_and_br_mapping():
    # hand-built document part: tabs and breaks map to \t and \n,
    # delText is excluded
    w = O._W_NS
    doc = (
        f"<w:document xmlns:w=\"{w}\"><w:body>"
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>c</w:t></w:r>"
        "<w:r><w:delText>GONE</w:delText></w:r></w:p>"
        "</w:body></w:document>"
    )
    base = O.encode_docx(["x"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            zout.writestr(
                name,
                doc if name == "word/document.xml" else zin.read(name),
            )
    r = O.parse_docx(buf.getvalue())
    assert r["paragraphs"] == ["a\tb\nc"]


def test_docx_follows_rels_not_hardcoded_path():
    # relocate the main part and point the relationship at it: a
    # hard-coded word/document.xml reader fails
    base = O.encode_docx(["moved part"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "word/document.xml":
                zout.writestr("word/doc2.xml", data)
            elif name == "_rels/.rels":
                zout.writestr(
                    name,
                    data.replace(b"word/document.xml", b"word/doc2.xml"),
                )
            else:
                zout.writestr(name, data)
    r = O.parse_docx(buf.getvalue())
    assert r["text"] == "moved part"


def test_epub_roundtrip_spine_order():
    chapters = ["alpha beta", "gamma delta epsilon", "", "omega"]
    raw = O.encode_epub(chapters, title="my book")
    r = O.parse_epub(raw)
    assert r["n_units"] == 4
    assert r["title"] == "my book"
    assert r["chapters"] == [
        "Chapter %d\n%s" % (i, c) for i, c in enumerate(chapters)
    ]
    # the bite: member order in the zip is NOT reading order
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        xhtml = [n for n in zf.namelist() if n.endswith(".xhtml")]
    naive = []
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        for n in xhtml:
            m = re.search(rb"<h1>([^<]*)</h1>", zf.read(n))
            naive.append(m.group(1).decode())
    assert naive != ["Chapter %d" % i for i in range(4)], (
        "fixture no longer bites: zip order equals spine order"
    )


def test_epub_mimetype_stored_first():
    raw = O.encode_epub(["x"], title="t")
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        infos = zf.infolist()
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED


def test_office_quarantines_typed():
    with pytest.raises(ValueError, match="docx"):
        O.parse_docx(b"PK\x03\x04 definitely not a zip")
    with pytest.raises(ValueError, match="mimetype"):
        # valid zip, wrong layout
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("whatever.txt", "x")
        O.parse_epub(buf.getvalue())
    # spine pointing at a missing member
    raw = O.encode_epub(["a", "b"], title="t")
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(raw)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            if name.endswith("_1.xhtml"):
                continue
            zout.writestr(name, zin.read(name))
    with pytest.raises(ValueError, match="missing spine item"):
        O.parse_epub(buf.getvalue())


def test_office_features_spark(spark):
    from datasplash_spark.functions.office import (
        office_text_features,
        synthesize_office_from_text,
    )

    docs = spark.createDataFrame(
        [(i, " ".join("w%d" % j for j in range(5 + i))) for i in range(8)],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in office_text_features(
            synthesize_office_from_text(docs)
        ).collect()
    }
    assert len(out) == 8
    for i in range(8):
        r = out[i]
        assert r.ok, r
        assert r.kind == ["docx", "epub", "pptx"][i % 3]
        text = " ".join("w%d" % j for j in range(5 + i))
        n = 1 + len(text) % 4
        assert r.n_units == n
        words = text.split(" ")
        units = [" ".join(words[k::n]) for k in range(n)]
        if i % 3 == 0:
            assert r.text == "\n".join(units)
        elif i % 3 == 1:
            assert r.text == "\f".join(
                "Chapter %d\n%s" % (k, u) for k, u in enumerate(units)
            )
        else:
            assert r.text == "\f".join(
                "Slide %d\n%s" % (k, u) for k, u in enumerate(units)
            )
    # poison row quarantines alone
    bad = spark.createDataFrame(
        [(99, bytearray(b"PK\x03\x04broken"))],
        "doc_id bigint, media binary",
    )
    rows = office_text_features(bad).collect()
    assert len(rows) == 1 and not rows[0].ok and rows[0].err


def test_sniff_tracks_relocated_main_part():
    # the sniffer must agree with the parser: docx detection is by
    # PACKAGE markers, so a relocated main part still routes to
    # parse_docx (which follows the relationship)
    base = O.encode_docx(["moved part"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "word/document.xml":
                zout.writestr("word/doc2.xml", data)
            elif name == "_rels/.rels":
                zout.writestr(
                    name,
                    data.replace(b"word/document.xml", b"word/doc2.xml"),
                )
            else:
                zout.writestr(name, data)
    raw = buf.getvalue()
    assert O.sniff_office_kind(raw) == "docx"
    assert O.parse_docx(raw)["text"] == "moved part"


def test_pptx_roundtrip_deck_order():
    slides = ["alpha beta gamma", "", "one two", "last slide here"]
    raw = O.encode_pptx(slides, title="deck")
    r = O.parse_pptx(raw)
    assert r["n_units"] == 4
    assert r["slides"] == [
        "Slide %d\n%s" % (i, s) for i, s in enumerate(slides)
    ]
    # the bite: slide FILENAMES and zip member order are scrambled —
    # reading xml parts in name order gives the wrong deck order
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        names = sorted(
            n for n in zf.namelist() if n.startswith("ppt/slides/")
        )
        by_name = [
            re.search(rb"<a:t>(Slide \d+)</a:t>", zf.read(n)).group(1)
            for n in names
        ]
    assert by_name != [b"Slide %d" % i for i in range(4)], (
        "fixture no longer bites: filename order equals deck order"
    )


def test_pptx_quarantines_typed():
    import pytest as _pytest

    raw = O.encode_pptx(["a", "b"], title="t")
    # drop one slide part: the sldIdLst walk must fail loudly
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(raw)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            if name.endswith("_1.xml"):
                continue
            zout.writestr(name, zin.read(name))
    with _pytest.raises(ValueError, match="missing slide part"):
        O.parse_pptx(buf.getvalue())


def test_sniff_routes_pptx():
    raw = O.encode_pptx(["x"], title="t")
    assert O.sniff_office_kind(raw) == "pptx"


def test_odt_roundtrip_and_whitespace_elements():
    paras = ["hello  world", "a    b", "", "single word here"]
    raw = O.encode_odt(paras)
    r = O.parse_odt(raw)
    assert r["paragraphs"] == paras
    # the bite: literal space runs are <text:s text:c="N"/> elements
    # in the xml — a naive itertext() walk loses them
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        content = zf.read("content.xml")
    assert b"<text:s text:c=" in content
    # tab / line-break elements expand
    doc = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="%s" xmlns:text="%s"><office:body><office:text>'
        "<text:p>a<text:tab/>b<text:line-break/>c</text:p>"
        "<text:h>Head</text:h>"
        "</office:text></office:body></office:document-content>"
        % (O._ODF_OFFICE_NS, O._ODF_TEXT_NS)
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(raw)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            zout.writestr(
                name, doc if name == "content.xml" else zin.read(name)
            )
    r2 = O.parse_odt(buf.getvalue())
    assert r2["paragraphs"] == ["a\tb\nc", "Head"]


def test_sniff_distinguishes_odt_from_epub():
    odt = O.encode_odt(["x"])
    epub = O.encode_epub(["x"], title="t")
    assert O.sniff_office_kind(odt) == "odt"
    assert O.sniff_office_kind(epub) == "epub"
    # features route both correctly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="odt"):
        O.parse_odt(epub)


def test_odt_through_features_kernel(spark):
    from datasplash_spark.functions.office import office_text_features

    docs = spark.createDataFrame(
        [(1, bytearray(O.encode_odt(["alpha beta", "gamma"])))],
        "doc_id bigint, media binary",
    )
    rows = office_text_features(docs).collect()
    assert len(rows) == 1
    assert rows[0].kind == "odt" and rows[0].ok
    assert rows[0].text == "alpha beta\ngamma"


def test_odt_spans_and_nested_paragraphs():
    # review fix (round 11): whitespace elements inside text:span
    # expand, and a paragraph nested in a frame is its own unit, not
    # duplicated into its parent
    doc = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="%s" xmlns:text="%s" '
        'xmlns:draw="urn:x-draw"><office:body><office:text>'
        '<text:p><text:span>a <text:s text:c="2"/>b</text:span>'
        " tail</text:p>"
        "<text:p>outer <draw:frame><text:p>inner para</text:p>"
        "</draw:frame> end</text:p>"
        "</office:text></office:body></office:document-content>"
        % (O._ODF_OFFICE_NS, O._ODF_TEXT_NS)
    )
    base = O.encode_odt(["x"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        buf, "w"
    ) as zout:
        for name in zin.namelist():
            zout.writestr(
                name, doc if name == "content.xml" else zin.read(name)
            )
    r = O.parse_odt(buf.getvalue())
    assert r["paragraphs"] == [
        "a   b tail",          # span-nested text:s expanded
        "outer  end",          # frame content excluded from parent
        "inner para",          # ...and emitted once as its own unit
    ], r["paragraphs"]
