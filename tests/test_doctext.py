"""Universal document-text router tests (round 11): every format
family routes to its extractor through one kernel, with per-row
quarantine and a plain-text fallback.
"""

from datasplash_spark.functions import doctext as dt
from datasplash_spark.functions import latex as lx
from datasplash_spark.functions import office as O
from datasplash_spark.functions import rtf as rt
from datasplash_spark.functions.pdf import encode_pdf_text


def test_sniff_routes_every_family():
    cases = {
        "pdf": encode_pdf_text(["x"]),
        "docx": O.encode_docx(["x"]),
        "epub": O.encode_epub(["x"], title="t"),
        "pptx": O.encode_pptx(["x"], title="t"),
        "odt": O.encode_odt(["x"]),
        "rtf": rt.encode_rtf(["x"]),
        "latex": b"\\documentclass{article}\\begin{document}x\\end{document}",
        "html": b"<!DOCTYPE html><html><body><p>x</p></body></html>",
        "text": b"just some plain words",
    }
    for kind, raw in cases.items():
        assert dt.sniff_document_kind(bytes(raw)) == kind, kind
    assert dt.sniff_document_kind(b"") == ""


def test_document_text_features_mixed_corpus(spark):
    docs = [
        (0, encode_pdf_text(["pdf words here"]), "pdf", "pdf words here"),
        (1, O.encode_docx(["docx words here"]), "docx", "docx words here"),
        (2, O.encode_epub(["epub words"], title="t"), "epub",
         "Chapter 0\nepub words"),
        (3, O.encode_pptx(["pptx words"], title="t"), "pptx",
         "Slide 0\npptx words"),
        (4, O.encode_odt(["odt words here"]), "odt", "odt words here"),
        (5, rt.encode_rtf(["rtf words here"]), "rtf", "rtf words here"),
        (6, b"\\begin{document}\\section{S}latex words\\end{document}",
         "latex", "S\nlatex words"),
        (7, b"<html><body><p>html words</p></body></html>", "html",
         "html words"),
        (8, b"plain words", "text", "plain words"),
        (9, b"%PDF-1.4 truncated garbage", "pdf", None),  # quarantine
    ]
    df = spark.createDataFrame(
        [(i, bytearray(raw)) for i, raw, _, _ in docs],
        "doc_id bigint, media binary",
    )
    out = {r.doc_id: r for r in dt.document_text_features(df).collect()}
    assert len(out) == 10
    for i, _, kind, text in docs:
        assert out[i].kind == kind, (i, out[i])
        if text is None:
            assert not out[i].ok and out[i].err
        else:
            assert out[i].ok, (i, out[i])
            assert out[i].text == text, (i, out[i].text)
