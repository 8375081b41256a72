"""Universal document-text extraction (round 11).

A 100 TB ingest sees every document format at once; this module is
the ONE routing stage that turns an opaque ``binary`` column into
``(kind, text)`` rows, dispatching per row to the zero-dependency
extractors the sibling modules ship:

- ``%PDF``            → :func:`..pdf.extract_pdf_text`
- ``PK`` zip packages → :func:`..office.parse_docx` / ``parse_epub``
                        / ``parse_pptx`` / ``parse_odt`` (layout
                        sniff inside the container)
- ``{\\rtf``           → :func:`..rtf.rtf_to_text`
- LaTeX markers       → :func:`..latex.latex_to_text`
- HTML markers        → a kernel-side mirror of
                        :func:`..web.html_extract`'s regex pipeline
- anything else       → plain text (UTF-8, surrogate-safe)

Per-document typed quarantine: a poison file yields its own
``ok=false`` row with the routed kind and the extractor's typed
reason; siblings extract. Bytes never shuffle — the router runs
where the blob lives; only text rows cross.

Scale posture: the sniff is a few byte comparisons per row inside
the same Arrow batch the extractor consumes — one kernel, no
per-format scan. For format-homogeneous corpora prefer the direct
per-format features (their plans prune better); the router is for
the mixed-bag reality of crawl dumps and shared drives.
"""

from __future__ import annotations

import re


def _html_to_text_py(s: str) -> str:
    """Kernel-side mirror of ``web.html_extract``'s regex pipeline
    (script/style/comment drop, block closers → newlines, tag strip,
    core entities, whitespace collapse)."""
    s = re.sub(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(
        r"(?i)</(p|div|h[1-6]|li|tr|br|section|article)\s*>|<br\s*/?>",
        "\n",
        s,
    )
    s = re.sub(r"(?s)<[A-Za-z/!][^>]*>", " ", s)
    from .web import HTML_ENTITIES

    for ent, rep in HTML_ENTITIES:
        s = s.replace(ent, rep)
    s = re.sub(r"[ \t\r\f]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{2,}", "\n", s)
    return s.strip()


def sniff_document_kind(raw: bytes) -> str:
    """Route an opaque document blob to its extractor: 'pdf',
    'docx'/'epub'/'pptx'/'odt' (zip layouts), 'rtf', 'latex',
    'html', or 'text' (the fallback — plain text is a valid
    document). '' only for empty input."""
    if not raw:
        return ""
    if raw[:5] == b"%PDF-":
        return "pdf"
    if raw[:2] == b"PK":
        from . import office as of

        kind = of.sniff_office_kind(raw)
        return kind if kind != "unknown" else "zip"
    head = raw[:4096].lstrip()
    if head[:5] == b"{\\rtf":
        return "rtf"
    low = head[:1024].lower()
    if low.startswith((b"<!doctype html", b"<html")) or b"<html" in low:
        return "html"
    if (
        b"\\documentclass" in head
        or b"\\begin{document}" in head
    ):
        return "latex"
    return "text"


DOCUMENT_TEXT_SCHEMA = (
    "doc_id bigint, kind string, n_chars int, text string, "
    "ok boolean, err string"
)


def document_text_features(df, id_col="doc_id", media_col="media"):
    """Extract text from ANY supported document format into typed
    rows ``(doc_id, kind, n_chars, text, ok, err)`` — the universal
    front of a mixed-format ingest. See the module docstring for
    the routing table and the per-document quarantine contract."""

    def extract(batches):
        import pandas as pd

        from . import latex as lx
        from . import office as of
        from . import pdf as pf
        from . import rtf as rt

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                kind = sniff_document_kind(data)
                try:
                    if kind == "pdf":
                        text = pf.extract_pdf_text(data)["text"]
                    elif kind == "docx":
                        text = of.parse_docx(data)["text"]
                    elif kind == "epub":
                        text = of.parse_epub(data)["text"]
                    elif kind == "pptx":
                        text = of.parse_pptx(data)["text"]
                    elif kind == "odt":
                        text = of.parse_odt(data)["text"]
                    elif kind == "rtf":
                        text = rt.rtf_to_text(data.decode("latin-1"))
                    elif kind == "latex":
                        text = lx.latex_to_text(
                            data.decode("utf-8", "replace")
                        )
                    elif kind == "html":
                        text = _html_to_text_py(
                            data.decode("utf-8", "replace")
                        )
                    elif kind == "text":
                        text = data.decode("utf-8", "replace")
                    else:
                        raise ValueError(
                            f"doctext: unroutable container ({kind or 'empty'})"
                        )
                    rows.append((did, kind, len(text), text, True, None))
                except Exception as e:
                    rows.append((did, kind, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "n_chars", "text", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=DOCUMENT_TEXT_SCHEMA
    )


def synthesize_documents_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic MIXED-format document corpus: per doc
    ``1 + len(text) % units_mod`` units (words round-robin), the
    container rotating over all eight families on ``doc_id % 8``
    (pdf, docx, epub, pptx, odt, rtf, latex, html). Returns
    ``(doc_id, family, media binary)`` — the input for
    :func:`document_text_features` sweeps."""
    _FAMILIES = (
        "pdf", "docx", "epub", "pptx", "odt", "rtf", "latex", "html",
    )

    def synth(batches):
        import re as _re

        import pandas as pd

        from . import office as of
        from . import pdf as pf
        from . import rtf as rt

        for b in batches:
            ids, fams, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                # deterministic normalization (mirrored in the
                # oracle): markup-special characters -> '-',
                # whitespace runs -> one space, and unit count
                # clamped to the word count so no family sees an
                # empty unit (their empty-line semantics differ)
                t = _re.sub(r"[\\~^%&$#{}_<>]", "-", t or "")
                t = _re.sub(r"\s+", " ", t, flags=_re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                fam = _FAMILIES[did % 8]
                if fam == "pdf":
                    media = pf.encode_pdf_text(units)
                elif fam == "docx":
                    media = of.encode_docx(units)
                elif fam == "epub":
                    media = of.encode_epub(units, title="d%d" % did)
                elif fam == "pptx":
                    media = of.encode_pptx(units, title="d%d" % did)
                elif fam == "odt":
                    media = of.encode_odt(units)
                elif fam == "rtf":
                    media = rt.encode_rtf(units)
                elif fam == "latex":
                    media = (
                        "\\documentclass{article}\\begin{document}"
                        + "".join(
                            "\\section{Section %d}\n%s\n" % (i, u)
                            for i, u in enumerate(units)
                        )
                        + "\\end{document}"
                    ).encode()
                else:
                    media = (
                        "<html><head><title>d%d</title></head><body>"
                        % did
                        + "".join("<p>%s</p>" % u for u in units)
                        + "</body></html>"
                    ).encode()
                ids.append(did)
                fams.append(fam)
                medias.append(media)
            yield pd.DataFrame(
                {"doc_id": ids, "family": fams, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, family string, media binary"
    )
