"""Office-document modality: DOCX, EPUB, PPTX, ODT (round 11).

After HTML and PDF, office formats are the next-largest real-corpus
text source. Both are ZIP containers around XML — the same container
:func:`..sources.archives.read_zip_shards` opens — so the whole
modality is stdlib ``zipfile`` + ``xml.etree``: zero dependencies,
same typed-quarantine posture as the PDF reader.

- **DOCX** (ECMA-376 / ISO 29500 WordprocessingML): the package's
  ``_rels/.rels`` names the main document part; paragraphs are
  ``w:p`` elements whose runs (``w:r``) carry ``w:t`` text plus
  ``w:tab``/``w:br`` control elements. The extractor follows the
  relationship (not a hard-coded path), concatenates run text in
  document order, maps tabs/breaks, and EXCLUDES field-instruction
  text (``w:instrText``) and deleted text (``w:delText``) — the
  naive all-text-nodes walk gets those wrong, and the synthesizer
  plants field codes so the fixture bites.
- **EPUB** (IDPF OCF + OPF): ``mimetype`` member (stored first),
  ``META-INF/container.xml`` → rootfile → the OPF package, whose
  MANIFEST maps ids to hrefs and whose SPINE orders the reading.
  The extractor follows container → opf → spine; the synthesizer
  scrambles chapter FILENAMES and zip member order so
  concatenate-members-in-zip-order fails.

Scale posture: identical to the PDF family — encode/extract are
per-document Arrow-batched kernels (``mapInPandas``) running where
the blob lives; only typed text rows cross; at 100 TB follow with
the standard text pipeline.

Reference anchor: extends the reference's file-format IO surface
(datasplash read-text-file family); OOXML and EPUB are public ISO /
IDPF specs implemented from scratch.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

_W_NS = (
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
)
_REL_NS = (
    "http://schemas.openxmlformats.org/package/2006/relationships"
)
_OFFICE_DOC_REL = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships/officeDocument"
)
_OPF_NS = "http://www.idpf.org/2007/opf"
_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _split_two_runs(text: str) -> tuple[str, str]:
    """Split unit text into two run strings at the word midpoint,
    boundary space kept on the first run — shared by the DOCX and
    PPTX fixture writers so the run-merge rule can't diverge."""
    words = text.split(" ") if text else []
    h = len(words) // 2
    r1 = " ".join(words[:h])
    r2 = " ".join(words[h:])
    if r1:
        r1 += " " if r2 else ""
    return r1, r2


# ---------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------


def encode_docx(paragraphs: list[str]) -> bytes:
    """Minimal-but-conformant WordprocessingML package (fixture
    half): content types, package rels naming the main part, and a
    ``word/document.xml`` whose paragraphs split their text across
    TWO runs (space kept at the boundary) and carry a PAGEREF field
    instruction run — text the extractor must skip."""
    paras = []
    for i, p in enumerate(paragraphs):
        r1, r2 = _split_two_runs(p)
        runs = []
        if r1:
            runs.append(
                "<w:r><w:rPr><w:b/></w:rPr><w:t xml:space=\"preserve\">"
                + _xml_escape(r1) + "</w:t></w:r>"
            )
        runs.append(
            "<w:r><w:instrText xml:space=\"preserve\"> PAGEREF _p%d "
            "</w:instrText></w:r>" % i
        )
        runs.append(
            "<w:r><w:t xml:space=\"preserve\">" + _xml_escape(r2)
            + "</w:t></w:r>"
        )
        paras.append("<w:p>" + "".join(runs) + "</w:p>")
    document = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        f"<w:document xmlns:w=\"{_W_NS}\"><w:body>"
        + "".join(paras)
        + "<w:sectPr/></w:body></w:document>"
    )
    content_types = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/"
        "content-types\">"
        "<Default Extension=\"rels\" ContentType=\"application/vnd."
        "openxmlformats-package.relationships+xml\"/>"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "<Override PartName=\"/word/document.xml\" ContentType="
        "\"application/vnd.openxmlformats-officedocument."
        "wordprocessingml.document.main+xml\"/></Types>"
    )
    rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<Relationships xmlns=\"{_REL_NS}\">"
        f"<Relationship Id=\"rId1\" Type=\"{_OFFICE_DOC_REL}\" "
        "Target=\"word/document.xml\"/></Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("word/document.xml", document),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def parse_docx(raw: bytes) -> dict:
    """DOCX text extraction: follow ``_rels/.rels`` to the main
    document part, walk ``w:p`` paragraphs in document order,
    concatenate ``w:t`` run text with ``w:tab`` → TAB and ``w:br`` /
    ``w:cr`` → NEWLINE, skipping ``w:instrText`` / ``w:delText``.
    Returns ``{"paragraphs": [...], "text": paragraphs joined by
    NEWLINE, "n_units": int}``. Raises typed ``ValueError`` on a
    malformed package."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception as e:
        raise ValueError(f"docx: malformed zip container ({e})") from None
    with zf:
        try:
            rels = ET.fromstring(zf.read("_rels/.rels"))
        except KeyError:
            raise ValueError("docx: missing _rels/.rels") from None
        except ET.ParseError as e:
            raise ValueError(f"docx: malformed rels xml ({e})") from None
        target = None
        for rel in rels.findall(f"{{{_REL_NS}}}Relationship"):
            if rel.get("Type") == _OFFICE_DOC_REL:
                target = rel.get("Target", "").lstrip("/")
                break
        if not target:
            raise ValueError("docx: no officeDocument relationship")
        try:
            doc = ET.fromstring(zf.read(target))
        except KeyError:
            raise ValueError(f"docx: missing part {target!r}") from None
        except ET.ParseError as e:
            raise ValueError(
                f"docx: malformed document xml ({e})"
            ) from None
    w = f"{{{_W_NS}}}"
    body = doc.find(f"{w}body")
    if body is None:
        raise ValueError("docx: document has no body")
    paragraphs = []
    for p in body.iter(f"{w}p"):
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag
            if tag == f"{w}t":
                parts.append(el.text or "")
            elif tag == f"{w}tab":
                parts.append("\t")
            elif tag in (f"{w}br", f"{w}cr"):
                parts.append("\n")
            # w:instrText / w:delText fall through: field codes and
            # tracked deletions are not document text
        paragraphs.append("".join(parts))
    return {
        "paragraphs": paragraphs,
        "text": "\n".join(paragraphs),
        "n_units": len(paragraphs),
    }


# ---------------------------------------------------------------------
# EPUB
# ---------------------------------------------------------------------


def encode_epub(chapters: list[str], title: str = "doc") -> bytes:
    """Minimal-but-conformant EPUB (fixture half): stored-first
    ``mimetype``, OCF container pointing at the OPF, manifest +
    SPINE. Chapter filenames are deliberately scrambled relative to
    reading order (``c{(i*3)%n}_{i}.xhtml``) and zip member order is
    reversed, so only a spine-following reader extracts in order."""
    n = len(chapters)
    hrefs = ["c%d_%d.xhtml" % ((i * 3) % max(n, 1), i) for i in range(n)]
    manifest = "".join(
        f"<item id=\"ch{i}\" href=\"{hrefs[i]}\" "
        "media-type=\"application/xhtml+xml\"/>"
        for i in range(n)
    )
    spine = "".join(f"<itemref idref=\"ch{i}\"/>" for i in range(n))
    opf = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<package xmlns=\"{_OPF_NS}\" version=\"3.0\" "
        "unique-identifier=\"id\">"
        "<metadata><dc:title xmlns:dc=\"http://purl.org/dc/elements/"
        f"1.1/\">{_xml_escape(title)}</dc:title></metadata>"
        f"<manifest>{manifest}</manifest>"
        f"<spine>{spine}</spine></package>"
    )
    container = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<container xmlns=\"{_CONTAINER_NS}\" version=\"1.0\">"
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" "
        "media-type=\"application/oebps-package+xml\"/></rootfiles>"
        "</container>"
    )
    chapter_docs = [
        (
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
            "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head>"
            f"<title>{_xml_escape(title)}</title></head><body>"
            f"<h1>Chapter {i}</h1><p>{_xml_escape(c)}</p></body></html>"
        )
        for i, c in enumerate(chapters)
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED  # spec: stored, first
        zf.writestr(zi, "application/epub+zip")
        members = [
            ("META-INF/container.xml", container),
            ("OEBPS/content.opf", opf),
        ] + [
            ("OEBPS/" + hrefs[i], chapter_docs[i])
            for i in reversed(range(n))
        ]
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


_BLOCK_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "div"}


def _xhtml_block_text(doc: "ET.Element") -> str:
    """Block-level text of an XHTML document body, blocks joined by
    NEWLINE (tag names matched by localname, any namespace)."""
    blocks = []
    for el in doc.iter():
        if el.tag.split("}")[-1] == "body":
            # direct children only: a nested block's text belongs to
            # its outermost block (itertext covers the subtree)
            for child in list(el):
                if child.tag.split("}")[-1] in _BLOCK_TAGS:
                    blocks.append(
                        "".join(child.itertext()).strip()
                    )
            break
    return "\n".join(blocks)


def parse_epub(raw: bytes) -> dict:
    """EPUB text extraction: verify the ``mimetype`` member, follow
    ``META-INF/container.xml`` → OPF → manifest/spine, extract each
    chapter's block-level body text IN SPINE ORDER. Returns
    ``{"chapters": [...], "text": chapters joined by FORM-FEED,
    "n_units": int, "title": str}``. Raises typed ``ValueError`` on
    a malformed package."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception as e:
        raise ValueError(f"epub: malformed zip container ({e})") from None
    with zf:
        try:
            if zf.read("mimetype") != b"application/epub+zip":
                raise ValueError("epub: wrong mimetype")
        except KeyError:
            raise ValueError("epub: missing mimetype member") from None
        try:
            container = ET.fromstring(zf.read("META-INF/container.xml"))
        except KeyError:
            raise ValueError("epub: missing container.xml") from None
        except ET.ParseError as e:
            raise ValueError(
                f"epub: malformed container.xml ({e})"
            ) from None
        root = container.find(
            f"{{{_CONTAINER_NS}}}rootfiles/"
            f"{{{_CONTAINER_NS}}}rootfile"
        )
        if root is None or not root.get("full-path"):
            raise ValueError("epub: container names no rootfile")
        opf_path = root.get("full-path")
        try:
            opf = ET.fromstring(zf.read(opf_path))
        except KeyError:
            raise ValueError(
                f"epub: missing rootfile {opf_path!r}"
            ) from None
        except ET.ParseError as e:
            raise ValueError(f"epub: malformed opf ({e})") from None
        o = f"{{{_OPF_NS}}}"
        title_el = opf.find(
            f"{o}metadata/{{http://purl.org/dc/elements/1.1/}}title"
        )
        title = (title_el.text or "") if title_el is not None else ""
        hrefs = {
            item.get("id"): item.get("href")
            for item in opf.iter(f"{o}item")
        }
        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        chapters = []
        for ref in opf.iter(f"{o}itemref"):
            href = hrefs.get(ref.get("idref"))
            if href is None:
                raise ValueError(
                    f"epub: spine idref {ref.get('idref')!r} not in "
                    "manifest"
                )
            try:
                cdoc = ET.fromstring(zf.read(base + href))
            except KeyError:
                raise ValueError(
                    f"epub: missing spine item {href!r}"
                ) from None
            except ET.ParseError as e:
                raise ValueError(
                    f"epub: malformed chapter xml ({e})"
                ) from None
            chapters.append(_xhtml_block_text(cdoc))
    return {
        "chapters": chapters,
        "text": "\f".join(chapters),
        "n_units": len(chapters),
        "title": title,
    }


# ---------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------


def sniff_office_kind(raw: bytes) -> str:
    """'docx' / 'epub' / 'unknown' by container members (both are
    zips; the discriminator is the member layout, not the magic)."""
    if raw[:2] != b"PK":
        return "unknown"
    try:
        with zipfile.ZipFile(io.BytesIO(raw)) as zf:
            names = set(zf.namelist())
    except Exception:
        return "unknown"
    if "META-INF/container.xml" in names:
        return "epub"
    if "content.xml" in names and "META-INF/manifest.xml" in names:
        return "odt"
    if "mimetype" in names:
        return "epub"  # OCF-shaped fallback; parse_epub verifies
    if any(n.startswith("ppt/") for n in names):
        return "pptx"
    # docx by PACKAGE markers, not the main-part path — the part can
    # be relocated and the parsers follow the relationship to it
    if (
        "word/document.xml" in names
        or "_rels/.rels" in names
        or "[Content_Types].xml" in names
    ):
        return "docx"
    return "unknown"


OFFICE_FEATURES_SCHEMA = (
    "doc_id bigint, kind string, n_units int, n_chars int, "
    "text string, ok boolean, err string"
)


def office_text_features(df, id_col="doc_id", media_col="media"):
    """Extract text from a DOCX/EPUB column into typed rows:
    ``(doc_id, kind, n_units, n_chars, text, ok, err)`` with
    per-document quarantine (a poison package yields its own
    ``ok=false`` row; siblings extract). Bytes never shuffle —
    extraction runs where the document lives; only text rows
    cross."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                kind = sniff_office_kind(data)
                try:
                    if kind == "docx":
                        d = parse_docx(data)
                    elif kind == "epub":
                        d = parse_epub(data)
                    elif kind == "pptx":
                        d = parse_pptx(data)
                    elif kind == "odt":
                        d = parse_odt(data)
                    else:
                        raise ValueError(
                            "office: unrecognized container"
                        )
                    rows.append(
                        (did, kind, d["n_units"], len(d["text"]),
                         d["text"], True, None)
                    )
                except Exception as e:
                    rows.append(
                        (did, kind, None, None, None, False, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "n_units", "n_chars", "text",
                    "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=OFFICE_FEATURES_SCHEMA
    )


def synthesize_office_from_text(
    df, text="text", id_col="doc_id", units_mod=4
):
    """Deterministic synthetic office corpus — the document analog
    of ``synthesize_pdf_from_text``: per doc ``1 + len(text) %
    units_mod`` units (paragraphs / chapters / slides; words split
    across units round-robin), rotating DOCX / EPUB / PPTX on
    ``doc_id % 3``. Returns ``(doc_id, kind, n_units, media
    binary)``."""
    from pyspark.sql import functions as F

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, kinds, nus, medias = [], [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                # deterministic whitespace normalization (mirrored
                # in the oracle): the EPUB block extractor strips
                # block edges, so unit text must carry no leading/
                # trailing/runs-of whitespace for the md5 to be
                # SQL-replayable on any corpus (review finding)
                import re as _re

                t = _re.sub(r"\s+", " ", t or "", flags=_re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                units = [
                    " ".join(words[i::n]) for i in range(n)
                ]
                if did % 3 == 0:
                    kind, media = "docx", encode_docx(units)
                elif did % 3 == 1:
                    kind, media = "epub", encode_epub(
                        units, title="doc %d" % did
                    )
                else:
                    kind, media = "pptx", encode_pptx(
                        units, title="doc %d" % did
                    )
                ids.append(did)
                kinds.append(kind)
                nus.append(n)
                medias.append(media)
            yield pd.DataFrame(
                {
                    "doc_id": ids, "kind": kinds, "n_units": nus,
                    "media": medias,
                }
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, kind string, n_units int, media binary"
    )


# ---------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------

_P_NS = (
    "http://schemas.openxmlformats.org/presentationml/2006/main"
)
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R_NS = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships"
)
_SLIDE_REL = _R_NS + "/slide"


def encode_pptx(slides: list[str], title: str = "deck") -> bytes:
    """Minimal-but-conformant PresentationML package (fixture half):
    package rels → presentation part, whose ``sldIdLst`` orders the
    slides by RELATIONSHIP id; slide filenames are scrambled
    relative to deck order (``s{(i*3)%n}_{i}.xml``) so only a
    rels-following reader extracts in order. Each slide carries a
    title paragraph and a body paragraph split across two runs."""
    n = len(slides)
    names = ["s%d_%d.xml" % ((i * 3) % max(n, 1), i) for i in range(n)]
    slide_docs = []
    for i, text in enumerate(slides):
        r1, r2 = _split_two_runs(text)
        runs = ""
        if r1:
            runs += (
                "<a:r><a:rPr b=\"1\"/><a:t>" + _xml_escape(r1)
                + "</a:t></a:r>"
            )
        runs += "<a:r><a:t>" + _xml_escape(r2) + "</a:t></a:r>"
        slide_docs.append(
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
            f"<p:sld xmlns:p=\"{_P_NS}\" xmlns:a=\"{_A_NS}\">"
            "<p:cSld><p:spTree>"
            "<p:sp><p:txBody>"
            f"<a:p><a:r><a:t>Slide {i}</a:t></a:r></a:p>"
            f"<a:p>{runs}</a:p>"
            "</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )
    pres = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<p:presentation xmlns:p=\"{_P_NS}\" xmlns:r=\"{_R_NS}\">"
        "<p:sldIdLst>"
        + "".join(
            f"<p:sldId id=\"{256 + i}\" r:id=\"rId{i + 1}\"/>"
            for i in range(n)
        )
        + "</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<Relationships xmlns=\"{_REL_NS}\">"
        + "".join(
            f"<Relationship Id=\"rId{i + 1}\" Type=\"{_SLIDE_REL}\" "
            f"Target=\"slides/{names[i]}\"/>"
            for i in range(n)
        )
        + "</Relationships>"
    )
    rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<Relationships xmlns=\"{_REL_NS}\">"
        f"<Relationship Id=\"rId1\" Type=\"{_OFFICE_DOC_REL}\" "
        "Target=\"ppt/presentation.xml\"/></Relationships>"
    )
    content_types = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/"
        "2006/content-types\">"
        "<Default Extension=\"rels\" ContentType=\"application/vnd."
        "openxmlformats-package.relationships+xml\"/>"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "</Types>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        members = [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("ppt/presentation.xml", pres),
            ("ppt/_rels/presentation.xml.rels", pres_rels),
        ] + [
            ("ppt/slides/" + names[i], slide_docs[i])
            for i in reversed(range(n))  # zip order != deck order
        ]
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def parse_pptx(raw: bytes) -> dict:
    """PPTX text extraction: follow the package relationship to the
    presentation part, order slides by ``sldIdLst`` → relationship
    ids (NOT filename order), and per slide concatenate ``a:t`` run
    text within each ``a:p`` paragraph (``a:br`` → newline),
    paragraphs joined by NEWLINE, slides by FORM-FEED. Raises typed
    ``ValueError`` on a malformed package."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception as e:
        raise ValueError(f"pptx: malformed zip container ({e})") from None
    with zf:
        try:
            rels = ET.fromstring(zf.read("_rels/.rels"))
        except KeyError:
            raise ValueError("pptx: missing _rels/.rels") from None
        except ET.ParseError as e:
            raise ValueError(f"pptx: malformed rels xml ({e})") from None
        pres_path = None
        for rel in rels.findall(f"{{{_REL_NS}}}Relationship"):
            if rel.get("Type") == _OFFICE_DOC_REL:
                pres_path = rel.get("Target", "").lstrip("/")
                break
        if not pres_path:
            raise ValueError("pptx: no officeDocument relationship")
        try:
            pres = ET.fromstring(zf.read(pres_path))
        except KeyError:
            raise ValueError(
                f"pptx: missing part {pres_path!r}"
            ) from None
        except ET.ParseError as e:
            raise ValueError(
                f"pptx: malformed presentation xml ({e})"
            ) from None
        base = (
            pres_path.rsplit("/", 1)[0] + "/" if "/" in pres_path else ""
        )
        rels_path = (
            base + "_rels/" + pres_path.rsplit("/", 1)[-1] + ".rels"
        )
        try:
            prels = ET.fromstring(zf.read(rels_path))
        except KeyError:
            raise ValueError(
                f"pptx: missing presentation rels {rels_path!r}"
            ) from None
        except ET.ParseError as e:
            raise ValueError(
                f"pptx: malformed presentation rels ({e})"
            ) from None
        targets = {
            rel.get("Id"): rel.get("Target", "")
            for rel in prels.findall(f"{{{_REL_NS}}}Relationship")
        }
        p, a, r = f"{{{_P_NS}}}", f"{{{_A_NS}}}", f"{{{_R_NS}}}"
        slides = []
        for sld in pres.iter(f"{p}sldId"):
            rid = sld.get(f"{r}id")
            target = targets.get(rid)
            if not target:
                raise ValueError(
                    f"pptx: sldIdLst names unknown relationship {rid!r}"
                )
            path = target if target.startswith("ppt/") else base + target
            try:
                sdoc = ET.fromstring(zf.read(path))
            except KeyError:
                raise ValueError(
                    f"pptx: missing slide part {path!r}"
                ) from None
            except ET.ParseError as e:
                raise ValueError(
                    f"pptx: malformed slide xml ({e})"
                ) from None
            paras = []
            for ap in sdoc.iter(f"{a}p"):
                parts: list[str] = []
                for el in ap.iter():
                    if el.tag == f"{a}t":
                        parts.append(el.text or "")
                    elif el.tag == f"{a}br":
                        parts.append("\n")
                paras.append("".join(parts))
            slides.append("\n".join(paras))
    return {
        "slides": slides,
        "text": "\f".join(slides),
        "n_units": len(slides),
    }


# ---------------------------------------------------------------------
# ODT (OpenDocument text)
# ---------------------------------------------------------------------

_ODF_OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_ODF_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODT_MIME = "application/vnd.oasis.opendocument.text"


def encode_odt(paragraphs: list[str]) -> bytes:
    """Minimal-but-conformant OpenDocument text package (fixture
    half): stored-first ``mimetype`` (the OpenDocument analog of
    EPUB's), ``META-INF/manifest.xml``, and a ``content.xml`` whose
    paragraphs encode runs of spaces as ``<text:s text:c="N"/>``
    after the first space — the ODF whitespace rule a naive
    text-node walk gets wrong."""
    paras = []
    for p in paragraphs:
        # ODF whitespace encoding: a literal run of N spaces is one
        # space + <text:s text:c="N-1"/>
        out = []
        i = 0
        while i < len(p):
            if p[i] == " ":
                j = i
                while j < len(p) and p[j] == " ":
                    j += 1
                out.append(" ")
                if j - i > 1:
                    out.append('<text:s text:c="%d"/>' % (j - i - 1))
                i = j
            else:
                k = i
                while k < len(p) and p[k] != " ":
                    k += 1
                out.append(_xml_escape(p[i:k]))
                i = k
        paras.append("<text:p>" + "".join(out) + "</text:p>")
    content = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<office:document-content xmlns:office=\"{_ODF_OFFICE_NS}\" "
        f"xmlns:text=\"{_ODF_TEXT_NS}\">"
        "<office:body><office:text>"
        + "".join(paras)
        + "</office:text></office:body></office:document-content>"
    )
    manifest = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<manifest:manifest xmlns:manifest=\"urn:oasis:names:tc:"
        "opendocument:xmlns:manifest:1.0\">"
        f"<manifest:file-entry manifest:media-type=\"{_ODT_MIME}\" "
        "manifest:full-path=\"/\"/>"
        "<manifest:file-entry manifest:media-type=\"text/xml\" "
        "manifest:full-path=\"content.xml\"/></manifest:manifest>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, _ODT_MIME)
        for name, data in (
            ("META-INF/manifest.xml", manifest),
            ("content.xml", content),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def parse_odt(raw: bytes) -> dict:
    """ODT text extraction: verify the stored ``mimetype``, walk
    ``content.xml``'s ``office:text`` paragraphs/headings in
    document order, expanding ODF whitespace elements (``text:s``
    → N spaces, ``text:tab`` → TAB, ``text:line-break`` →
    NEWLINE). Returns ``{"paragraphs": [...], "text": joined by
    NEWLINE, "n_units": int}``; typed ``ValueError`` on a malformed
    package."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception as e:
        raise ValueError(f"odt: malformed zip container ({e})") from None
    with zf:
        try:
            if zf.read("mimetype").decode("latin-1") != _ODT_MIME:
                raise ValueError("odt: wrong mimetype")
        except KeyError:
            raise ValueError("odt: missing mimetype member") from None
        try:
            doc = ET.fromstring(zf.read("content.xml"))
        except KeyError:
            raise ValueError("odt: missing content.xml") from None
        except ET.ParseError as e:
            raise ValueError(f"odt: malformed content.xml ({e})") from None
    t = f"{{{_ODF_TEXT_NS}}}"
    body_text = doc.find(
        f"{{{_ODF_OFFICE_NS}}}body/{{{_ODF_OFFICE_NS}}}text"
    )
    if body_text is None:
        raise ValueError("odt: content has no office:text body")

    def para_text(p) -> str:
        # recursive: whitespace elements expand at ANY depth (real
        # LibreOffice wraps runs in text:span — review finding);
        # a NESTED paragraph (frames/tables) is its own unit, not
        # part of the parent's text
        parts: list[str] = [p.text or ""]
        for el in p:
            if el.tag == f"{t}s":
                parts.append(" " * int(el.get(f"{t}c", "1")))
            elif el.tag == f"{t}tab":
                parts.append("\t")
            elif el.tag == f"{t}line-break":
                parts.append("\n")
            elif el.tag in (f"{t}p", f"{t}h"):
                pass
            else:
                parts.append(para_text(el))
            parts.append(el.tail or "")
        return "".join(parts)

    paragraphs = [
        para_text(p)
        for p in body_text.iter()
        if p.tag in (f"{t}p", f"{t}h")
    ]
    return {
        "paragraphs": paragraphs,
        "text": "\n".join(paragraphs),
        "n_units": len(paragraphs),
    }
