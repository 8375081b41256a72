"""Wikitext (MediaWiki markup) text extraction (round 12).

Wikipedia dumps are a fixture of every pretraining corpus, and their
markup is wikitext, not HTML — this module gives the universal
document router (``functions/doctext.py``) a structural
wikitext-core extractor with the same zero-dependency contract as
the other format families: a deterministic writer (fixture half,
plants the adversarial constructs) and a reader the router
dispatches to per row inside the Arrow kernel. Bytes never shuffle;
only extracted text rows cross.

Extraction model (the wikitext core that carries article text):

- headings ``== Title ==`` keep the title (any level, balanced
  ``=`` runs)
- bold/italic quote runs (``'''``, ``''``, ``'''''``) drop
- wiki links: ``[[target|text]]`` → text, ``[[target]]`` → target,
  ``[[File:…]]`` / ``[[Image:…]]`` / ``[[Category:…]]`` drop whole
  (iterated innermost-out, so image captions containing links
  resolve before the enclosing file link drops)
- external links: ``[url text]`` → text, bare ``[url]`` drops
- templates ``{{…}}`` drop, iterated innermost-out for nesting
- ``<ref>…</ref>`` / ``<ref … />`` drop; other HTML-ish tags strip;
  comments drop; ``__MAGICWORDS__`` drop
- tables: ``{|`` … ``|}`` structure lines (``|-``, ``|+``) drop,
  cell rows (``|`` / ``!``, cells split on ``||`` / ``!!``) keep
  their cell text
- list/indent markers (``*#:;`` runs) strip; HTML entities decode
  via the shared table
- whitespace: horizontal runs collapse to one space, blank-line
  runs collapse to ONE newline (the shared paragraph contract)

Reference anchor: the reference has no wikitext codec — this is
north-star LLM-pipeline surface (BASELINE.json); the grammar
implemented is the public MediaWiki markup core.
"""

from __future__ import annotations

import re

from . import web as _web

_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_REF_RE = re.compile(r"(?is)<ref\b[^<>]*(?<!/)>.*?</ref\s*>")
_REF_SELF_RE = re.compile(r"(?i)<ref\b[^<>]*/>")
_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}")
_FILE_LINK_RE = re.compile(
    r"\[\[(?:[Ff]ile|[Ii]mage|[Cc]ategory):[^\[\]]*\]\]"
)
_PIPED_LINK_RE = re.compile(r"\[\[([^\[\]|]+)\|([^\[\]]*)\]\]")
_PLAIN_LINK_RE = re.compile(r"\[\[([^\[\]|]+)\]\]")
_EXT_LINK_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+[ \t]+([^\]]*)\]")
_EXT_BARE_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+\]")
_TAG_RE = re.compile(r"</?[A-Za-z][^<>\n]*>")
_MAGIC_RE = re.compile(r"__[A-Z]+__")
_HEADING_RE = re.compile(r"^(={1,6})[ \t]*(.*?)[ \t]*\1$")
_LIST_RE = re.compile(r"^[*#:;]+[ \t]*")
_CELL_SPLIT_RE = re.compile(r"\|\||!!")


def _iterate(pattern: re.Pattern, repl, s: str) -> str:
    prev = None
    while prev != s:
        prev = s
        s = pattern.sub(repl, s)
    return s


def wikitext_to_text(src: str) -> str:
    """Structural wikitext → plain text (see the module docstring
    for the grammar subset and the whitespace contract)."""
    s = src.replace("\r\n", "\n").replace("\r", "\n")
    s = _COMMENT_RE.sub(" ", s)
    s = _REF_RE.sub(" ", s)
    s = _REF_SELF_RE.sub(" ", s)
    s = _iterate(_TEMPLATE_RE, " ", s)
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    prev = None
    while prev != s:
        prev = s
        s = _FILE_LINK_RE.sub(" ", s)
        s = _PIPED_LINK_RE.sub(lambda m: m.group(2), s)
        s = _PLAIN_LINK_RE.sub(lambda m: m.group(1), s)
    s = _EXT_LINK_RE.sub(lambda m: m.group(1), s)
    s = _EXT_BARE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _MAGIC_RE.sub(" ", s)

    out: list[str] = []
    table_depth = 0
    for raw in s.split("\n"):
        t = raw.strip()
        if t.startswith("{|"):
            table_depth += 1
            continue
        if table_depth:
            if t.startswith("|}"):
                table_depth -= 1
                continue
            if t.startswith("|-") or t.startswith("|+"):
                continue
            if t.startswith("|") or t.startswith("!"):
                cells = [
                    c.strip() for c in _CELL_SPLIT_RE.split(t[1:])
                ]
                out.append(" ".join(c for c in cells if c))
                continue
            out.append(t)
            continue
        m = _HEADING_RE.match(t)
        if m:
            out.append(m.group(2))
            continue
        out.append(_LIST_RE.sub("", t))
    text = "\n".join(out)
    from .web import collapse_extracted_whitespace, decode_entities_py

    return collapse_extracted_whitespace(decode_entities_py(text))


def encode_wikitext(units: list[str], title: str | None = None) -> bytes:
    """Fixture half: a real wikitext article per unit list, planting
    the constructs the extractor must resolve — a ``== Section i ==``
    heading per unit, a plain wikilink around the first word, bold
    quotes around the middle word, a piped wikilink around the last,
    a template + a ``<ref>`` per section line (both must vanish),
    plus (document-wide) an infobox template, ``__TOC__``, a table
    whose CELL text must survive, a list item, an external link
    whose label survives, and a Category link that must vanish."""
    parts: list[str] = []
    if title:
        parts.append("= %s =" % title)
    for i, u in enumerate(units):
        words = u.split(" ") if u else []
        if words:
            words = list(words)
            mid = len(words) // 2
            if mid != 0:
                words[mid] = "'''%s'''" % words[mid]
            if len(words) > 1:
                words[-1] = "[[Target page|%s]]" % words[-1]
            words[0] = "[[%s]]" % words[0]
        body = " ".join(words)
        parts.append("== Section %d ==" % i)
        parts.append(
            "%s {{cite|ref=%d}} <ref>dropped citation %d</ref>"
            % (body, i, i)
        )
    parts.append("{{Infobox|key={{nested|value}}}}")
    parts.append("__TOC__")
    parts.append("{|")
    parts.append("|-")
    parts.append("| tcell one || tcell two")
    parts.append("|}")
    parts.append("* item one")
    parts.append("[https://example.com/x linktext]")
    parts.append("[[Category:Dropped]]")
    return "\n".join(parts).encode("utf-8")


def wikitext_expected_text(
    units: list[str], title: str | None = None
) -> str:
    """The exact text :func:`wikitext_to_text` extracts from
    :func:`encode_wikitext` — kept next to the writer so parity
    tests state the contract in one place."""
    parts: list[str] = []
    if title:
        parts.append(title)
    for i, u in enumerate(units):
        parts.append("Section %d" % i)
        if u:
            parts.append(u)
    parts.append("tcell one tcell two")
    parts.append("item one")
    parts.append("linktext")
    return "\n".join(parts)


WIKITEXT_FEATURES_SCHEMA = (
    "doc_id bigint, n_chars int, text string, ok boolean, err string"
)


def synthesize_wikitext_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic wikitext corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped to the word count so no unit is empty), rendered through
    :func:`encode_wikitext`. Input normalization (mirrored in the
    oracle): wikitext-special characters (incl. apostrophes — quote
    runs are markup) → ``-``, whitespace runs → one space, so the
    extracted text is exactly SQL-replayable on any corpus. Returns
    ``(doc_id, n_units, source_wiki binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, srcs = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[{}\[\]|=*#:;<>&!'_]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                srcs.append(encode_wikitext(units))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "source_wiki": srcs}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, source_wiki binary"
    )


def wikitext_text_features(df, id_col="doc_id", source_col="source_wiki"):
    """Extract text from a wikitext column into typed rows
    (``doc_id, n_chars, text, ok, err``) with per-document
    quarantine; extraction runs where the document lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, src in zip(b[id_col], b[source_col]):
                try:
                    raw = bytes(src) if src is not None else b""
                    t = wikitext_to_text(raw.decode("utf-8", "replace"))
                    rows.append((did, len(t), t, True, None))
                except Exception as e:  # pragma: no cover (lenient)
                    rows.append((did, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "text", "ok", "err"],
            )

    return df.select(id_col, source_col).mapInPandas(
        extract, schema=WIKITEXT_FEATURES_SCHEMA
    )
