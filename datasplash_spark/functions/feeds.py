"""RSS / Atom feed text extraction (round 13).

Crawl dumps are full of syndication feeds; the generic XML pass
(``doctext._xml_to_text_py``) extracts EVERY text node, so a feed's
GUIDs, permalinks, pubDates, and author emails enter the corpus as
prose. This module gives the universal router a feed family under
the shared contract:

- the feed ``<title>`` survives as the document's first line;
- each item/entry contributes its title line and its body —
  RSS ``<description>`` / Atom ``<summary>``/``<content>`` — with
  HTML-escaped bodies (the dominant convention: feeds ship
  ``&lt;p&gt;…`` markup) run through the shared HTML extractor;
- channel plumbing (links, GUIDs, dates, authors, categories,
  generator tags) is metadata and VANISHES.

Supported grammars: RSS 2.0 (``<rss><channel><item>…``) and Atom
(``<feed xmlns="http://www.w3.org/2005/Atom"><entry>…``). RSS 1.0
RDF stays on the generic XML path. Parsing uses ElementTree with
the same DTD rejection the generic pass applies (billion-laughs
guard); a feed-shaped document that does not parse is POISON and
raises typed — unlike the generic pass, a feed has one grammar and
a broken one should quarantine, not degrade to tag soup.

Reference anchor: the reference has no feed codec — north-star
LLM-pipeline surface (BASELINE.json); grammar per the RSS 2.0
specification (cyber.harvard.edu/rss) and RFC 4287 (Atom).
"""

from __future__ import annotations

import re

from . import web as _web

_ATOM_NS = "{http://www.w3.org/2005/Atom}"

#: root-element probe: optional BOM/XML declaration/comments, then
#: the rss or Atom-feed root tag (feeds without a declaration are
#: common)
_FEED_ROOT_RE = re.compile(
    rb"^(?:<\?xml[^>]*\?>\s*|<!--.*?-->\s*)*<(rss[\s>]|feed[\s>])",
    re.DOTALL,
)


def sniff_feed(head: bytes) -> bool:
    """True when the head's ROOT element is ``<rss>`` or
    ``<feed>`` — declaration and comments skipped, anything else
    (xhtml, office XML, JATS/DocBook, RDF) left to its own
    route."""
    return _FEED_ROOT_RE.match(head) is not None


def _strip_ns(tag) -> str:
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1].lower()


def feed_to_text(raw: bytes) -> str:
    """One RSS/Atom feed → corpus text (module docstring). Raises
    typed errors for DTD-carrying or unparseable input — a feed has
    one grammar; a broken one quarantines its document."""
    import xml.etree.ElementTree as ET

    from .doctext import _html_to_text_py
    from .web import collapse_extracted_whitespace

    if b"<!DOCTYPE" in raw[:4096] or b"<!ENTITY" in raw:
        raise ValueError("feed: DTD in feed XML (entity-expansion "
                         "guard) — not a data feed")
    try:
        root = ET.fromstring(raw)
    except ET.ParseError as e:
        raise ValueError(f"feed: unparseable XML ({e})")
    tag = _strip_ns(root.tag)
    parts: list[str] = []

    def _body(text: str) -> str:
        # feeds ship HTML-escaped markup in bodies routinely; the
        # parser already un-escaped entities, so markup appears as
        # tags here — strip through the shared extractor. Plain
        # text passes through it unchanged under the whitespace
        # contract.
        return _html_to_text_py(text)

    if tag == "rss":
        channel = root.find("channel")
        if channel is None:
            raise ValueError("feed: rss without <channel>")
        t = channel.findtext("title") or ""
        t = collapse_extracted_whitespace(t)
        if t:
            parts.append(t)
        for item in channel.iter("item"):
            it = collapse_extracted_whitespace(
                item.findtext("title") or ""
            )
            if it:
                parts.append(it)
            body = _body(item.findtext("description") or "")
            if body:
                parts.append(body)
    elif tag == "feed":
        # namespace-agnostic child lookup: Atom 1.0 is the common
        # case, but Atom 0.3 feeds (purl.org/atom/ns#) and sloppy
        # namespace-less exports sniff identically and would
        # otherwise extract title-only text silently
        def _child(el, name):
            for c in el:
                if _strip_ns(c.tag) == name:
                    return c
            return None

        def _children(el, name):
            return [c for c in el if _strip_ns(c.tag) == name]

        t_el = _child(root, "title")
        t = collapse_extracted_whitespace(
            (t_el.text or "") if t_el is not None else ""
        )
        if t:
            parts.append(t)
        for entry in _children(root, "entry"):
            it_el = _child(entry, "title")
            it = collapse_extracted_whitespace(
                (it_el.text or "") if it_el is not None else ""
            )
            if it:
                parts.append(it)
            body_el = _child(entry, "content")
            if body_el is None:
                body_el = _child(entry, "summary")
            body = _body(
                (body_el.text or "") if body_el is not None else ""
            )
            if body:
                parts.append(body)
    else:
        raise ValueError(f"feed: unexpected root <{tag}>")
    return "\n".join(parts)


def feed_entry_count(raw: bytes) -> int:
    """Number of items/entries in the feed (the shape half of the
    gate)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(raw)
    if _strip_ns(root.tag) == "rss":
        channel = root.find("channel")
        return len(list(channel.iter("item"))) if channel is not None else 0
    return sum(1 for c in root if _strip_ns(c.tag) == "entry")


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def encode_rss(units: list[str], doc_id: int = 0) -> bytes:
    """Fixture half: a real RSS 2.0 feed per unit list — channel
    plumbing (link, pubDate, generator) that must VANISH, a channel
    title that must survive first, and one ``<item>`` per unit
    whose description carries HTML-ESCAPED ``<p>`` markup (the
    entity-decode + html-strip pin) plus guid/link/pubDate noise."""
    items = []
    for u, unit in enumerate(units):
        desc = _xml_escape("<p>%s</p>" % _xml_escape(unit))
        items.append(
            "<item>"
            "<title>Entry %d</title>"
            "<link>https://example.com/%d/%d</link>"
            "<guid isPermaLink=\"false\">tag:example,%d:%d</guid>"
            "<pubDate>Mon, 01 Jan 2024 00:00:%02d +0000</pubDate>"
            "<description>%s</description>"
            "</item>" % (u, doc_id, u, doc_id, u, u % 60, desc)
        )
    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<rss version="2.0"><channel>'
        "<title>Feed d%d</title>"
        "<link>https://example.com/</link>"
        "<description>fixture channel</description>"
        "<generator>datasplash fixtures</generator>"
        "%s</channel></rss>" % (doc_id, "".join(items))
    )
    return xml.encode("utf-8")


def encode_atom(units: list[str], doc_id: int = 0) -> bytes:
    """Fixture half: a real Atom feed per unit list — namespaced
    root, feed plumbing (id, updated, author) that must VANISH, and
    one ``<entry>`` per unit with a PLAIN-TEXT summary (the text
    body path) plus id/updated/link noise."""
    entries = []
    for u, unit in enumerate(units):
        entries.append(
            "<entry>"
            "<title>Entry %d</title>"
            "<id>tag:example,%d:%d</id>"
            "<updated>2024-01-01T00:00:%02dZ</updated>"
            '<link href="https://example.com/%d/%d"/>'
            "<summary>%s</summary>"
            "</entry>"
            % (u, doc_id, u, u % 60, doc_id, u, _xml_escape(unit))
        )
    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        "<title>Feed d%d</title>"
        "<id>tag:example,%d</id>"
        "<updated>2024-01-01T00:00:00Z</updated>"
        "<author><name>fixture</name>"
        "<email>noise@example.com</email></author>"
        "%s</feed>" % (doc_id, doc_id, "".join(entries))
    )
    return xml.encode("utf-8")


def feed_expected_text(
    units: list[str], doc_id: int = 0, atom: bool = False
) -> str:
    """The exact text :func:`feed_to_text` extracts from
    :func:`encode_rss` / :func:`encode_atom`: the feed title, then
    per unit its entry title and (when non-empty) its body — both
    grammars collapse to the same lines under the shared whitespace
    contract."""
    parts = ["Feed d%d" % doc_id]
    for u, unit in enumerate(units):
        parts.append("Entry %d" % u)
        if unit:
            parts.append(unit)
    return "\n".join(parts)


FEED_FEATURES_SCHEMA = (
    "doc_id bigint, grammar string, n_entries int, text string, "
    "ok boolean, err string"
)

#: deterministic poison blob for the gate's quarantine rows: an rss
#: root with an unclosed item — feed-shaped, unparseable
POISON_FEED = (
    b'<?xml version="1.0"?><rss version="2.0"><channel>'
    b"<title>broken</title><item><title>x</rss>"
)


def synthesize_feed_from_text(
    df, text="text", id_col="doc_id", units_mod=3, poison_mod=0
):
    """Deterministic synthetic feed corpus for the corpus gate: per
    doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), rendered through :func:`encode_rss` for even doc_ids
    (HTML-escaped bodies — the entity + html-strip path) and
    :func:`encode_atom` for odd (plain-text summaries). With
    ``poison_mod=k`` every doc where ``doc_id % k == 7`` is
    replaced by :data:`POISON_FEED`. Input normalization (mirrored
    in the oracle): markup specials → ``-``, the shared divergent
    set → ``-``, whitespace runs → one space. Returns ``(doc_id,
    n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[<>&\"'\\\\]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                if poison_mod and did % poison_mod == 7:
                    medias.append(POISON_FEED)
                elif did % 2 == 0:
                    medias.append(encode_rss(units, did))
                else:
                    medias.append(encode_atom(units, did))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def feed_text_features(df, id_col="doc_id", media_col="media"):
    """Extract feeds into typed rows (``doc_id, grammar, n_entries,
    text, ok, err``) with per-document quarantine; extraction runs
    where the blob lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    text = feed_to_text(data)
                    m = _FEED_ROOT_RE.match(data)
                    grammar = (
                        "atom"
                        if m and m.group(1).startswith(b"feed")
                        else "rss"
                    )
                    rows.append(
                        (
                            did,
                            grammar,
                            feed_entry_count(data),
                            text,
                            True,
                            None,
                        )
                    )
                except Exception as e:
                    rows.append(
                        (did, None, None, None, False, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "grammar", "n_entries", "text",
                    "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=FEED_FEATURES_SCHEMA
    )
