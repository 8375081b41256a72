"""Markdown text extraction (round 12).

Markdown is the dominant plain-markup family in shared-drive and
code-forge dumps (READMEs, wikis, issue exports); this module gives
the universal document router (``functions/doctext.py``) a
structural CommonMark-style extractor with the same zero-dependency
contract as the other format families: a deterministic writer
(fixture half, plants the adversarial constructs) and a reader the
router dispatches to per row inside the Arrow kernel. Bytes never
shuffle; only extracted text rows cross.

Extraction model (CommonMark core, GFM strikethrough):

- fenced code blocks keep their CONTENT (code is corpus text) and
  drop the fence lines; inline markup inside a fence is verbatim
- ATX headings keep the title (closing hash run dropped); setext
  underlines drop; thematic breaks drop; link-definition lines drop
- blockquote markers and list markers strip; ordered-list numbers
  strip; GFM task-list checkboxes strip; GFM table rows keep their
  cell text (pipes and the header-separator line drop; round 12)
- inline: images → alt text, links (inline / reference / autolink)
  → link text, code spans / emphasis / strong / strikethrough →
  inner text, backslash escapes → the escaped character, raw inline
  HTML tags drop
- whitespace: horizontal runs collapse to one space, blank-line
  runs collapse to ONE newline (the shared paragraph contract of
  the other extractors)

Reference anchor: the reference has no markdown codec — this is
north-star LLM-pipeline surface (same category as the office/RTF
family, BASELINE.json); the grammar implemented is the public
CommonMark 0.31 core.
"""

from __future__ import annotations

import re

from . import web as _web

_FENCE_RE = re.compile(r"^ {0,3}(`{3,}|~{3,})[ \t]*([^`\n]*?)[ \t]*$")
_ATX_RE = re.compile(r"^ {0,3}(#{1,6})[ \t]+(.*?)(?:[ \t]+#+[ \t]*)?$")
_ATX_EMPTY_RE = re.compile(r"^ {0,3}#{1,6}[ \t]*$")
_SETEXT_RE = re.compile(r"^ {0,3}(=+|-+)[ \t]*$")
_THEMATIC_RE = re.compile(
    r"^ {0,3}(?:(?:\*[ \t]*){3,}|(?:-[ \t]*){3,}|(?:_[ \t]*){3,})$"
)
_LINKDEF_RE = re.compile(r"^ {0,3}\[[^\]]+\]:[ \t]+\S+")
_QUOTE_RE = re.compile(r"^ {0,3}(?:>[ \t]?)+")
# list marker, optionally followed by a GFM task-list checkbox
_LIST_RE = re.compile(
    r"^([ \t]*)(?:[-*+]|\d{1,9}[.)])[ \t]+(?:\[[ xX]\][ \t]+)?"
)
# GFM tables (round 12, tightened by review): a table exists ONLY
# where the spec says one does — a row containing an unescaped pipe
# IMMEDIATELY followed by the delimiter row (cells of :?-+:? with at
# least one pipe); subsequent contiguous pipe-bearing lines are data
# rows. Pipe-bounded prose with no delimiter context keeps its pipes
# (a false positive would strip characters), dash-only CELLS in data
# rows are content (only the one delimiter line drops), and the
# delimiter's outer pipes are optional per spec.
_TABLE_DELIM_RE = re.compile(
    r"^ {0,3}\|?\s*:?-+:?\s*(?:\|\s*:?-+:?\s*)*\|?\s*$"
)
_CELL_SPLIT_RE = re.compile(r"(?<!\\)\|")


def _is_table_delim(line: str) -> bool:
    return "|" in line and bool(_TABLE_DELIM_RE.match(line))


def _table_cells(line: str) -> str:
    """One table row → its cell text, space-joined. Outer pipes
    strip (a trailing ESCAPED pipe is cell content, not a border);
    splits only on unescaped pipes so ``\\|`` stays in its cell for
    the escape pass to resolve."""
    core = line.strip()
    if core.startswith("|"):
        core = core[1:]
    if core.endswith("|") and not core.endswith("\\|"):
        core = core[:-1]
    cells = [c.strip() for c in _CELL_SPLIT_RE.split(core)]
    return " ".join(c for c in cells if c)

_IMG_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_REFLINK_RE = re.compile(r"\[([^\]]*)\]\[[^\]]*\]")
_AUTOLINK_RE = re.compile(r"<((?:https?|ftp|mailto):[^<>\s]+)>")
_CODESPAN_RE = re.compile(r"(`+)(.+?)\1")
# Emphasis: '*' may open/close intraword (CommonMark), '_' may NOT —
# the flanking rules forbid it, and without the guard every
# snake_case identifier in a README would have its underscores
# deleted (review finding, round 12).
_STRONG_EM_STAR_RE = re.compile(r"\*\*\*(?=\S)(.+?)(?<=\S)\*\*\*")
_STRONG_EM_UNDER_RE = re.compile(
    r"(?<![A-Za-z0-9_])___(?=\S)(.+?)(?<=\S)___(?![A-Za-z0-9_])"
)
_STRONG_STAR_RE = re.compile(r"\*\*(?=\S)(.+?)(?<=\S)\*\*")
_STRONG_UNDER_RE = re.compile(
    r"(?<![A-Za-z0-9_])__(?=\S)(.+?)(?<=\S)__(?![A-Za-z0-9_])"
)
_EM_STAR_RE = re.compile(r"\*(?=\S)([^*]+?)(?<=\S)\*")
_EM_UNDER_RE = re.compile(
    r"(?<![A-Za-z0-9_])_(?=\S)([^_]+?)(?<=\S)_(?![A-Za-z0-9_])"
)
_STRIKE_RE = re.compile(r"~~(?=\S)(.+?)(?<=\S)~~")
_HTMLTAG_RE = re.compile(r"</?[A-Za-z][^<>\n]*>|<!--.*?-->")
_ESCAPE_RE = re.compile(r"\\([\\`*_{}\[\]()#+\-.!>~|\"'<>])")
_STASH_RE = re.compile("\x00(\\d+)\x01")


def _inline(s: str) -> str:
    """Resolve inline markup on one non-code line. Two classes of
    text must survive the markup passes LITERALLY: backslash-escaped
    delimiters (``\\*literal\\*`` keeps its stars) and code-span
    contents (``\x60a [x](y) b\x60`` keeps its brackets — review
    finding, round 12). Both stash into an indexed side list behind
    ``NUL+index+SOH`` placeholders and restore after the passes;
    pre-existing NUL bytes are dropped up front (not valid text), so
    a placeholder can never collide with input. Remaining known
    simplification vs CommonMark: escapes are resolved inside code
    spans too (``\x60a \\* b\x60`` → ``a * b``), because the escape
    stash runs first so an escaped backtick cannot open a span."""
    s = s.replace("\x00", "")
    stash: list[str] = []

    def keep(text: str) -> str:
        stash.append(text)
        return "\x00%d\x01" % (len(stash) - 1)

    s = _ESCAPE_RE.sub(lambda m: keep(m.group(1)), s)
    s = _CODESPAN_RE.sub(lambda m: keep(m.group(2)), s)
    s = _IMG_RE.sub(lambda m: m.group(1), s)
    s = _LINK_RE.sub(lambda m: m.group(1), s)
    s = _REFLINK_RE.sub(lambda m: m.group(1), s)
    s = _AUTOLINK_RE.sub(lambda m: m.group(1), s)
    s = _HTMLTAG_RE.sub(" ", s)
    s = _STRONG_EM_STAR_RE.sub(lambda m: m.group(1), s)
    s = _STRONG_EM_UNDER_RE.sub(lambda m: m.group(1), s)
    s = _STRONG_STAR_RE.sub(lambda m: m.group(1), s)
    s = _STRONG_UNDER_RE.sub(lambda m: m.group(1), s)
    s = _EM_STAR_RE.sub(lambda m: m.group(1), s)
    s = _EM_UNDER_RE.sub(lambda m: m.group(1), s)
    s = _STRIKE_RE.sub(lambda m: m.group(1), s)
    # a code-span stash entry may itself contain escape placeholders
    # created earlier in this call — restore until none remain
    # (entries never reference later entries, so this terminates)
    while "\x00" in s:
        s = _STASH_RE.sub(lambda m: stash[int(m.group(1))], s)
    return s


_FRONTMATTER_KEY_RE = re.compile(r"^[\w-]+:(?:[ \t]|$)")


def _strip_frontmatter(src: str) -> str:
    """Drop a LEADING Jekyll/pandoc YAML frontmatter block (round
    13): ``---`` on line 1, a closing ``---``/``...`` within the
    first 64 lines, and every enclosed line either blank, indented
    (a continuation), or ``key:``-shaped. The shape test keeps this
    conservative — a document that merely OPENS with a thematic
    break followed by prose keeps its prose; frontmatter keys are
    metadata, not corpus text."""
    if not src.startswith("---"):
        return src
    lines = src.split("\n", 65)
    if lines[0].strip() != "---":
        return src
    for i, line in enumerate(lines[1:65], start=1):
        if line.strip() in ("---", "..."):
            body = lines[i + 1 :]
            return "\n".join(body)
        if line.strip() and not line.startswith((" ", "\t")) and not (
            _FRONTMATTER_KEY_RE.match(line)
        ):
            return src
    return src


def markdown_to_text(src: str) -> str:
    """Structural markdown → plain text (see the module docstring
    for the grammar subset and the whitespace contract)."""
    src = src.replace("\r\n", "\n").replace("\r", "\n")
    src = _strip_frontmatter(src)
    out: list[str] = []
    fence: str | None = None
    fence_quoted = False  # fence opened INSIDE a blockquote (review
    # finding, round 12: '> ```' lines previously leaked fences into
    # the text and mangled the quoted code with the inline passes)
    prev_text = False  # a setext underline needs a paragraph above
    in_table = False  # inside a GFM table block (header+delimiter seen)
    lines_in = src.split("\n")
    n_lines = len(lines_in)
    idx = 0
    while idx < n_lines:
        raw = lines_in[idx]
        idx += 1
        if fence is not None:
            # inside a quoted fence the quote marker is container
            # syntax, not code — strip it before matching/emitting
            line = _QUOTE_RE.sub("", raw) if fence_quoted else raw
            m = _FENCE_RE.match(line)
            if (
                m
                and m.group(1)[0] == fence[0]
                and len(m.group(1)) >= len(fence)
                and not m.group(2)
            ):
                fence = None
                prev_text = False
                continue
            out.append(line)  # code content, verbatim (no inline pass)
            prev_text = False
            continue
        unquoted = _QUOTE_RE.sub("", raw)
        m = _FENCE_RE.match(unquoted)
        if m:
            fence = m.group(1)
            fence_quoted = unquoted != raw
            prev_text = False
            in_table = False
            continue
        if in_table:
            if unquoted.strip() and _CELL_SPLIT_RE.search(unquoted):
                out.append(_inline(_table_cells(unquoted)))
                prev_text = False
                continue
            in_table = False  # table ended; process this line normally
        if _THEMATIC_RE.match(raw):
            prev_text = False
            continue
        if prev_text and _SETEXT_RE.match(raw):
            prev_text = False
            continue
        if _LINKDEF_RE.match(raw):
            prev_text = False
            continue
        if _ATX_EMPTY_RE.match(raw):
            prev_text = False
            continue
        m = _ATX_RE.match(raw)
        if m:
            out.append(_inline(m.group(2)))
            prev_text = False
            continue
        if (
            unquoted.strip()
            and _CELL_SPLIT_RE.search(unquoted)
            and not _LIST_RE.match(unquoted)
            and idx < n_lines
            and _is_table_delim(_QUOTE_RE.sub("", lines_in[idx]))
        ):
            # header row + delimiter row: emit the header's cells,
            # consume the delimiter, enter the table block. Checked
            # AFTER the heading/thematic/setext branches and guarded
            # against list markers — GFM gives those precedence over
            # a table header (review finding, round 12)
            out.append(_inline(_table_cells(unquoted)))
            idx += 1
            in_table = True
            prev_text = False
            continue
        line = _QUOTE_RE.sub("", raw)
        line = _LIST_RE.sub(r"\1", line)
        line = _inline(line)
        out.append(line)
        prev_text = bool(line.strip())
    text = "\n".join(out)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{2,}", "\n", text)
    return text.strip()


def encode_markdown(units: list[str], title: str | None = None) -> bytes:
    """Fixture half: a real markdown document per unit list, planting
    the adversarial constructs the extractor must resolve — an ATX
    heading per unit, strong emphasis around the middle word, an
    inline link around the last word, a code span around the first,
    plus (document-wide) a fenced code block whose CONTENT must
    survive with markup untouched, a blockquote, a list, a GFM table
    whose cell text must survive with pipes and the separator line
    dropped, a thematic break that must vanish, and a
    link-definition line that must vanish."""
    parts: list[str] = []
    if title:
        parts.append("%s\n===\n" % title)
    for i, u in enumerate(units):
        words = u.split(" ") if u else []
        if words:
            words = list(words)
            words[0] = "`%s`" % words[0]
            mid = len(words) // 2
            if mid != 0:
                words[mid] = "**%s**" % words[mid]
            if len(words) > 1:
                words[-1] = "[%s](https://example.com/u/%d)" % (
                    words[-1], i,
                )
        body = " ".join(words)
        parts.append("## Section %d\n\n%s\n" % (i, body))
    parts.append("---\n")
    parts.append("> quoted line\n")
    parts.append("- item one\n- item two\n")
    parts.append(
        "| Col A | Col B |\n|-------|------:|\n| cell one | cell two |\n"
    )
    parts.append("```\ncode **stays** [verbatim](x)\n```\n")
    parts.append("[ref]: https://example.com/def\n")
    return "\n".join(parts).encode("utf-8")


def markdown_expected_text(units: list[str], title: str | None = None) -> str:
    """The exact text :func:`markdown_to_text` extracts from
    :func:`encode_markdown` — kept next to the writer so parity
    tests state the contract in one place."""
    parts: list[str] = []
    if title:
        parts.append(title)
    for i, u in enumerate(units):
        parts.append("Section %d" % i)
        if u:
            parts.append(u)
    parts.append("quoted line")
    parts.append("item one")
    parts.append("item two")
    parts.append("Col A Col B")
    parts.append("cell one cell two")
    parts.append("code **stays** [verbatim](x)")
    return "\n".join(parts)


MARKDOWN_FEATURES_SCHEMA = (
    "doc_id bigint, n_chars int, text string, ok boolean, err string"
)


def synthesize_markdown_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic markdown corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped to the word count so no unit is empty), rendered through
    :func:`encode_markdown` — so every document carries the full
    adversarial construct set (code-span/strong/link word wraps, a
    fence whose content survives verbatim, quote/list/thematic-
    break/link-definition lines). Input normalization (mirrored in
    the oracle): markdown-special characters → ``-``, whitespace
    runs → one space, so the extracted text is exactly
    SQL-replayable on any corpus. Returns ``(doc_id, n_units,
    source_md binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, srcs = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[\\`*_\[\]()#!<>~|]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                srcs.append(encode_markdown(units))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "source_md": srcs}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, source_md binary"
    )


def markdown_text_features(df, id_col="doc_id", source_col="source_md"):
    """Extract text from a markdown column into typed rows
    (``doc_id, n_chars, text, ok, err``) with per-document
    quarantine; extraction runs where the document lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, src in zip(b[id_col], b[source_col]):
                try:
                    raw = bytes(src) if src is not None else b""
                    t = markdown_to_text(raw.decode("utf-8", "replace"))
                    rows.append((did, len(t), t, True, None))
                except Exception as e:  # pragma: no cover (lenient)
                    rows.append((did, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "text", "ok", "err"],
            )

    return df.select(id_col, source_col).mapInPandas(
        extract, schema=MARKDOWN_FEATURES_SCHEMA
    )
