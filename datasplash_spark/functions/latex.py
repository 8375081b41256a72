"""LaTeX text extraction (round 11).

arXiv-style LaTeX is one of the largest public pretraining text
sources; extracting its prose requires structural handling that
regex passes get wrong: nested brace groups, comment lines that
contain braces, escaped specials (``\\%`` is a literal percent, not
a comment), math spans, and environment bodies that must drop
wholesale (figures, tables, equations, verbatim). This module is a
small structural scanner — zero dependencies, one forward pass, no
backtracking — with the same typed-quarantine Spark surface as the
PDF/office readers.

Extraction contract (what survives):

- prose characters outside commands/math/dropped environments;
- the ARGUMENT text of text-carrying commands (``\\section``,
  ``\\textbf``, ``\\emph``, ...), recursively;
- escaped specials as their literal character (``\\%`` → ``%``);
- ``\\\\`` and ``\\par`` as line breaks; ``~`` as space.

What drops: comments (``%`` to end of line), inline/display math
(``$...$``, ``$$...$$``, ``\\(...\\)``, ``\\[...\\]``), reference-like
command arguments (``\\cite``/``\\ref``/``\\label``/``\\url``...),
unknown commands' optional args, the whole body of non-prose
environments (``equation``/``figure``/``table``/``tikzpicture``/
``verbatim``/...), and everything before ``\\begin{document}`` when
present. Whitespace normalizes to single spaces within a line.

Scale posture: identical to the sibling modalities — extraction is
an Arrow-batched kernel running where the document lives; only text
rows cross.

Reference anchor: north-star extension surface (text-source family
next to html_extract / pdf / office); TeX syntax is public
(Knuth, The TeXbook).
"""

from __future__ import annotations

import re

#: commands whose (first) brace argument IS prose — recurse into it
_TEXT_COMMANDS = {
    "section", "subsection", "subsubsection", "paragraph", "chapter",
    "title", "author", "textbf", "textit", "texttt", "textsc",
    "emph", "underline", "mbox", "text", "textrm", "caption",
    "footnote", "item",
}

#: commands whose brace argument is machinery — drop argument too
_DROP_ARG_COMMANDS = {
    "cite", "citep", "citet", "ref", "eqref", "label", "url", "href",
    "includegraphics", "input", "include", "bibliography",
    "bibliographystyle", "usepackage", "documentclass", "newcommand",
    "renewcommand", "setlength", "vspace", "hspace", "begin", "end",
}

#: environments whose whole body drops (non-prose)
_DROP_ENVS = {
    "equation", "equation*", "align", "align*", "eqnarray",
    "eqnarray*", "gather", "gather*", "math", "displaymath",
    "figure", "figure*", "table", "table*", "tabular", "tikzpicture",
    "verbatim", "lstlisting", "minted", "algorithm", "algorithmic",
}

_ESCAPES = {
    "%": "%", "&": "&", "_": "_", "$": "$", "#": "#",
    "{": "{", "}": "}",
}


def _read_group(s: str, i: int) -> tuple[str, int]:
    """``s[i]`` is ``{``: return (body, index past the matching
    ``}``), honoring nesting and escaped braces."""
    depth = 0
    j = i
    n = len(s)
    start = i + 1
    while j < n:
        c = s[j]
        if c == "\\" and j + 1 < n:
            j += 2
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return s[start:j], j + 1
        j += 1
    return s[start:], n  # unbalanced: take to EOF (lenient)


_CMD_RE = re.compile(r"[A-Za-z]+\*?")


def latex_to_text(src: str) -> str:
    """Extract prose from a LaTeX source string (see the module
    docstring for the contract). One forward pass; lenient on
    unbalanced input (never raises on malformed TeX — garbage
    degrades to dropped spans, matching how corpus pipelines treat
    broken sources)."""
    if "\\begin{document}" in src:
        src = src.split("\\begin{document}", 1)[1]
        src = src.split("\\end{document}", 1)[0]
    out: list[str] = []

    def scan(s: str) -> None:
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "%":
                nl = s.find("\n", i)
                i = n if nl < 0 else nl + 1
                out.append("\n")
                continue
            if c == "$":
                # $...$ or $$...$$ math: drop the span
                dd = s.startswith("$$", i)
                close = s.find("$$" if dd else "$", i + (2 if dd else 1))
                i = n if close < 0 else close + (2 if dd else 1)
                out.append(" ")
                continue
            if c == "~":
                out.append(" ")
                i += 1
                continue
            if c == "\\":
                if i + 1 < n and s[i + 1] in _ESCAPES:
                    out.append(_ESCAPES[s[i + 1]])
                    i += 2
                    continue
                if s.startswith("\\\\", i):
                    out.append("\n")
                    i += 2
                    continue
                if s.startswith("\\(", i) or s.startswith("\\[", i):
                    closer = "\\)" if s[i + 1] == "(" else "\\]"
                    close = s.find(closer, i + 2)
                    i = n if close < 0 else close + 2
                    out.append(" ")
                    continue
                m = _CMD_RE.match(s, i + 1)
                if not m:
                    # control/thin spaces ('\ ', '\,', '\;', ...)
                    # and any other backslash+symbol: a word
                    # separator, never a glue point — emit a space
                    # (extra spaces collapse in normalization)
                    out.append(" ")
                    i += 2
                    continue
                cmd = m.group(0).rstrip("*")  # \section* == \section
                i = m.end()
                if cmd == "par":
                    out.append("\n")
                if cmd == "begin":
                    # \begin{env}: drop-env bodies skip to \end{env}
                    if i < n and s[i] == "{":
                        env, i = _read_group(s, i)
                        if env.strip() in _DROP_ENVS:
                            endtok = "\\end{%s}" % env.strip()
                            close = s.find(endtok, i)
                            i = n if close < 0 else close + len(endtok)
                            out.append("\n")
                    continue
                if cmd == "end":
                    if i < n and s[i] == "{":
                        _env, i = _read_group(s, i)
                    continue
                # optional [..] args always drop
                while i < n and s[i] == "[":
                    close = s.find("]", i)
                    i = n if close < 0 else close + 1
                if i < n and s[i] == "{":
                    body, i = _read_group(s, i)
                    if cmd in _TEXT_COMMANDS:
                        scan(body)
                        if cmd.startswith(("section", "subsection",
                                           "chapter", "paragraph",
                                           "title")):
                            out.append("\n")
                    elif cmd in _DROP_ARG_COMMANDS:
                        pass
                    else:
                        # unknown command: conservative — keep the
                        # argument text (most unknown one-arg macros
                        # wrap prose)
                        scan(body)
                continue
            out.append(c)
            i += 1

    scan(src)
    text = "".join(out)
    # whitespace normalization: single spaces within lines, no
    # leading/trailing line blanks, collapse blank-line runs
    lines = [
        re.sub(r"[ \t]+", " ", ln).strip() for ln in text.split("\n")
    ]
    text = "\n".join(lines)
    text = re.sub(r"\n{2,}", "\n", text)
    return text.strip()


LATEX_FEATURES_SCHEMA = (
    "doc_id bigint, n_chars int, text string, ok boolean, err string"
)


def latex_text_features(df, id_col="doc_id", source_col="source_tex"):
    """Extract prose from a LaTeX-source column into typed rows
    (``doc_id, n_chars, text, ok, err``) with per-document
    quarantine; extraction runs where the document lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, src in zip(b[id_col], b[source_col]):
                try:
                    t = latex_to_text(src or "")
                    rows.append((did, len(t), t, True, None))
                except Exception as e:  # pragma: no cover (lenient)
                    rows.append((did, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "text", "ok", "err"],
            )

    return df.select(id_col, source_col).mapInPandas(
        extract, schema=LATEX_FEATURES_SCHEMA
    )


def synthesize_latex_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic LaTeX corpus: per doc a full article
    (preamble dropped by extraction, ``1 + len(text) % units_mod``
    sections with words round-robin; each section wraps its second
    word in ``\\textbf``, plants a ``\\cite`` + inline math + a
    comment WITH braces + an ``equation`` environment — all of which
    must vanish). Returns ``(doc_id, n_units, source_tex)``; the
    extracted text is SQL-replayable: ``'Section ' || i`` then the
    unit's words single-spaced, sections joined by newlines."""
    from pyspark.sql import functions as F  # noqa: F401

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, srcs = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                # deterministic input normalization (mirrored in the
                # oracle): LaTeX-special characters -> '-',
                # whitespace runs -> one space — so the extracted
                # text is exactly SQL-replayable on any corpus, not
                # just a pre-sanitized one (review finding)
                t = re.sub(r"[\\~^%&$#{}_]", "-", t or "")
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                parts = [
                    "\\documentclass{article}",
                    "\\usepackage{amsmath} % preamble {noise}",
                    "\\begin{document}",
                ]
                for i in range(n):
                    unit = words[i::n]
                    if len(unit) >= 2:
                        unit = (
                            unit[:1]
                            + ["\\textbf{%s}" % unit[1]]
                            + unit[2:]
                        )
                    parts.append("\\section{Section %d}" % i)
                    parts.append(
                        " ".join(unit)
                        + " \\cite{k%d} $x_%d^2$ %% drop {this}" % (i, i)
                    )
                    parts.append(
                        "\\begin{equation}\n e = mc^2_%d\n"
                        "\\end{equation}" % i
                    )
                parts.append("\\end{document}")
                ids.append(did)
                nus.append(n)
                srcs.append("\n".join(parts))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "source_tex": srcs}
            )

    return df.select(id_col, text).mapInPandas(
        synth,
        schema="doc_id bigint, n_units int, source_tex string",
    )
