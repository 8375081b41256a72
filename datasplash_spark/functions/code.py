"""Source-code text extraction (round 13).

Source code is the second-largest pretraining modality after web
text, and shared-drive / code-forge dumps are full of extensionless
scripts; this module gives the universal document router
(``functions/doctext.py``) a code family with the same
zero-dependency contract as the other formats: a conservative
detector (shebangs + full-line declaration shapes — prose must never
route here), a LOSSLESS reader (code text survives VERBATIM; unlike
the markup families nothing is stripped, because every character of
code is corpus signal), and a comment/string-aware LINE SCANNER that
produces the structure stats a curation pipeline filters on
(comment ratio, blank density) — a ``#`` inside a string literal is
code, not a comment, and a ``//`` inside a string likewise.

Extraction model:

- ``code_to_text``: UTF-8 (surrogate-safe) decode, verbatim — the
  lossless contract. The router's ``kind='code'`` tag IS the value:
  downstream stages route code docs away from the prose filters
  that would destroy them (Gopher/C4 rules famously nuke code).
- ``code_line_stats``: line classification into comment / blank /
  code via a per-line quote-state scan (single, double, and — for
  Python-family — triple quotes carried ACROSS lines, plus
  ``/* ... */`` block comments for the C family). The shebang line
  counts as a comment.
- ``detect_code_lang``: shebang interpreter first, else per-language
  strong declaration shapes (full-line ``def``/``class``/``import``
  for Python, ``#include`` for C/C++, ``package``/``public class``
  for Java, ``func``/``package`` for Go, ``fn``/``impl``/``use``
  for Rust, ``function``/``const``/``let`` for JavaScript); two
  strong hits are required before anything routes, so prose lines
  that happen to start with "import" or "from" never trip it.

Reference anchor: the reference has no code codec — this is
north-star LLM-pipeline surface (same category as the markdown
family, BASELINE.json); the line-classification rules follow the
public language specs' comment grammars.
"""

from __future__ import annotations

import re

from . import web as _web

#: shebang interpreter → language tag (basename match after env
#: indirection; anything else with a shebang is 'shell' — the
#: dominant extensionless-script reality).
_SHEBANG_RE = re.compile(r"^#!\s*(\S+)(?:\s+(\S+))?")
_SHEBANG_LANGS = (
    ("python", "python"),
    ("node", "javascript"),
    ("deno", "javascript"),
    ("ruby", "ruby"),
    ("perl", "perl"),
    ("php", "php"),
    ("Rscript", "r"),
)

#: per-language STRONG full-line declaration shapes. Deliberately
#: strict (anchored, full-line where the grammar allows): a false
#: positive would tag prose as code and exempt it from the prose
#: quality filters, so bare comment lines, braces, or semicolons
#: are NOT signals.
_STRONG_SHAPES: tuple[tuple[str, re.Pattern], ...] = tuple(
    (lang, re.compile(pat, re.M))
    for lang, pat in (
        ("python", r"^(?:async[ \t]+)?def[ \t]+\w+[ \t]*\(.*\)[ \t]*(?:->[^:\n]+)?:[ \t]*$"),
        ("python", r"^class[ \t]+\w+(?:\([^)\n]*\))?[ \t]*:[ \t]*$"),
        ("python", r"^import[ \t]+[\w.]+(?:[ \t]+as[ \t]+\w+)?[ \t]*$"),
        ("python", r"^from[ \t]+[\w.]+[ \t]+import[ \t]+[\w*]"),
        ("python", r"^@\w[\w.]*(?:\([^\n]*\))?[ \t]*$"),
        ("c", r"^[ \t]*#include[ \t]*[<\"]"),
        ("c", r"^[ \t]*#define[ \t]+\w+"),
        ("c", r"^[ \t]*(?:static[ \t]+|const[ \t]+|unsigned[ \t]+|inline[ \t]+|extern[ \t]+)*(?:int|void|char|long|short|float|double|size_t|bool)[ \t]+\**\w+[ \t]*\("),
        ("java", r"^package[ \t]+[\w.]+;[ \t]*$"),
        ("java", r"^import[ \t]+(?:static[ \t]+)?[\w.*]+;[ \t]*$"),
        ("java", r"^[ \t]*(?:public|private|protected)[ \t]+(?:static[ \t]+|final[ \t]+|abstract[ \t]+)*(?:class|interface|enum|void|\w+(?:<[^\n>]*>)?)[ \t]+\w+"),
        ("go", r"^package[ \t]+\w+[ \t]*$"),
        ("go", r"^func[ \t]+(?:\(\w+[ \t]+\*?\w+\)[ \t]+)?\w+[ \t]*\("),
        ("rust", r"^(?:pub[ \t]+)?(?:fn|struct|enum|trait|impl)[ \t]+\w+"),
        ("rust", r"^use[ \t]+[\w:]+(?:::\{[^\n]*\})?;[ \t]*$"),
        ("javascript", r"^(?:export[ \t]+)?(?:async[ \t]+)?function[ \t]*\*?[ \t]*\w*[ \t]*\("),
        ("javascript", r"^(?:export[ \t]+)?(?:const|let|var)[ \t]+\w+[ \t]*=[^=\n]"),
        ("javascript", r"^import[ \t]+.+[ \t]+from[ \t]+['\"]"),
        ("shell", r"^[ \t]*(?:if[ \t]+\[\[?[ \t]|for[ \t]+\w+[ \t]+in[ \t]|while[ \t]+\[\[?[ \t])"),
        ("shell", r"^\w+\(\)[ \t]*\{[ \t]*$"),
        # INI/TOML-style config: two bare [section] header lines
        # (wikitext [[links]] and markdown [ref]: definitions both
        # fail the full-line shape)
        ("ini", r"^\[[^\[\]\n]+\][ \t]*$"),
        # section-less TOML (round 13): full-line key = TYPED value
        # — quoted string, bool, or array only; bare numbers are
        # excluded because math prose writes `x = 5` on its own
        # line, but never `x = "5"` (the loss-direction rule: a
        # config tag exempts the doc from prose quality filters, so
        # prose must never earn one)
        ("toml", r"^\w[\w.-]*[ \t]*=[ \t]*(?:\"[^\"\n]*\"|'[^'\n]*'|true|false|\[[^\n]*\])[ \t]*$"),
        # YAML (round 13): ONLY the INDENTED `- key: value`
        # sequence-of-mappings item (the workflow/manifest
        # convention). Deliberately the single signal: `---`
        # markers come in PAIRS around markdown frontmatter (a
        # frontmattered post must keep routing md), bare
        # `key:`-heads are prose (`Usage:`/`Note:` lines), and
        # column-0 `- term: definition` items are markdown lists —
        # all three rejected shapes verified in tests
        ("yaml", r"^[ \t]+-[ \t]+\w[\w-]*:[ \t]+\S"),
        # SQL dumps: uppercase statement heads only (prose writes
        # "Select the best ..." — sentence case — and never twice
        # at line starts with these clause shapes)
        ("sql", r"^SELECT[ \t]+.+[ \t]FROM[ \t]"),
        ("sql", r"^CREATE[ \t]+(?:TABLE|INDEX|VIEW|SCHEMA)[ \t]+\S"),
        ("sql", r"^INSERT[ \t]+INTO[ \t]+\S"),
        ("sql", r"^(?:ALTER|DROP)[ \t]+TABLE[ \t]+\S"),
    )
)

#: languages whose line comments start with '#'
_HASH_COMMENT_LANGS = frozenset(
    {"python", "shell", "ruby", "perl", "r", "code", "ini",
     "toml", "yaml"}
)
#: languages whose line comments start with '//' (plus /* */ blocks)
_SLASH_COMMENT_LANGS = frozenset(
    {"c", "java", "go", "rust", "javascript", "php"}
)
#: languages whose line comments start with '--'
_DASH_COMMENT_LANGS = frozenset({"sql"})


def detect_code_lang(src: str) -> str | None:
    """Conservative code detection over the document HEAD: the
    shebang interpreter wins immediately; otherwise a language needs
    at least TWO strong full-line declaration shapes. ``None`` means
    "not confidently code" — the router falls through losslessly."""
    if src.startswith("<?php"):
        # the one language with a true magic; checked here AND as a
        # byte prefix in the router (BEFORE the html sniff — a php
        # file with embedded html must not be stripped as html)
        return "php"
    m = _SHEBANG_RE.match(src)
    if m:
        interp = m.group(1).rsplit("/", 1)[-1]
        if interp == "env" and m.group(2):
            interp = m.group(2).rsplit("/", 1)[-1]
        for key, lang in _SHEBANG_LANGS:
            if interp.startswith(key):
                return lang
        return "shell"
    scores: dict[str, int] = {}
    for lang, pat in _STRONG_SHAPES:
        n = len(pat.findall(src))
        if n:
            scores[lang] = scores.get(lang, 0) + n
    if not scores:
        return None
    lang, best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    return lang if best >= 2 else None


def code_to_text(src: str) -> str:
    """The lossless contract: code text IS the corpus text. Kept as
    a named function so the router's dispatch table reads uniformly
    and the contract has one documented home."""
    return src


def _python_line_quote_state(line: str) -> str | None:
    """Walk one Python CODE line character-by-character tracking
    string state; returns the triple-quote delimiter left OPEN at
    end of line (``None`` when the line closes everything it
    opens). Single/double quotes and backslash escapes are honored,
    so a triple-quote sequence inside an ordinary string literal
    never flips docstring state; a ``#`` outside strings ends the
    scan (the rest is a trailing comment)."""
    i, n = 0, len(line)
    quote: str | None = None
    triple: str | None = None
    while i < n:
        if triple is not None:
            if line.startswith(triple, i):
                triple = None
                i += 3
            else:
                i += 1
            continue
        c = line[i]
        if quote is not None:
            if c == "\\":
                i += 2
            else:
                if c == quote:
                    quote = None
                i += 1
            continue
        if line.startswith('"""', i) or line.startswith("'''", i):
            triple = line[i : i + 3]
            i += 3
            continue
        if c in "\"'":
            quote = c
            i += 1
            continue
        if c == "#":
            break
        i += 1
    return triple


def code_line_stats(src: str, lang: str) -> dict:
    """Comment/string-aware line classification. Returns
    ``{n_lines, comment_lines, blank_lines, code_lines,
    max_line_len}`` where a line is a COMMENT line only when its
    first non-whitespace content begins a comment OUTSIDE any string
    literal (so ``s = "not # a comment"`` is code), a BLANK line is
    whitespace-only, and everything else — including code that ends
    in a trailing comment — is code. Python-family triple-quoted
    strings and C-family ``/* */`` blocks carry state across lines;
    a docstring/block-comment body line counts as code/comment
    respectively (it is content, not structure)."""
    hash_comments = lang in _HASH_COMMENT_LANGS or lang == "php"
    slash_comments = lang in _SLASH_COMMENT_LANGS
    dash_comments = lang in _DASH_COMMENT_LANGS
    triple_quotes = lang == "python"
    lines = src.split("\n")
    n_comment = n_blank = 0
    max_len = 0
    in_triple: str | None = None
    in_block_comment = False
    for line in lines:
        max_len = max(max_len, len(line))
        stripped = line.strip()
        if in_block_comment:
            n_comment += 1
            if "*/" in line:
                in_block_comment = False
            continue
        if in_triple is not None:
            # docstring body: content, counts as code
            if in_triple in line:
                in_triple = None
            continue
        if not stripped:
            n_blank += 1
            continue
        if hash_comments and stripped.startswith("#"):
            n_comment += 1
            continue
        if slash_comments and stripped.startswith("//"):
            n_comment += 1
            continue
        if dash_comments and stripped.startswith("--"):
            n_comment += 1
            continue
        if slash_comments and stripped.startswith("/*"):
            if "*/" not in stripped[2:]:
                in_block_comment = True
            n_comment += 1
            continue
        # code line: a true quote-state scan (the string-aware
        # half) — a triple-quote opener inside an ordinary string
        # literal (x = "'''") must NOT flip docstring state, and
        # backslash escapes must not close a string early
        if triple_quotes:
            in_triple = _python_line_quote_state(line)
        continue
    n_lines = len(lines)
    return {
        "n_lines": n_lines,
        "comment_lines": n_comment,
        "blank_lines": n_blank,
        "code_lines": n_lines - n_comment - n_blank,
        "max_line_len": max_len,
    }


def encode_code(
    units: list[str], doc_id: int = 0, lang: str = "python"
) -> bytes:
    """Fixture half: a real source file per unit list in one of
    THREE languages, planting the constructs the detector and the
    line scanner must handle per comment family —

    - ``python``: shebang (comment), module comment, full-line
      import, one ``def`` block per unit whose body carries a
      comment line AND a string literal of the same words, and a
      module string containing a literal ``#`` that must count as
      CODE (the hash-family string-aware pin);
    - ``c``: ``#include`` (CODE in the slash family), a TWO-LINE
      ``/* */`` header block, one function per unit with a
      single-line block comment and a string literal, and a string
      containing ``//`` that must count as code;
    - ``javascript``: ``import … from``, ``//`` comments,
      ``export function`` blocks, and the same ``//``-in-string
      pin."""
    if lang == "python":
        lines = [
            "#!/usr/bin/env python",
            "# Module d%d" % doc_id,
            "import os",
            "",
            "",
        ]
        for i, u in enumerate(units):
            lines += [
                "def f%d():" % i,
                "    # %s" % u,
                '    s = "%s"' % u,
                "    return s + os.sep",
                "",
                "",
            ]
        lines += [
            'S = "hash # inside string stays code"',
            "# done trailing comment",
        ]
    elif lang == "c":
        lines = [
            "#include <stdio.h>",
            "/* Module d%d" % doc_id,
            "   two-line header note */",
            "",
        ]
        for i, u in enumerate(units):
            lines += [
                "int f%d(void) {" % i,
                "    /* %s */" % u,
                '    const char *s = "%s";' % u,
                "    return 0;",
                "}",
                "",
            ]
        lines += [
            'const char *S = "hash // inside string stays code";',
            "// done trailing comment",
        ]
    elif lang == "javascript":
        lines = [
            "import fs from 'fs'",
            "// Module d%d" % doc_id,
            "",
        ]
        for i, u in enumerate(units):
            lines += [
                "export function f%d() {" % i,
                "  // %s" % u,
                '  const s%d = "%s"' % (i, u),
                "  return s%d.length" % i,
                "}",
                "",
            ]
        lines += [
            'const S = "hash // inside string stays code"',
            "// done trailing comment",
        ]
    else:
        raise ValueError(f"encode_code: unknown lang {lang!r}")
    return "\n".join(lines).encode("utf-8")


def code_expected_text(
    units: list[str], doc_id: int = 0, lang: str = "python"
) -> str:
    """The exact (verbatim) text :func:`code_to_text` yields for
    :func:`encode_code` — the lossless contract stated next to the
    writer."""
    return encode_code(units, doc_id, lang).decode("utf-8")


def code_expected_stats(units: list[str], lang: str = "python") -> dict:
    """Closed-form expected line stats for :func:`encode_code` per
    language (header/block/footer shapes in the writer)."""
    n = len(units)
    if lang == "python":
        return {
            "n_lines": 7 + 6 * n,
            "comment_lines": 3 + n,
            "blank_lines": 2 + 2 * n,
            "code_lines": 2 + 3 * n,
        }
    if lang == "c":
        return {
            "n_lines": 6 + 6 * n,
            "comment_lines": 3 + n,
            "blank_lines": 1 + n,
            "code_lines": 2 + 4 * n,
        }
    if lang == "javascript":
        return {
            "n_lines": 5 + 6 * n,
            "comment_lines": 2 + n,
            "blank_lines": 1 + n,
            "code_lines": 2 + 4 * n,
        }
    raise ValueError(f"code_expected_stats: unknown lang {lang!r}")


CODE_FEATURES_SCHEMA = (
    "doc_id bigint, lang string, n_lines int, comment_lines int, "
    "blank_lines int, code_lines int, max_line_len int, "
    "text string, ok boolean, err string"
)


def synthesize_code_from_text(df, text="text", id_col="doc_id", units_mod=3):
    """Deterministic synthetic code corpus for the corpus gate: per
    doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped to the word count), rendered through
    :func:`encode_code` with the language rotating on ``doc_id %
    3`` (python / c / javascript — so BOTH comment families and the
    block-comment state machine are driver-gated). Input
    normalization (mirrored in the oracle): characters that would
    change the line grammar (``#``, quotes, backslash, ``*`` and
    ``/`` — a unit containing ``*/`` would close the C block
    comment early) → ``-``, the shared divergent set → ``-``,
    whitespace runs → one space. Returns ``(doc_id, n_units,
    source_code binary)``."""
    _LANGS = ("python", "c", "javascript")

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, srcs = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[#\"'\\*/]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                srcs.append(encode_code(units, did, _LANGS[did % 3]))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "source_code": srcs}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, source_code binary"
    )


def code_text_features(df, id_col="doc_id", source_col="source_code"):
    """Extract language + line stats + verbatim text from a code
    column into typed rows (``doc_id, lang, n_lines, comment_lines,
    blank_lines, code_lines, max_line_len, text, ok, err``) with
    per-document quarantine; extraction runs where the document
    lives. ``max_line_len`` is The Stack's headline structural
    filter (minified/generated files read as one enormous line)."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, src in zip(b[id_col], b[source_col]):
                try:
                    raw = bytes(src) if src is not None else b""
                    s = raw.decode("utf-8", "replace")
                    lang = detect_code_lang(s[:4096]) or "code"
                    st = code_line_stats(s, lang)
                    rows.append(
                        (
                            did, lang, st["n_lines"],
                            st["comment_lines"], st["blank_lines"],
                            st["code_lines"], st["max_line_len"],
                            code_to_text(s), True, None,
                        )
                    )
                except Exception as e:  # pragma: no cover (lenient)
                    rows.append(
                        (did, None, None, None, None, None, None,
                         None, False, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "lang", "n_lines", "comment_lines",
                    "blank_lines", "code_lines", "max_line_len",
                    "text", "ok", "err",
                ],
            )

    return df.select(id_col, source_col).mapInPandas(
        extract, schema=CODE_FEATURES_SCHEMA
    )
