"""Tabular text extraction — CSV/TSV and JSONL (round 13).

Shared-drive corpora are full of delimiter-separated exports and
JSON-lines dumps; today the universal router
(``functions/doctext.py``) would route them as plain text, keeping
the raw delimiters/braces as corpus noise and losing the structure
stats. This module gives the router a tabular family under the same
zero-dependency contract as the other formats: conservative sniffs
(a false positive would strip delimiters from prose, so comma-CSV
requires strict exporter shape), structure-aware flattening under
the shared paragraph contract, and RAGGED/MALFORMED rows promoting
the whole document to the typed quarantine (a half-parsed table is
worse than no table).

Extraction model:

- CSV/TSV (``csv_to_text``): delimiter re-sniffed over the full
  document (tab beats comma beats semicolon), rows parsed
  quote-aware via the stdlib ``csv`` reader (RFC 4180: quoted cells
  may carry delimiters, doubled quotes, and embedded newlines);
  each record flattens to one line of space-joined cells (embedded
  newlines inside a cell become spaces); a record whose field count
  differs from the header's raises a typed ``ragged row`` error —
  the document quarantines.
- JSONL (``jsonl_to_text``): one JSON OBJECT per non-blank line;
  values flatten in key order (strings verbatim, numbers/bools
  rendered, ``null`` skipped, arrays/objects recursed); a line that
  is not a JSON object raises a typed error — the document
  quarantines.

Reference anchor: the reference has no tabular codec — north-star
LLM-pipeline surface (BASELINE.json), grammar per RFC 4180 and the
JSON Lines convention (jsonlines.org).
"""

from __future__ import annotations

import csv
import io
import json
import re

from . import web as _web

#: delimiter candidates in precedence order: a tab is the strongest
#: signal (prose essentially never carries aligned tabs), comma and
#: semicolon need the strict checks below.
_DELIMS = ("\t", ",", ";")

_JSONL_LINE_RE = re.compile(r"^[ \t]*\{.*\}[ \t]*$")


def _csv_field_counts(
    text: str, delim: str, limit: int = 4
) -> list[int]:
    """Quote-aware field counts of the first ``limit`` records
    (``[]`` on any parse error) — the shared primitive of the sniff
    and the extractor's delimiter re-sniff."""
    try:
        counts = []
        for rec in csv.reader(io.StringIO(text), delimiter=delim):
            if not rec:
                continue
            counts.append(len(rec))
            if len(counts) >= limit:
                break
        return counts
    except csv.Error:
        return []


def sniff_tabular_kind(head: str) -> str | None:
    """Route a document HEAD to 'jsonl' or 'csv', else ``None``.
    Conservative by design (module docstring): JSONL needs every
    non-blank head line to be an object literal with at least one
    ``":`` key marker; tab-CSV needs ≥2 records of an equal ≥2-field
    shape; comma/semicolon-CSV additionally needs ≥3 records and NO
    field with edge whitespace (prose writes ``one, two``; exporters
    write ``one,two``), so sentence commas never route."""
    # the head is a 4096-char prefix, so its last line may be
    # truncated mid-record: when more follows a newline, judge only
    # the lines the newline completes (a whole single-line document
    # stays judgeable — it has no newline to cut it)
    if "\n" in head and not head.endswith("\n"):
        body, _, tail = head.rpartition("\n")
        complete_text = body if tail else head
    else:
        complete_text = head
    complete = [l for l in complete_text.split("\n") if l.strip()]
    if not complete:
        return None
    if all(_JSONL_LINE_RE.match(l) for l in complete[:4]):
        probe = complete[0]
        if '":' in probe:
            try:
                if isinstance(json.loads(probe), dict):
                    return "jsonl"
            except ValueError:
                pass
    for delim in _DELIMS:
        if delim not in complete_text:
            continue
        counts = _csv_field_counts(complete_text, delim)
        if len(set(counts)) != 1 or counts[0] < 2:
            continue
        if delim == "\t":
            if len(counts) >= 2:
                return "csv"
            continue
        if len(counts) < 3:
            continue
        try:
            recs = list(
                csv.reader(io.StringIO(complete_text), delimiter=delim)
            )[:4]
        except csv.Error:
            continue
        # edge whitespace marks prose ("one, two"); EMPTY fields are
        # exporter-plausible (empty quoted cells, trailing commas)
        # and must not unroute a real CSV (round-13 fuzz finding:
        # an empty-text doc's 'r0,""' row misrouted the file)
        if all(f == f.strip() for rec in recs for f in rec):
            return "csv"
    return None


def _flatten_cells(cells: list[str]) -> str:
    """One record → one line under the shared paragraph contract:
    embedded newlines inside a cell become spaces, cells join with
    one space, runs collapse, no edge whitespace."""
    line = " ".join(
        c.replace("\r\n", " ").replace("\n", " ").replace("\r", " ")
        for c in cells
    )
    return re.sub(r"[ \t]+", " ", line).strip()


def csv_to_text(src: str) -> str:
    """CSV/TSV → flattened text (one line per record). Raises
    ``ValueError`` with a typed reason on ragged records or
    unparseable quoting — the router turns that into the document's
    quarantine row."""
    delim = None
    for d in _DELIMS:
        if d not in src:
            continue
        counts = _csv_field_counts(src, d, limit=4)
        if counts and len(set(counts)) == 1 and counts[0] >= 2:
            delim = d
            break
    if delim is None:
        raise ValueError("csv: no consistent delimiter")
    out: list[str] = []
    width = None
    for i, rec in enumerate(csv.reader(io.StringIO(src), delimiter=delim)):
        if not rec:
            continue
        if width is None:
            width = len(rec)
        elif len(rec) != width:
            raise ValueError(
                "csv: ragged row %d (got %d fields, want %d)"
                % (i + 1, len(rec), width)
            )
        line = _flatten_cells(rec)
        if line:
            out.append(line)
    return "\n".join(out)


def _flatten_json(v) -> list[str]:
    if v is None:
        return []
    if isinstance(v, bool):
        return ["true" if v else "false"]
    if isinstance(v, str):
        return [v] if v else []
    if isinstance(v, (int, float)):
        return [json.dumps(v)]
    if isinstance(v, list):
        return [p for item in v for p in _flatten_json(item)]
    if isinstance(v, dict):
        return [p for item in v.values() for p in _flatten_json(item)]
    return [str(v)]


def jsonl_to_text(src: str) -> str:
    """JSONL → flattened text (one line per object, values in key
    order). Raises ``ValueError`` with a typed reason on a
    non-object or unparseable line — the document quarantines."""
    out: list[str] = []
    for i, line in enumerate(src.split("\n")):
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
        except ValueError as e:
            raise ValueError("jsonl: row %d unparseable (%s)" % (i + 1, e))
        if not isinstance(obj, dict):
            raise ValueError("jsonl: row %d not an object" % (i + 1))
        flat = re.sub(r"[ \t]+", " ", " ".join(_flatten_json(obj))).strip()
        if flat:
            out.append(flat)
    return "\n".join(out)


def encode_csv(units: list[str], ragged: bool = False) -> bytes:
    """Fixture half: a real CSV per unit list — a bare header, one
    ALWAYS-QUOTED words cell per unit (so cells carrying commas
    exercise RFC 4180 quoting), a fixed record with a doubled
    embedded quote AND a comma inside the quoted cell, and a fixed
    record with an embedded NEWLINE inside the quoted cell. With
    ``ragged=True`` a trailing 3-field record is appended (the
    header is 2 wide) — the quarantine fixture."""
    rows = ["rid,words"]
    rows += ['r%d,"%s"' % (i, u) for i, u in enumerate(units)]
    rows.append('rq,"she said ""hi"", ok"')
    rows.append('rn,"line one\nline two"')
    if ragged:
        rows.append("bad,x,y")
    return "\n".join(rows).encode("utf-8")


def csv_expected_text(units: list[str]) -> str:
    """The exact text :func:`csv_to_text` extracts from
    :func:`encode_csv` (non-ragged)."""
    lines = ["rid words"]
    lines += [
        ("r%d %s" % (i, u)).strip() for i, u in enumerate(units)
    ]
    lines.append('rq she said "hi", ok')
    lines.append("rn line one line two")
    return "\n".join(lines)


def encode_jsonl(units: list[str], malformed: bool = False) -> bytes:
    """Fixture half: a real JSONL per unit list — one object per
    unit (int id + words string, so numeric rendering and key-order
    flattening are pinned), a fixed object with a bool, a null that
    must vanish, and a nested array. With ``malformed=True`` a
    trailing line that is object-SHAPED but not JSON is appended —
    the quarantine fixture (shape-valid so the head sniff still
    routes the document; the PARSE is what must fail typed)."""
    rows = [
        json.dumps({"rid": i, "words": u}) for i, u in enumerate(units)
    ]
    rows.append(
        json.dumps(
            {"rid": 99, "ok": True, "skip": None, "tags": ["a", "b"]}
        )
    )
    if malformed:
        rows.append("{not json}")
    return "\n".join(rows).encode("utf-8")


def jsonl_expected_text(units: list[str]) -> str:
    """The exact text :func:`jsonl_to_text` extracts from
    :func:`encode_jsonl` (non-malformed)."""
    lines = [("%d %s" % (i, u)).strip() for i, u in enumerate(units)]
    lines.append("99 true a b")
    return "\n".join(lines)


TABULAR_FEATURES_SCHEMA = (
    "doc_id bigint, kind string, n_rows int, text string, "
    "ok boolean, err string"
)


def synthesize_tabular_from_text(
    df, text="text", id_col="doc_id", units_mod=3, poison_mod=0
):
    """Deterministic synthetic tabular corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), rendered as CSV for even doc_ids and JSONL for odd.
    Input normalization (mirrored in the oracle): quotes and
    backslashes → ``-`` (they would change the quoting grammar;
    commas deliberately SURVIVE so quoted-cell parsing is exercised
    on real content), the shared divergent set → ``-``, whitespace
    runs → one space. With ``poison_mod=k`` every doc where
    ``doc_id % k == 7`` is rendered RAGGED/MALFORMED instead — the
    typed-quarantine fixture. Returns ``(doc_id, n_units, media
    binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[\"'\\]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                poison = bool(poison_mod) and did % poison_mod == 7
                if did % 2 == 0:
                    media = encode_csv(units, ragged=poison)
                else:
                    media = encode_jsonl(units, malformed=poison)
                ids.append(did)
                nus.append(n)
                medias.append(media)
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def tabular_text_features(df, id_col="doc_id", media_col="media"):
    """Extract flattened text from a CSV/TSV/JSONL column into typed
    rows (``doc_id, kind, n_rows, text, ok, err``) with per-document
    quarantine (ragged/malformed rows poison their document, never
    the batch); extraction runs where the document lives. The kind
    is re-sniffed from the head — the same dispatch the universal
    router uses."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                data = bytes(raw) if raw is not None else b""
                s = data.decode("utf-8", "replace")
                kind = sniff_tabular_kind(s[:4096]) or "text"
                try:
                    if kind == "jsonl":
                        text = jsonl_to_text(s)
                    elif kind == "csv":
                        text = csv_to_text(s)
                    else:
                        text = s
                    n_rows = text.count("\n") + 1 if text else 0
                    rows.append((did, kind, n_rows, text, True, None))
                except Exception as e:
                    rows.append((did, kind, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "n_rows", "text", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=TABULAR_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------
# Parquet (round 13): the columnar container of every shared drive
# ---------------------------------------------------------------------


def parquet_to_text(raw: bytes) -> str:
    """Parquet blob → flattened text under the shared paragraph
    contract: a header line of column names, then one line per row
    of flattened cell values (strings verbatim, numbers rendered
    compactly, nulls vanish, nested lists/structs recurse — the
    same value-flatten JSONL uses). pyarrow owns the container; a
    corrupt footer raises and the document quarantines typed."""
    import io as _io

    import pyarrow.parquet as _pq

    if len(raw) > 1 << 26:
        # same 64 MiB posture as the decompression bomb guard: a
        # parquet file THAT large is a dataset shard, not a document
        # blob — read it with spark.read.parquet, not this kernel
        raise ValueError(
            "parquet: blob over 64 MiB (read as a table, not a "
            "document)"
        )
    table = _pq.read_table(_io.BytesIO(raw))
    cols = list(table.column_names)
    lines = [_flatten_cells([str(c) for c in cols])]
    for row in table.to_pylist():
        parts = []
        for c in cols:
            parts.extend(_flatten_json(row[c]))
        line = re.sub(r"[ \t]+", " ", " ".join(parts)).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def encode_parquet(units: list[str]) -> bytes:
    """Fixture half: a real two-column parquet file — int64 ``rid``
    + string ``words`` rows (one per unit) plus a fixed trailing
    row whose ``words`` is NULL (must vanish in the flatten)."""
    import io as _io

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    buf = _io.BytesIO()
    _pq.write_table(
        _pa.table(
            {
                "rid": list(range(len(units))) + [99],
                "words": list(units) + [None],
            }
        ),
        buf,
    )
    return buf.getvalue()


def parquet_expected_text(units: list[str]) -> str:
    """The exact text :func:`parquet_to_text` extracts from
    :func:`encode_parquet`."""
    lines = ["rid words"]
    lines += [("%d %s" % (i, u)).strip() for i, u in enumerate(units)]
    lines.append("99")
    return "\n".join(lines)


PARQUET_FEATURES_SCHEMA = (
    "doc_id bigint, n_rows int, n_cols int, text string, "
    "ok boolean, err string"
)


def synthesize_parquet_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic parquet corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), written through :func:`encode_parquet` (pyarrow, in
    the kernel). Same normalization as the CSV/JSONL synthesizer.
    Returns ``(doc_id, n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[\"'\\]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                medias.append(encode_parquet(units))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def parquet_text_features(df, id_col="doc_id", media_col="media"):
    """Extract flattened text + shape from a parquet column into
    typed rows (``doc_id, n_rows, n_cols, text, ok, err``) with
    per-document quarantine; extraction runs where the blob
    lives."""

    def extract(batches):
        import io as _io

        import pandas as pd

        import pyarrow.parquet as _pq

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    table = _pq.read_table(_io.BytesIO(data))
                    text = parquet_to_text(data)
                    rows.append(
                        (did, table.num_rows, table.num_columns,
                         text, True, None)
                    )
                except Exception as e:
                    rows.append(
                        (did, None, None, None, False, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_rows", "n_cols", "text", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=PARQUET_FEATURES_SCHEMA
    )
