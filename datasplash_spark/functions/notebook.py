"""Jupyter notebook text extraction (round 13).

Notebooks are a top-tier code-corpus modality (every data-science
repo and shared drive is full of them) and they are pure JSON
(nbformat 4), so the extractor is stdlib-only like every other
family. Extraction model:

- ``code`` cells: source VERBATIM (code is corpus text — the same
  lossless contract as ``functions/code.py``); execution outputs
  are artifacts, never corpus text, and are ignored.
- ``markdown`` cells: source through the real CommonMark-core
  extractor (``functions/markdown.py``) — prose in notebooks is
  markdown, not plain text.
- ``raw`` cells: source verbatim.
- cells join with ONE newline; empty cells vanish. nbformat stores
  source as a list of lines or a single string — both accepted.

A document that is not a JSON object with a ``cells`` list raises
typed — the router quarantines it.

Reference anchor: the reference has no notebook codec — north-star
LLM-pipeline surface (BASELINE.json); the format is the public
nbformat 4 schema (nbformat.readthedocs.io).
"""

from __future__ import annotations

import json
import re

from . import web as _web


def _cell_source(cell: dict) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        src = "".join(str(s) for s in src)
    return str(src)


def ipynb_to_text(src: str) -> str:
    """Notebook JSON → corpus text (module docstring). Raises
    ``ValueError`` with a typed reason when the document is not an
    nbformat-4-shaped object."""
    from . import markdown as md

    try:
        obj = json.loads(src)
    except ValueError as e:
        raise ValueError(f"ipynb: unparseable JSON ({e})")
    if not isinstance(obj, dict) or not isinstance(
        obj.get("cells"), list
    ):
        raise ValueError("ipynb: no cells list (not nbformat 4)")
    parts: list[str] = []
    for cell in obj["cells"]:
        if not isinstance(cell, dict):
            raise ValueError("ipynb: non-object cell")
        kind = cell.get("cell_type")
        text = _cell_source(cell)
        if kind == "markdown":
            text = md.markdown_to_text(text)
        else:
            # code / raw: verbatim, minus a trailing newline so the
            # cell join contract stays one-newline-between-cells
            text = text.rstrip("\n")
        if text:
            parts.append(text)
    return "\n".join(parts)


def sniff_ipynb(head: str) -> bool:
    """Notebook detection for the router: a JSON object head whose
    first 4096 chars carry the nbformat cell markers. Strong enough
    that no other family collides (JSONL is one object PER LINE; a
    notebook is one object over thousands of lines)."""
    stripped = head.lstrip()
    return (
        stripped.startswith("{")
        and '"cells"' in head
        and '"cell_type"' in head
    )


def encode_ipynb(units: list[str], doc_id: int = 0) -> bytes:
    """Fixture half: a real nbformat-4 notebook per unit list — per
    unit a MARKDOWN cell (ATX heading + paragraph, so the markdown
    pass is exercised inside the notebook) and a CODE cell (an
    assignment plus a trailing comment, source as a LIST of lines —
    the nbformat convention) carrying a stream output that must be
    IGNORED, plus a fixed trailing raw cell."""
    cells: list[dict] = []
    for i, u in enumerate(units):
        cells.append(
            {
                "cell_type": "markdown",
                "metadata": {},
                # the paragraph leads with a cell-keyed token so a
                # unit that BEGINS with '-' (the normalization's
                # replacement char) can never read as a list marker
                # (round-13 fuzz finding)
                "source": [
                    "## Cell %d\n" % i,
                    "\n",
                    ("md%d %s" % (i, u)) if u else "md%d" % i,
                ],
            }
        )
        cells.append(
            {
                "cell_type": "code",
                "execution_count": i,
                "metadata": {},
                "outputs": [
                    {
                        "output_type": "stream",
                        "name": "stdout",
                        "text": ["OUTPUT MUST BE IGNORED\n"],
                    }
                ],
                "source": ['x%d = "%s"\n' % (i, u), "# trailing %d" % i],
            }
        )
    cells.append(
        {"cell_type": "raw", "metadata": {}, "source": "raw tail d%d" % doc_id}
    )
    nb = {
        "cells": cells,
        "metadata": {"language_info": {"name": "python"}},
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    return json.dumps(nb).encode("utf-8")


def ipynb_expected_text(units: list[str], doc_id: int = 0) -> str:
    """The exact text :func:`ipynb_to_text` extracts from
    :func:`encode_ipynb`."""
    parts: list[str] = []
    for i, u in enumerate(units):
        body = ("md%d %s" % (i, u)) if u else "md%d" % i
        parts.append("Cell %d\n%s" % (i, body))
        parts.append('x%d = "%s"\n# trailing %d' % (i, u, i))
    parts.append("raw tail d%d" % doc_id)
    return "\n".join(parts)


NOTEBOOK_FEATURES_SCHEMA = (
    "doc_id bigint, n_cells int, n_code_cells int, text string, "
    "ok boolean, err string"
)


def synthesize_ipynb_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic notebook corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), rendered through :func:`encode_ipynb`. Input
    normalization (mirrored in the oracle): the markdown + code
    union class (markup specials, quotes, backslash, ``/``) → ``-``,
    the shared divergent set → ``-``, whitespace runs → one space.
    Returns ``(doc_id, n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[\\`*_\[\]()#!<>~|\"'/]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                medias.append(encode_ipynb(units, did))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def notebook_text_features(df, id_col="doc_id", media_col="media"):
    """Extract notebook text + cell stats into typed rows
    (``doc_id, n_cells, n_code_cells, text, ok, err``) with
    per-document quarantine; extraction runs where the blob
    lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    s = data.decode("utf-8", "replace")
                    obj = json.loads(s)
                    cells = obj["cells"]
                    text = ipynb_to_text(s)
                    rows.append(
                        (
                            did,
                            len(cells),
                            sum(
                                1
                                for c in cells
                                if c.get("cell_type") == "code"
                            ),
                            text,
                            True,
                            None,
                        )
                    )
                except Exception as e:
                    rows.append((did, None, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_cells", "n_code_cells", "text",
                    "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=NOTEBOOK_FEATURES_SCHEMA
    )
