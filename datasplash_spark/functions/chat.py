"""Conversation (chat / SFT) data-prep operators: parse JSON
conversation transcripts into typed turns, validate the role
structure a fine-tuning pipeline requires, and flatten to per-turn
rows — LLM-data-pipeline extensions (BASELINE.json north_star).

Design for 100 TB:

- Parsing is ``from_json`` with an explicit schema — one stateless
  codegen'd scan, no Python, malformed rows degrade to NULL (and to
  ``parse_ok = false`` in the diagnostics) instead of failing the
  job.
- Every validity check is a higher-order array expression over the
  parsed turns (filter/aggregate) — per-row work bounded by turn
  count, zero shuffle.
- :func:`flatten_turns` is the only op that changes cardinality
  (posexplode); downstream per-turn processing inherits the source
  partitioning.

Engine mirror: the DuckDB oracle parses with ``json_transform`` +
``json_valid`` and mirrors each check with ``list_filter`` counts
(DuckDB lambda indexes are 1-based where Spark's are 0-based — the
oracle SQL shifts accordingly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col

#: Typed schema for a parsed conversation: ordered turns of
#: (role, content). Extra JSON keys are dropped, missing keys are
#: NULL — the permissive contract chat corpora need.
CHAT_TURNS_SCHEMA = "array<struct<role:string,content:string>>"


def parse_turns(json_col: ColumnLike) -> Column:
    """Parsed turns column (``CHAT_TURNS_SCHEMA``); NULL when the
    JSON is malformed or not an array of objects."""
    return F.from_json(_col(json_col), CHAT_TURNS_SCHEMA)


def conversation_stats(
    df: DataFrame,
    json_col: ColumnLike = "conv_json",
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Per-conversation structural diagnostics — the QA gate an SFT
    corpus passes before training. Checks (all false when parsing
    fails):

    - ``parse_ok``: JSON parsed to an array of turns.
    - ``sys_ok``: at most one ``system`` turn, and only at index 0.
    - ``alt_ok``: after dropping system turns, roles strictly
      alternate user/assistant starting with user (unknown roles
      fail this check).
    - ``no_empty``: every turn has non-NULL, non-empty content.
    - ``ends_assistant``: the last non-system turn is the assistant
      (a training example needs a target).
    - ``valid``: conjunction of all of the above.

    Plus counts: ``n_turns``, ``n_user``, ``n_assistant``,
    ``n_system``, ``content_chars``. One stateless scan, all checks
    are higher-order array expressions — no shuffle, no Python.

    Reference anchor: no analog in datasplash; LLM-pipeline
    extension surface (BASELINE.json north_star).
    """
    turns = parse_turns(json_col)

    def role_count(role: str) -> Column:
        return F.size(F.filter(turns, lambda t: t.role == F.lit(role)))

    body = F.filter(turns, lambda t: t.role != F.lit("system"))
    parse_ok = turns.isNotNull()
    n_system = role_count("system")
    sys_ok = (n_system == 0) | (
        (n_system == 1)
        & (F.element_at(turns, 1).getField("role") == F.lit("system"))
    )
    alt_ok = (
        F.size(
            F.filter(
                body,
                lambda t, i: t.role
                == F.when(i % 2 == 0, F.lit("user")).otherwise(
                    F.lit("assistant")
                ),
            )
        )
        == F.size(body)
    )
    no_empty = (
        F.size(
            F.filter(
                turns,
                lambda t: t.content.isNotNull() & (F.length(t.content) > 0),
            )
        )
        == F.size(turns)
    )
    ends_assistant = (F.size(body) > 0) & (
        F.element_at(body, -1).getField("role") == F.lit("assistant")
    )
    content_chars = F.aggregate(
        turns,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(F.length(t.content), F.lit(0)),
    )

    def guarded(flag: Column) -> Column:
        return F.when(parse_ok, flag).otherwise(F.lit(False))

    def counted(c: Column) -> Column:
        return F.when(parse_ok, c).otherwise(F.lit(0)).cast("long")

    out_sys = guarded(sys_ok)
    out_alt = guarded(alt_ok)
    out_empty = guarded(no_empty)
    out_ends = guarded(ends_assistant)
    return df.select(
        _col(id_col).alias("doc_id"),
        parse_ok.alias("parse_ok"),
        counted(F.size(turns)).alias("n_turns"),
        counted(role_count("user")).alias("n_user"),
        counted(role_count("assistant")).alias("n_assistant"),
        counted(n_system).alias("n_system"),
        counted(content_chars).alias("content_chars"),
        out_sys.alias("sys_ok"),
        out_alt.alias("alt_ok"),
        out_empty.alias("no_empty"),
        out_ends.alias("ends_assistant"),
        (parse_ok & out_sys & out_alt & out_empty & out_ends).alias("valid"),
    )


def flatten_turns(
    df: DataFrame,
    json_col: ColumnLike = "conv_json",
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Explode conversations to one row per turn: ``(doc_id,
    turn_idx, role, content)`` — the shape per-turn processing
    (PII redaction, quality scoring, token counting) runs over.
    Malformed conversations yield no rows (filter upstream with
    :func:`conversation_stats` to audit them). ``turn_idx`` is
    0-based conversation order."""
    return (
        df.select(
            _col(id_col).alias("doc_id"),
            F.posexplode(parse_turns(json_col)),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("turn_idx"),
            F.col("col").getField("role").alias("role"),
            F.col("col").getField("content").alias("content"),
        )
    )


def sft_token_stats(
    df: DataFrame,
    json_col: ColumnLike = "conv_json",
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """SFT token accounting — the budget numbers a fine-tuning run
    is planned around: per conversation, total whitespace tokens
    across all turns vs ASSISTANT-only tokens (the loss tokens under
    the standard assistant-only masking) and their micro fixed-point
    ratio. Returns ``(doc_id, n_turns, n_tok_total, n_tok_loss,
    loss_frac_micro)``; malformed transcripts report zeros. One
    stateless scan, higher-order aggregates over the parsed turns.

    Reference anchor: no analog; LLM-pipeline extension surface
    (BASELINE.json north_star)."""
    turns = parse_turns(json_col)
    parse_ok = turns.isNotNull()

    def tok_count(t: Column) -> Column:
        # Non-empty pieces only: '' is 0 tokens and runs of spaces
        # add no phantom tokens (matches the tokens() discipline
        # used by the text stack; ADVICE r6).
        return F.size(
            F.filter(
                F.split(F.coalesce(t, F.lit("")), " ", -1),
                lambda x: x != F.lit(""),
            )
        )

    def tok_sum(filtered: Column) -> Column:
        return F.aggregate(
            filtered,
            F.lit(0).cast("long"),
            lambda acc, t: acc + tok_count(t.content),
        )

    total = tok_sum(turns)
    loss = tok_sum(F.filter(turns, lambda t: t.role == F.lit("assistant")))
    zero = F.lit(0).cast("long")

    def counted(c: Column) -> Column:
        return F.when(parse_ok, c).otherwise(zero).cast("long")

    return df.select(
        _col(id_col).alias("doc_id"),
        counted(F.size(turns)).alias("n_turns"),
        counted(total).alias("n_tok_total"),
        counted(loss).alias("n_tok_loss"),
    ).select(
        "*",
        F.when(
            F.col("n_tok_total") > 0,
            F.expr("n_tok_loss * 1000000L div n_tok_total"),
        )
        .otherwise(zero)
        .cast("long")
        .alias("loss_frac_micro"),
    )
