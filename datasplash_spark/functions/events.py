"""Event-sequence analytics: funnels over (user, event_type, ts)
streams — LLM/product-pipeline extension beyond the reference's
operator surface (datasplash has no ordered/sequence operators at
all, SURVEY §2.9).

Scale shape: ONE scan + ONE shuffle on the user key. Per-user stage
timestamps come from a single groupBy — the first stage as a
conditional min, later stages as sorted per-user timestamp arrays
refined with `F.filter(arr, x >= prev)[0]` (earliest occurrence at or
after the previous stage). Per-user arrays hold only the matching
stage's events; bound them upstream (e.g. pre-aggregate to per-day
firsts) if single users can have millions of one event type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col


def funnel_stage_times(
    df: DataFrame,
    stages: list[str],
    user_col: ColumnLike = "user_id",
    type_col: ColumnLike = "event_type",
    ts_col: ColumnLike = "ts",
) -> DataFrame:
    """Per-user ordered funnel: one row per user with a timestamp
    column ``t0..t{n-1}`` per stage — ``t_i`` is the user's EARLIEST
    ``stages[i]`` event at-or-after ``t_{i-1}`` (null = never reached,
    and nulls cascade to all later stages).
    """
    user, etype, ts = _col(user_col), _col(type_col), _col(ts_col)
    aggs: list[Column] = [
        F.min(F.when(etype == stages[0], ts)).alias("t0")
    ]
    for i, st in enumerate(stages[1:], start=1):
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(etype == st, ts))
            ).alias(f"_arr{i}")
        )
    per_user = df.groupBy(user.alias("user_id")).agg(*aggs)
    out_cols: list[Column] = [F.col("user_id"), F.col("t0")]
    for i in range(1, len(stages)):
        prev = out_cols[-1]
        # F.get (not getItem): empty filtered array → NULL, where
        # getItem(0) throws under ANSI mode
        arr_first = F.get(
            F.filter(F.col(f"_arr{i}"), _at_or_after(prev)), 0
        )
        out_cols.append(
            F.when(prev.isNotNull(), arr_first).alias(f"t{i}")
        )
    return per_user.select(*out_cols)


def _at_or_after(prev: Column):
    # closure factory: PySpark derives HOF-lambda arity from the
    # Python signature, so `lambda x, p=prev: ...` would break
    return lambda x: x >= prev


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: ColumnLike = "user_id",
    type_col: ColumnLike = "event_type",
    ts_col: ColumnLike = "ts",
) -> DataFrame:
    """One-row funnel summary: ``n_stage{i}`` = users whose ordered
    funnel reached stage i (count of non-null ``t_i``)."""
    st = funnel_stage_times(df, stages, user_col, type_col, ts_col)
    return st.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n_stage{i}")
            for i in range(len(stages))
        ]
    )


def cohort_retention(
    df: DataFrame,
    user: ColumnLike = "user_id",
    ts: ColumnLike = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST activity
    period (the cohort), counted in every period they return —
    ``(cohort, period, n_users)`` with periods as epoch seconds of
    the period start (tz-neutral across engines).

    Shape for 100 TB event streams: the raw stream first reduces to
    DISTINCT (user, period) — one partial-agg shuffle on the user key
    that collapses per-user event volume to at most #periods rows —
    then the per-user cohort is a min over that reduced table (window
    on the same user-hash partitioning: no second Exchange), and the
    matrix is one count-distinct-free aggregate on (cohort, period)
    of already-distinct rows. Raw events shuffle once.
    """
    p = F.unix_timestamp(F.date_trunc(period, _col(ts))).alias("period")
    up = (
        df.select(_col(user).alias("user_id"), p)
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    labeled = up.withColumn("cohort", F.min("period").over(w))
    return (
        labeled.groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_path_ngrams(
    df: DataFrame,
    n: int = 3,
    user_col: ColumnLike = "user_id",
    type_col: ColumnLike = "event_type",
    ts_col: ColumnLike = "ts",
    id_col: ColumnLike = "event_id",
    min_count: int = 1,
    sep: str = ">",
) -> DataFrame:
    """Behavioral path mining: counts of length-``n`` event-type
    sequences users actually walk (the product-analytics "common
    paths" report — 'view>view>purchase'). One groupBy(user)
    assembles each user's deterministic timeline (sort by
    ``(ts, id)`` — the id tiebreak makes simultaneous events
    stable), n-grams slide per user as an array expression, and one
    vocab-bounded count aggregate finishes — two shuffles total,
    both on small rows (the event payload never moves past the
    first).

    Users with fewer than ``n`` events contribute nothing (guarded —
    Spark's ``sequence(1, k)`` with ``k < 1`` would DESCEND).
    Returns ``(path, n_users_walks)`` with counts >= ``min_count``;
    ``path`` joins types with ``sep``.

    Reference anchor: no analog; analytics extension surface
    (BASELINE.json north_star).
    """
    seq = df.groupBy(_col(user_col).alias("user")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    _col(ts_col).alias("ts"),
                    _col(id_col).alias("eid"),
                    _col(type_col).alias("et"),
                )
            )
        ).alias("seq")
    )
    # slice the MATERIALIZED seq column inside the lambda (cheap
    # array read), never a derived expression — Catalyst inlines
    # single-reference expressions into lambda bodies, which would
    # re-evaluate the projection per gram index (the winnowing
    # O(n²) lesson, SCALING.md)
    m = F.size(F.col("seq"))
    grams = F.when(m < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), m - n + 1),
            lambda i: F.array_join(
                F.transform(
                    F.slice(F.col("seq"), i, n),
                    lambda s: s.getField("et"),
                ),
                sep,
            ),
        )
    )
    return (
        seq.select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("walks"))
        .filter(F.col("walks") >= int(min_count))
    )
