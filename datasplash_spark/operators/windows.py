"""Event-time windowing (batch + streaming — same API, per Structured
Streaming's unified model).

Reference parity (/root/reference/src/clj/datasplash/core.clj):
``fixed-windows`` 2096-2114, ``sliding-windows`` 2116-2135,
``session-windows`` 2137-2155, window options (allowed lateness /
trigger / accumulation mode) 2082-2094, ``with-timestamp`` 316-326.

Beam attaches windows to elements and lets any downstream GroupByKey
group per-window; Spark expresses the same thing as a window *column*
in the groupBy. Pane/trigger semantics are only approximable via
output modes + ``writeStream.trigger`` — documented gap (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .elementwise import ColumnLike, _col


def with_timestamp(df: DataFrame, ts_expr: ColumnLike, name: str = "ts") -> DataFrame:
    """``with-timestamp`` (core.clj:316-326): set/overwrite the
    event-time column used by windowed grouping."""
    return df.withColumn(name, _col(ts_expr).cast("timestamp"))


def fixed_windows(ts: ColumnLike, width: str) -> Column:
    """``fixed-windows`` (core.clj:2096-2114): tumbling event-time
    windows; group by the returned column."""
    return F.window(_col(ts), width)


def sliding_windows(ts: ColumnLike, width: str, step: str) -> Column:
    """``sliding-windows`` (core.clj:2116-2135): width + slide step."""
    return F.window(_col(ts), width, step)


def session_windows(ts: ColumnLike, gap: str) -> Column:
    """``session-windows`` (core.clj:2137-2155): gap-merged sessions.
    Works in batch groupBy and streaming (update/complete modes)."""
    return F.session_window(_col(ts), gap)


def with_allowed_lateness(df: DataFrame, ts: str, lateness: str) -> DataFrame:
    """``:with-allowed-lateness`` (core.clj:2087-2088) → watermark.
    Only meaningful on streaming DataFrames; no-op marker in batch."""
    return df.withWatermark(ts, lateness) if df.isStreaming else df


def sessionize(
    df: DataFrame,
    key: ColumnLike,
    ts: ColumnLike,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key SESSION ID to every event (gap-based): a new
    session starts when the time since the key's previous event
    exceeds ``gap_seconds``. Complements :func:`session_windows`
    (which aggregates per session) by labeling the EVENTS — the shape
    needed when downstream work is per-event but session-aware
    (e.g. chunk a user's history by session).

    One shuffle on the key + an ordered window (lag → gap flag →
    running sum). Session ids are 0-based per key and deterministic
    given unique (key, ts). Classic gaps-and-islands; identical SQL
    runs on any engine (the oracle uses the same formulation).
    """
    from pyspark.sql import Window

    k, t = _col(key), _col(ts)
    w = Window.partitionBy(k).orderBy(t)
    prev = F.lag(t).over(w)
    new_session = F.when(
        prev.isNull()
        | ((t.cast("double") - prev.cast("double")) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
