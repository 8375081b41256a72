"""Per-key stateful transforms.

The reference's stateful DoFn holds one ``ValueState`` cell per key
(/root/reference/src/java/ClojureStatefulDoFn.java:19-41): the user
fn receives ``(state)`` and may read/write it per element; tested as
a running per-key counter (test/datasplash/api_test.clj:342-357).

Spark shapes:

- **Streaming**: ``applyInPandasWithState`` — the honest equivalent
  (keyed state store, watermark-driven timeouts).
- **Batch**: Beam's batch semantics here are bundle-local and
  order-dependent even in the reference (SURVEY §7.3c). We define the
  reproducible version: state evolves per key in the order of an
  explicit ``order_by`` column via one ``applyInPandas`` per key.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_map_groups(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[Any, Iterable, Any], tuple[Iterable[dict], Any]],
    state_schema: str,
    output_schema: str,
    output_mode: str = "update",
    timeout: str = "NoTimeout",
    timeout_timestamp: Callable[[list, Any], int] | None = None,
    on_timeout: Callable[[Any, Any], tuple[Iterable[dict], Any]] | None = None,
):
    """Streaming per-key ``ValueState`` transform.

    ``fn(key, rows, state_value) -> (out_rows, new_state)`` where
    ``rows`` is an iterable of dicts for this key in this trigger,
    ``state_value`` is the prior state (None first time) and
    ``new_state`` is persisted (None clears). The plumbing below maps
    that contract onto ``applyInPandasWithState``.

    Timeouts (the reference's window-expiry analog): with
    ``timeout="EventTimeTimeout"`` (requires ``withWatermark`` on the
    input) or ``"ProcessingTimeTimeout"``, ``timeout_timestamp(rows,
    new_state) -> epoch-ms`` arms the per-key timer after each data
    call; when the watermark/clock passes it, ``on_timeout(key,
    state_value) -> (out_rows, new_state)`` fires exactly once for
    the expiring key — return rows to emit (e.g. a final session
    summary) and None to clear (default: emit nothing, clear).
    """
    import pandas as pd

    timeout_conf = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
    }[timeout]

    def wrapper(key, pdf_iter: Iterator["pd.DataFrame"], state: GroupState):
        prior = state.get[0] if state.exists else None
        if state.hasTimedOut:
            out_rows, new_state = (
                on_timeout(key, prior) if on_timeout else ((), None)
            )
        else:
            rows: list[dict] = []
            for pdf in pdf_iter:
                rows.extend(pdf.to_dict("records"))
            out_rows, new_state = fn(key, rows, prior)
        if new_state is None:
            if state.exists:
                state.remove()
        else:
            state.update((new_state,))
            if not state.hasTimedOut and timeout_timestamp is not None:
                state.setTimeoutTimestamp(int(timeout_timestamp(rows, new_state)))
        out = pd.DataFrame(list(out_rows))
        yield out

    return df.groupBy(*key_cols).applyInPandasWithState(
        wrapper,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=timeout_conf,
    )


def running_agg(
    df: DataFrame,
    key_cols: list[str],
    order_by,
    **aggs,
) -> DataFrame:
    """Associative per-key running aggregate — the NATIVE batch path.

    When the per-key state update is an associative aggregate (sum,
    count, min/max, running mean via sum+count …), stateful-map
    semantics reduce exactly to a window aggregate over
    ``ROWS UNBOUNDED PRECEDING``. That runs JVM-side (WindowExec,
    whole-stage adjacent), shuffles once on the key, never
    materializes a key's history in Python, and moves zero bytes over
    Arrow — reserve :func:`batch_stateful` for genuinely
    non-associative state machines (set/dict state, resets,
    order-dependent branching).

    ``aggs`` maps output column name → aggregate Column, e.g.
    ``running_sum=F.sum("value")``.
    """
    from pyspark.sql import Window

    orders = [order_by] if not isinstance(order_by, (list, tuple)) else list(order_by)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*orders)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def batch_stateful(
    df: DataFrame,
    key_cols: list[str],
    order_by: str,
    fn: Callable[[Any, list[dict]], Iterable[dict]],
    output_schema: str,
) -> DataFrame:
    """Batch-mode stateful map with *defined* semantics: per key, rows
    are sorted by ``order_by`` and handed to ``fn(key, rows)`` which
    threads whatever state it likes and returns output rows.

    (The reference's batch stateful test relies on bundle order —
    nondeterministic; an explicit ordering column is the reproducible
    contract, per SURVEY §7.3c.)
    """
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        key = tuple(pdf.iloc[0][k] for k in key_cols)
        return pd.DataFrame(list(fn(key, pdf.to_dict("records"))))

    # Explicit key-hash repartition: AQE's shuffle coalescing targets
    # shuffle BYTES, so a small-but-Python-hot stage gets squeezed to
    # one partition and the whole pandas state machine runs on one
    # core. Pinning the partitioning (which also satisfies the
    # groupBy's clustering — no second Exchange) keeps the Python
    # stage parallel; at scale the byte-based heuristic is wrong for
    # CPU-bound UDF stages in exactly the same way.
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n, *key_cols)
        .groupBy(*key_cols)
        .applyInPandas(run, schema=output_schema)
    )


def dedup_stream(
    df: "DataFrame",
    keys: list[str],
    event_time: str | None = None,
    watermark: str = "10 minutes",
) -> "DataFrame":
    """Streaming exact dedup for continuous ingestion: drop repeat
    keys (e.g. doc digests) as records arrive. With ``event_time``
    set, `dropDuplicatesWithinWatermark` bounds the dedup state to the
    watermark horizon — WITHOUT it, state grows with every distinct
    key ever seen (unbounded; only use for bounded key domains).

    The streaming admission analog of
    ``functions.dedup.incremental_new_docs`` (which handles the
    against-historical-store half via anti-join); together they are
    the ingest-time dedup story: in-flight repeats die here, repeats
    of stored history die in the batch anti-join.
    """
    if event_time is not None:
        return df.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)


def rolling_agg(
    df: DataFrame,
    key_cols: list[str],
    order_numeric,
    range_back: float,
    **aggs,
) -> DataFrame:
    """Bounded rolling aggregate per key: each row gets aggregates
    over the key's rows with order value in
    ``[current - range_back, current]`` (inclusive RANGE frame — e.g.
    epoch seconds for a trailing time window).

    The bounded sibling of :func:`running_agg` — same shape (one
    shuffle on the key, JVM WindowExec, no Python), but the frame is
    a RANGE over a NUMERIC order column (Spark's rangeBetween
    requirement; cast timestamps to epoch seconds first). State per
    key is the frame, not the history — memory-bounded at any key
    size.

    ``aggs`` maps output column name → aggregate Column, e.g.
    ``avg_1h=F.avg("value")``.
    """
    from pyspark.sql import Window

    from ..operators.elementwise import _col

    back = -range_back
    if isinstance(back, float):
        if not back.is_integer():
            raise ValueError(
                "rangeBetween bounds must be whole numbers; scale the "
                "order column (e.g. to millis) for sub-unit windows"
            )
        back = int(back)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(_col(order_numeric))
        .rangeBetween(back, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out
