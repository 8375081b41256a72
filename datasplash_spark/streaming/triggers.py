"""Beam trigger/pane-semantics emulation (round 10).

The reference exposes Beam's windowing TRIGGERS — early/on-time/late
PANES with accumulating or discarding accumulation
(core.clj:2082-2094) — which Structured Streaming's output modes
only approximate (documented limit, SURVEY §7.3a / MIGRATION.md).
This module closes the gap for the common trigger shapes by
emulating Beam's ``PaneInfo`` model directly on the keyed state
store: one state cell per ``(key, window)`` holds the running
aggregate, the pane index, and the firing history; event-time
timeouts provide the watermark-driven ON_TIME and window-close
firings.

Supported trigger shapes (the ones real pipelines use):

- ``{"after-count": N}`` — ``Repeatedly(AfterPane.elementCountAtLeast
  (N))``: a pane fires whenever a key-window has accumulated ≥ N new
  elements; a final residual pane fires at window close.
- ``"after-watermark"`` — ``AfterWatermark.pastEndOfWindow()``: one
  ON_TIME pane when the watermark passes the window end, optional
  EARLY panes every ``early_count`` elements before it
  (``withEarlyFirings(elementCountAtLeast(early_count))``), and one
  LATE pane per micro-batch of late data within
  ``allowed_lateness`` (``withLateFirings(AfterPane.
  elementCountAtLeast(1))``).

Accumulation: ``"accumulating"`` emits the full running aggregate in
every pane; ``"discarding"`` emits only the delta since the previous
pane — both exactly Beam's accumulation-mode contract. Every output
row carries Beam's pane metadata: ``pane_index``, ``pane_timing``
(EARLY / ON_TIME / LATE), ``is_last``.

What stays approximate: processing-time triggers tie to micro-batch
cadence rather than wall-clock timers (Structured Streaming has no
per-key processing-time timer visible to the plan), and
``AfterWatermark`` without lateness emits its ON_TIME pane when the
TIMEOUT fires — i.e. at the first micro-batch boundary after the
watermark passes, exactly like Beam on a runner with aligned
bundles.

Reference anchor: datasplash ``fixed-windows``/``session-windows``
trigger options (core.clj:2082-2094); Beam PaneInfo is public API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PANED_OUTPUT_SCHEMA = (
    "key string, window_start timestamp, window_end timestamp, "
    "pane_index int, pane_timing string, is_last boolean, "
    "value long, pane_rows long"
)

#: state: running sum, rows since last fire, value emitted at last
#: fire (for discarding), pane index, fired-on-time flag, total rows
_STATE_SCHEMA = (
    "acc long, n_since long, last_emitted long, pane_index int, "
    "fired_on_time boolean, total_rows long"
)


def paned_window_agg(
    df: DataFrame,
    time_col: str,
    key_col: str,
    window_duration: str,
    value_col: str | None = None,
    trigger: "str | dict" = "after-watermark",
    accumulation: str = "accumulating",
    early_count: int | None = None,
    allowed_lateness: str = "0 seconds",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Windowed SUM (or COUNT when ``value_col`` is None) over fixed
    event-time windows with Beam pane semantics. Returns a streaming
    DataFrame of pane rows (``PANED_OUTPUT_SCHEMA``); run it with
    ``outputMode("append")`` — panes are emitted exactly once, which
    is precisely Beam's firing model (the pane stream IS the
    output)."""
    import pandas as pd

    if accumulation not in ("accumulating", "discarding"):
        raise ValueError(f"unknown accumulation {accumulation!r}")
    after_count = None
    if isinstance(trigger, dict):
        after_count = int(trigger["after-count"])
        if after_count < 1:
            raise ValueError("after-count must be >= 1")
    elif trigger != "after-watermark":
        raise ValueError(f"unknown trigger {trigger!r}")

    dur_ms = _duration_ms(window_duration)
    late_ms = _duration_ms(allowed_lateness)

    val = (
        F.lit(1).cast("long")
        if value_col is None
        else F.col(value_col).cast("long")
    )
    win_start = F.to_timestamp(
        F.from_unixtime(
            F.floor(F.unix_timestamp(F.col(time_col)) / (dur_ms // 1000))
            * (dur_ms // 1000)
        )
    )
    prepped = (
        df.withWatermark(time_col, watermark_delay)
        .select(
            F.col(key_col).cast("string").alias("key"),
            win_start.alias("window_start"),
            F.col(time_col).alias("_ts"),
            val.alias("_v"),
        )
    )

    def machine(key, pdf_iter, state: GroupState):
        k, wstart = key
        wstart_ms = int(pd.Timestamp(wstart).value // 1_000_000)
        wend_ms = wstart_ms + dur_ms
        if state.exists:
            acc, n_since, last_emitted, pane_index, fired, total = state.get
        else:
            acc, n_since, last_emitted, pane_index, fired, total = (
                0, 0, 0, 0, False, 0
            )
        out = []

        def fire(timing: str, is_last: bool) -> None:
            nonlocal n_since, last_emitted, pane_index
            value = acc if accumulation == "accumulating" else acc - last_emitted
            out.append(
                {
                    "key": k,
                    "window_start": pd.Timestamp(wstart_ms, unit="ms"),
                    "window_end": pd.Timestamp(wend_ms, unit="ms"),
                    "pane_index": pane_index,
                    "pane_timing": timing,
                    "is_last": is_last,
                    "value": value,
                    "pane_rows": n_since,
                }
            )
            last_emitted = acc
            n_since = 0
            pane_index += 1

        if state.hasTimedOut:
            wm = state.getCurrentWatermarkMs()
            if not fired and wm >= wend_ms:
                # the watermark passed the window end: ON_TIME pane
                # for after-watermark; residual final pane for
                # after-count
                if after_count is None:
                    fire("ON_TIME", is_last=late_ms == 0)
                    fired = True
                elif n_since > 0 or pane_index == 0:
                    fire("ON_TIME", is_last=True)
            if wm >= wend_ms + late_ms or (after_count is not None):
                state.remove()
                yield pd.DataFrame(out)
                return
            # keep state open for late panes until lateness expires
            state.update(
                (acc, n_since, last_emitted, pane_index, True, total)
            )
            state.setTimeoutTimestamp(
                max(wend_ms + late_ms, wm + 1)
            )
            yield pd.DataFrame(out)
            return

        wm0 = state.getCurrentWatermarkMs()
        if not fired and after_count is None and wm0 >= wend_ms:
            # the watermark passed the window end BEFORE this batch
            # (data arrived in the same micro-batch that would have
            # processed the timeout): the ON_TIME pane fires first,
            # over the on-time data only — the incoming rows are late
            # and belong to a LATE pane, exactly Beam's ordering
            fire("ON_TIME", is_last=False)
            fired = True
        n_new = 0
        for pdf in pdf_iter:
            n_new += len(pdf)
            acc += int(pdf["_v"].sum())
        n_since += n_new
        total += n_new
        if fired and n_since > 0:
            fire("LATE", is_last=False)
        elif after_count is not None:
            while n_since >= after_count:
                # Beam fires once per bundle reaching the count; a
                # micro-batch is the bundle here — one pane per batch
                fire("EARLY", is_last=False)
                break
        elif early_count is not None and n_since >= early_count:
            fire("EARLY", is_last=False)
        state.update((acc, n_since, last_emitted, pane_index, fired, total))
        wm = state.getCurrentWatermarkMs()
        target = wend_ms if not fired else wend_ms + late_ms
        state.setTimeoutTimestamp(max(target, wm + 1))
        yield pd.DataFrame(out)

    return prepped.groupBy("key", "window_start").applyInPandasWithState(
        machine,
        outputStructType=PANED_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _duration_ms(s: str) -> int:
    """'10 seconds' / '5 minutes' / '1 hour' → milliseconds."""
    parts = str(s).strip().split()
    if len(parts) != 2:
        raise ValueError(f"bad duration {s!r}")
    n = float(parts[0])
    unit = parts[1].rstrip("s").lower()
    mult = {
        "millisecond": 1, "second": 1000, "minute": 60_000,
        "hour": 3_600_000, "day": 86_400_000,
    }.get(unit)
    if mult is None:
        raise ValueError(f"bad duration unit {s!r}")
    return int(n * mult)
