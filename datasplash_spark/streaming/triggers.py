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

Round 11 extends the emulation beyond fixed-window SUM/COUNT:
:func:`paned_window_agg` takes an arbitrary user ``combine_fn``
(the reference's init/reduce/combine/extract 4-tuple — the
accumulator lives pickled in the state cell), and
:func:`paned_session_agg` composes the same triggers with
``Sessions.withGapDuration`` merging windows (core.clj:2137-2155):
one state cell per key holds the open sessions; merges combine
accumulators via the combiner and continue the pane index from the
largest merged component.

Supported trigger shapes (the ones real pipelines use):

- ``{"after-count": N}`` — ``Repeatedly(AfterPane.elementCountAtLeast
  (N))``: a pane fires whenever a key-window has accumulated ≥ N new
  elements; a final residual pane fires at window close.
- ``"after-watermark"`` — ``AfterWatermark.pastEndOfWindow()``: one
  ON_TIME pane when the watermark passes the window end, optional
  EARLY panes every ``early_count`` elements before it
  (``withEarlyFirings(elementCountAtLeast(early_count))``) — or,
  round 12, ``early=<any trigger spec>`` for the canonical
  ``withEarlyFirings(AfterProcessingTime...)`` idiom and its
  compositions — and one
  LATE pane per micro-batch of late data within
  ``allowed_lateness`` (``withLateFirings(AfterPane.
  elementCountAtLeast(1))``).
- ``{"after-processing-time": "30 seconds"}`` (round 12) —
  ``Repeatedly(AfterProcessingTime.pastFirstElementInPane()
  .plusDelayOf(d))``: the wall-clock deadline starts at the FIRST
  element of the current pane (held in the state cell) and the pane
  fires at the first machine invocation at/after it.
- ``{"after-first": [t, ...]}`` / ``{"after-all": [t, ...]}``
  (round 12) — ``Repeatedly(AfterFirst(...))`` /
  ``Repeatedly(AfterAll(...))`` over ``after-count`` and
  ``after-processing-time`` sub-triggers, arbitrarily nested. Both
  sub-trigger conditions are MONOTONE within a pane (the element
  count only grows until the firing resets it; wall-clock only
  advances), so Beam's per-sub-trigger finished-state is exactly
  "condition currently true" and the composition evaluates as the
  plain boolean combination each micro-batch — ``AfterFirst`` fires
  when any condition holds, ``AfterAll`` when all do, and the
  firing resets every sub-trigger (count to 0, deadline to unset),
  which is ``Repeatedly``'s contract.

Accumulation: ``"accumulating"`` emits the full running aggregate in
every pane; ``"discarding"`` emits only the delta since the previous
pane — both exactly Beam's accumulation-mode contract. Every output
row carries Beam's pane metadata: ``pane_index``, ``pane_timing``
(EARLY / ON_TIME / LATE), ``is_last``.

Late-data delivery (round 11): Spark's stateful operator silently
drops input rows older than the previous micro-batch's watermark,
so the SPARK watermark here lags the logical (Beam) watermark by
``allowed_lateness`` — rows inside the lateness window are always
delivered and classified LATE by the machine, rows beyond it are
dropped upstream, which is exactly Beam's expired-window rule (give
or take one micro-batch of watermark lag). The machines recover the
logical watermark by adding ``late_ms`` back for ON_TIME timing.

What stays approximate: processing-time firings tie to machine
invocations rather than wall-clock timers — the state machine runs
only when the key receives data or its event-time timeout fires
(Structured Streaming offers ONE timeout kind per operator and the
window-close logic needs the event-time one), so an
``after-processing-time`` pane whose deadline elapsed during a
quiet stretch is emitted at the key's next data micro-batch or at
window close, whichever comes first — exactly Beam on a runner
with aligned bundles, plus the idle-key delay. ``AfterWatermark``
without lateness likewise emits its ON_TIME pane when the TIMEOUT
fires, i.e. at the first micro-batch boundary after the watermark
passes.

State-schema versioning: round 12 widened the fixed-window state
rows by one column (``first_pt``, the processing-time trigger
clock), which Spark's state-store compatibility checker treats as
incompatible — a paned query CANNOT resume a checkpoint written by
the pre-round-12 library; restart it with a fresh checkpoint
directory (replaying the source, which the batch-id-idempotent
sinks absorb). Session state is a pickled blob and migrates
transparently.

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
#: fire (for discarding), pane index, fired-on-time flag, total
#: rows, wall-clock ms of the current pane's first element (0 =
#: unset/not tracked — only maintained when the trigger carries an
#: after-processing-time sub-trigger)
_STATE_SCHEMA = (
    "acc long, n_since long, last_emitted long, pane_index int, "
    "fired_on_time boolean, total_rows long, first_pt long"
)


#: combiner-path state: pickled accumulator instead of the long sum
#: (discarding mode RESETS the accumulator after a firing — Beam's
#: general-combiner discarding contract — so no last_emitted cell)
_STATE_SCHEMA_OBJ = (
    "acc binary, n_since long, pane_index int, "
    "fired_on_time boolean, total_rows long, first_pt long"
)


def _compile_trigger_pred(spec):
    """Compile a non-watermark trigger spec into ``(pred,
    needs_pt)``: ``pred(n_since, first_pt_ms, now_ms) -> bool`` says
    whether the current pane should fire, ``needs_pt`` whether the
    machine must track the pane's first-element wall-clock time.
    Composition is sound as plain boolean evaluation because both
    leaf conditions are monotone within a pane (see the module
    docstring)."""
    if isinstance(spec, dict) and len(spec) == 1:
        ((kind, arg),) = spec.items()
        if kind == "after-count":
            n = int(arg)
            if n < 1:
                raise ValueError("after-count must be >= 1")
            return (lambda ns, fpt, now, _n=n: ns >= _n), False
        if kind == "after-processing-time":
            d = _duration_ms(arg)
            return (
                lambda ns, fpt, now, _d=d: fpt > 0 and now >= fpt + _d
            ), True
        if kind in ("after-first", "after-all"):
            subs = [_compile_trigger_pred(s) for s in arg]
            if not subs:
                raise ValueError(f"{kind} needs at least one sub-trigger")
            preds = [p for p, _ in subs]
            comb = any if kind == "after-first" else all
            return (
                lambda ns, fpt, now, _p=preds, _c=comb: _c(
                    p(ns, fpt, now) for p in _p
                )
            ), any(npt for _, npt in subs)
    raise ValueError(f"unknown trigger {spec!r}")


def _parse_trigger(trigger, accumulation):
    """Returns ``(early_pred, needs_pt)``; ``early_pred`` is None
    for the pure ``"after-watermark"`` shape."""
    if accumulation not in ("accumulating", "discarding"):
        raise ValueError(f"unknown accumulation {accumulation!r}")
    if trigger == "after-watermark":
        return None, False
    return _compile_trigger_pred(trigger)


def _parse_early(early, early_count):
    """Early-firing spec for the after-watermark shape: the legacy
    element-count shorthand (``early_count``) or — round 12, since
    Beam's ``withEarlyFirings`` accepts a full trigger — ``early``
    as ANY trigger spec :func:`_compile_trigger_pred` takes.
    Returns ``(pred_or_None, needs_pt)``."""
    if early is not None and early_count is not None:
        raise ValueError("pass early_count OR early, not both")
    if early_count is not None:
        early = {"after-count": int(early_count)}
    if early is None:
        return None, False
    return _compile_trigger_pred(early)


def paned_window_agg(
    df: DataFrame,
    time_col: str,
    key_col: str,
    window_duration: str,
    value_col: str | None = None,
    trigger: "str | dict" = "after-watermark",
    accumulation: str = "accumulating",
    early_count: int | None = None,
    early: "dict | None" = None,
    allowed_lateness: str = "0 seconds",
    watermark_delay: str = "10 seconds",
    combine_fn=None,
    value_type: str = "string",
) -> DataFrame:
    """Windowed aggregate over fixed event-time windows with Beam
    pane semantics. Default: SUM (or COUNT when ``value_col`` is
    None), ``value`` typed long. Pass ``combine_fn`` — anything
    :meth:`..objectmode.CombineFn.of` accepts: a plain fn, an
    init/reduce/combine/extract dict, or a CombineFn — for an
    arbitrary user combiner (the reference's combine-fn 4-tuple,
    core.clj:722-774, composed with triggers as core.clj:2082-2155
    allows); the accumulator lives pickled in the state cell,
    ``value`` is ``extract(acc)`` rendered into ``value_type``
    (default string — pass e.g. ``"double"`` for numeric
    combiners), and DISCARDING mode resets the accumulator after
    each firing (Beam's general-combiner discarding contract; for
    sums that equals the delta the long path emits). Returns a
    streaming DataFrame of pane rows (``PANED_OUTPUT_SCHEMA``); run
    it with ``outputMode("append")`` — panes are emitted exactly
    once, which is precisely Beam's firing model (the pane stream
    IS the output)."""
    import pandas as pd

    early_pred, needs_pt = _parse_trigger(trigger, accumulation)
    early_w, needs_pt_w = _parse_early(early, early_count)
    if early_w is not None and early_pred is not None:
        # Beam's withEarlyFirings hangs off AfterWatermark; a
        # composed/count top-level trigger already IS the firing rule
        # — accepting both and evaluating one would silently drop the
        # user's early spec (review finding, round 12)
        raise ValueError(
            "early/early_count apply to trigger='after-watermark' only"
        )
    needs_pt = needs_pt or needs_pt_w
    if combine_fn is not None:
        return _paned_window_agg_obj(
            df, time_col, key_col, window_duration, value_col,
            early_pred, needs_pt, accumulation, early_w,
            allowed_lateness, watermark_delay, combine_fn, value_type,
        )

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
    # The SPARK watermark lags the logical (Beam) watermark by
    # allowed_lateness: Spark's stateful operator DROPS input rows
    # older than the (previous batch's) watermark, so the Spark
    # watermark must not cross a window until its lateness expires —
    # exactly Beam's expired-window rule. The machine adds late_ms
    # back to recover the logical watermark that drives ON_TIME
    # timing. (With allowed_lateness 0 the two coincide.)
    spark_delay_ms = _duration_ms(watermark_delay) + late_ms
    prepped = (
        df.withWatermark(time_col, f"{spark_delay_ms} milliseconds")
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

        def logical_wm() -> int:
            raw = state.getCurrentWatermarkMs()
            return raw + late_ms if raw > 0 else raw

        if state.exists:
            (
                acc, n_since, last_emitted, pane_index, fired, total,
                first_pt,
            ) = state.get
        else:
            acc, n_since, last_emitted, pane_index, fired, total = (
                0, 0, 0, 0, False, 0
            )
            first_pt = 0
        out = []

        def fire(timing: str, is_last: bool) -> None:
            nonlocal n_since, last_emitted, pane_index, first_pt
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
            first_pt = 0
            pane_index += 1

        if state.hasTimedOut:
            wm = logical_wm()
            if not fired and wm >= wend_ms:
                # the watermark passed the window end: ON_TIME pane
                # for after-watermark; residual final pane for
                # composed/count triggers (is_last only when no
                # lateness keeps the window open for LATE panes)
                if early_pred is None:
                    fire("ON_TIME", is_last=late_ms == 0)
                else:
                    if n_since > 0 or pane_index == 0:
                        fire("ON_TIME", is_last=late_ms == 0)
                fired = True
            if wm >= wend_ms + late_ms:
                state.remove()
                yield pd.DataFrame(out)
                return
            # keep state open for late panes until lateness expires
            # (timeout timestamps live on the SPARK watermark scale:
            # logical target minus late_ms)
            state.update(
                (
                    acc, n_since, last_emitted, pane_index, True,
                    total, first_pt,
                )
            )
            state.setTimeoutTimestamp(
                max(wend_ms, state.getCurrentWatermarkMs() + 1)
            )
            yield pd.DataFrame(out)
            return

        wm0 = logical_wm()
        if not fired and early_pred is None and wm0 >= wend_ms:
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
        if needs_pt and n_since > 0 and first_pt == 0:
            # AfterProcessingTime.pastFirstElementInPane: the
            # deadline clock starts at the pane's first element
            first_pt = _now_ms()
        if fired and n_since > 0:
            fire("LATE", is_last=False)
        elif early_pred is not None:
            # Beam fires once per bundle satisfying the trigger; a
            # micro-batch is the bundle here — one pane per batch
            if n_since > 0 and early_pred(n_since, first_pt, _now_ms()):
                fire("EARLY", is_last=False)
        elif early_w is not None and n_since > 0 and early_w(
            n_since, first_pt, _now_ms()
        ):
            fire("EARLY", is_last=False)
        state.update(
            (acc, n_since, last_emitted, pane_index, fired, total, first_pt)
        )
        raw_wm = state.getCurrentWatermarkMs()
        # logical target wend (pre-fire) / wend+late (post-fire),
        # converted to the Spark watermark scale by subtracting late
        target = wend_ms - late_ms if not fired else wend_ms
        state.setTimeoutTimestamp(max(target, raw_wm + 1))
        yield pd.DataFrame(out)

    return prepped.groupBy("key", "window_start").applyInPandasWithState(
        machine,
        outputStructType=PANED_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _now_ms() -> int:
    """Wall clock in ms for after-processing-time deadlines.
    (Deterministic tests pin the trigger with a 0-delay — fires at
    the first-element batch — or an hours-long delay that never
    fires mid-test; a patched clock would not survive the trip to
    the Python workers.)"""
    import time as _time

    return int(_time.time() * 1000)


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


def _paned_window_agg_obj(
    df, time_col, key_col, window_duration, value_col,
    early_pred, needs_pt, accumulation, early_w, allowed_lateness,
    watermark_delay, combine_fn, value_type,
):
    """Combiner-path twin of the long-sum machine: same trigger /
    pane control flow, accumulator = a pickled user CombineFn
    accumulator in the state cell."""
    import pickle

    import pandas as pd

    from ..objectmode import _EMPTY, _is_empty, CombineFn

    cf = CombineFn.of(combine_fn)
    dur_ms = _duration_ms(window_duration)
    late_ms = _duration_ms(allowed_lateness)
    out_schema = (
        "key string, window_start timestamp, window_end timestamp, "
        "pane_index int, pane_timing string, is_last boolean, "
        f"value {value_type}, pane_rows long"
    )

    val = F.lit(1) if value_col is None else F.col(value_col)
    win_start = F.to_timestamp(
        F.from_unixtime(
            F.floor(F.unix_timestamp(F.col(time_col)) / (dur_ms // 1000))
            * (dur_ms // 1000)
        )
    )
    # Spark watermark lags the logical one by allowed_lateness so
    # late rows inside the lateness window are DELIVERED (see the
    # long-sum machine's comment)
    spark_delay_ms = _duration_ms(watermark_delay) + late_ms
    prepped = (
        df.withWatermark(time_col, f"{spark_delay_ms} milliseconds")
        .select(
            F.col(key_col).cast("string").alias("key"),
            win_start.alias("window_start"),
            F.col(time_col).alias("_ts"),
            val.alias("_v"),
        )
    )

    def load(b):
        return _EMPTY if b is None else pickle.loads(bytes(b))

    def dump(acc):
        return None if _is_empty(acc) else pickle.dumps(acc)

    def machine(key, pdf_iter, state: GroupState):
        k, wstart = key
        wstart_ms = int(pd.Timestamp(wstart).value // 1_000_000)
        wend_ms = wstart_ms + dur_ms

        def logical_wm() -> int:
            raw = state.getCurrentWatermarkMs()
            return raw + late_ms if raw > 0 else raw

        if state.exists:
            accb, n_since, pane_index, fired, total, first_pt = state.get
            acc = load(accb)
        else:
            acc, n_since, pane_index, fired, total = (
                _EMPTY, 0, 0, False, 0
            )
            first_pt = 0
        out = []

        def fire(timing: str, is_last: bool) -> None:
            nonlocal acc, n_since, pane_index, first_pt
            value = None if _is_empty(acc) else cf.extract(acc)
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
            if accumulation == "discarding":
                acc = _EMPTY
            n_since = 0
            first_pt = 0
            pane_index += 1

        if state.hasTimedOut:
            wm = logical_wm()
            if not fired and wm >= wend_ms:
                if early_pred is None:
                    fire("ON_TIME", is_last=late_ms == 0)
                else:
                    if n_since > 0 or pane_index == 0:
                        fire("ON_TIME", is_last=late_ms == 0)
                fired = True
            if wm >= wend_ms + late_ms:
                state.remove()
                yield pd.DataFrame(out)
                return
            state.update(
                (dump(acc), n_since, pane_index, True, total, first_pt)
            )
            state.setTimeoutTimestamp(
                max(wend_ms, state.getCurrentWatermarkMs() + 1)
            )
            yield pd.DataFrame(out)
            return

        wm0 = logical_wm()
        if not fired and early_pred is None and wm0 >= wend_ms:
            fire("ON_TIME", is_last=False)
            fired = True
        n_new = 0
        for pdf in pdf_iter:
            n_new += len(pdf)
            for v in pdf["_v"]:
                acc = cf.reduce(acc, v)
        n_since += n_new
        total += n_new
        if needs_pt and n_since > 0 and first_pt == 0:
            first_pt = _now_ms()
        if fired and n_since > 0:
            fire("LATE", is_last=False)
        elif early_pred is not None:
            if n_since > 0 and early_pred(n_since, first_pt, _now_ms()):
                fire("EARLY", is_last=False)
        elif early_w is not None and n_since > 0 and early_w(
            n_since, first_pt, _now_ms()
        ):
            fire("EARLY", is_last=False)
        state.update(
            (dump(acc), n_since, pane_index, fired, total, first_pt)
        )
        raw_wm = state.getCurrentWatermarkMs()
        target = wend_ms - late_ms if not fired else wend_ms
        state.setTimeoutTimestamp(max(target, raw_wm + 1))
        yield pd.DataFrame(out)

    return prepped.groupBy("key", "window_start").applyInPandasWithState(
        machine,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA_OBJ,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


#: session-path state: the key's OPEN sessions, pickled as a list of
#: (start_ms, end_ms, acc_bytes_or_long, n_since, pane_index) — one
#: cell per key, merged/split in the machine
_STATE_SCHEMA_SESS = "sessions binary"


def paned_session_agg(
    df: DataFrame,
    time_col: str,
    key_col: str,
    gap: str,
    value_col: str | None = None,
    trigger: "str | dict" = "after-watermark",
    accumulation: str = "accumulating",
    early_count: int | None = None,
    early: "dict | None" = None,
    allowed_lateness: str = "0 seconds",
    watermark_delay: str = "10 seconds",
    combine_fn=None,
    value_type: str = "long",
) -> DataFrame:
    """Beam ``Sessions.withGapDuration`` composed with triggers and
    pane metadata (core.clj:2137-2155): per-key gap-merged session
    windows, EARLY panes every ``early_count`` elements (or each
    micro-batch reaching ``{"after-count": N}``), one ON_TIME
    ``is_last`` pane per session when the watermark passes the
    session end (last event + gap). ``accumulation`` and
    ``combine_fn`` behave exactly as :func:`paned_window_agg`
    (default SUM/COUNT with ``value_type="long"``; pass a
    ``CombineFn`` + a matching ``value_type`` for user combiners;
    discarding resets the accumulator at each firing).

    Session merge semantics: an event's proto-window ``[ts,
    ts+gap)`` merges every open session it overlaps — accumulators
    MERGE via the combiner, ``pane_index`` continues from the
    largest merged component, and a merged session is FIRED if any
    component fired (Beam keeps the latest pane info on merge).
    ``allowed_lateness`` (round 11) works as in
    :func:`paned_window_agg`: the Spark watermark lags the logical
    one by the lateness so late rows are DELIVERED; a session stays
    in state for ``allowed_lateness`` past its end, each micro-batch
    of late data fires a LATE pane, and late data may still MERGE
    sessions inside the lateness horizon. With lateness 0 (Beam's
    default) an event whose proto-window expired but OVERLAPS a
    still-open session merges into it (Beam merges before judging
    expiry); one that overlaps nothing drops. Delivery is bounded by
    ``watermark_delay + allowed_lateness`` plus one micro-batch of
    watermark lag — Spark drops older rows before the state machine
    sees them.

    Scale: one state cell per KEY (not per window) holding only the
    key's open sessions — bounded by activity gaps, same shape as
    Beam's merging-window state. Returns pane rows
    (``PANED_OUTPUT_SCHEMA`` with ``value_type``); run with
    ``outputMode("append")``."""
    import pickle

    import pandas as pd

    from ..objectmode import _EMPTY, _is_empty, CombineFn

    early_pred, needs_pt = _parse_trigger(trigger, accumulation)
    early_w, needs_pt_w = _parse_early(early, early_count)
    if early_w is not None and early_pred is not None:
        raise ValueError(
            "early/early_count apply to trigger='after-watermark' only"
        )
    needs_pt = needs_pt or needs_pt_w
    cf = CombineFn.of(combine_fn) if combine_fn is not None else None
    gap_ms = _duration_ms(gap)
    late_ms = _duration_ms(allowed_lateness)
    out_schema = (
        "key string, window_start timestamp, window_end timestamp, "
        "pane_index int, pane_timing string, is_last boolean, "
        f"value {value_type}, pane_rows long"
    )

    val = (
        (F.lit(1).cast("long") if value_col is None
         else F.col(value_col).cast("long"))
        if cf is None
        else (F.lit(1) if value_col is None else F.col(value_col))
    )
    # Spark watermark lags the logical one by allowed_lateness so
    # late rows inside the lateness window are DELIVERED (see the
    # fixed-window machine's comment)
    spark_delay_ms = _duration_ms(watermark_delay) + late_ms
    prepped = (
        df.withWatermark(time_col, f"{spark_delay_ms} milliseconds")
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(time_col).alias("_ts"),
            val.alias("_v"),
        )
    )

    # accumulator ops: longs stay plain (cheap, delta-capable);
    # combiners pickle through the session tuple
    def a_init():
        return 0 if cf is None else _EMPTY

    def a_reduce(acc, v):
        return acc + int(v) if cf is None else cf.reduce(acc, v)

    def a_merge(a, b):
        return a + b if cf is None else cf.merge(a, b)

    def a_value(acc):
        if cf is None:
            return acc
        return None if _is_empty(acc) else cf.extract(acc)

    def machine(key, pdf_iter, state: GroupState):
        (k,) = key
        sessions: list = (
            pickle.loads(bytes(state.get[0])) if state.exists else []
        )
        out = []

        def logical_wm() -> int:
            raw = state.getCurrentWatermarkMs()
            return raw + late_ms if raw > 0 else raw

        def fire(s: dict, timing: str, is_last: bool) -> None:
            out.append(
                {
                    "key": k,
                    "window_start": pd.Timestamp(s["start"], unit="ms"),
                    "window_end": pd.Timestamp(s["end"], unit="ms"),
                    "pane_index": s["pane_index"],
                    "pane_timing": timing,
                    "is_last": is_last,
                    "value": a_value(s["acc"]),
                    "pane_rows": s["n_since"],
                }
            )
            if accumulation == "discarding":
                s["acc"] = a_init()
            s["n_since"] = 0
            s["first_pt"] = 0
            s["pane_index"] += 1

        def close_expired(wm: int) -> None:
            # fire ON_TIME once when the logical watermark passes a
            # session's end; keep the session for allowed_lateness
            # past the end (LATE panes), then evict silently
            nonlocal sessions
            keep = []
            for s in sorted(sessions, key=lambda s: s["start"]):
                expiring = s["end"] + late_ms <= wm
                if not s.get("fired") and s["end"] <= wm:
                    fire(s, "ON_TIME", is_last=late_ms == 0 or expiring)
                    s["fired"] = True
                if not expiring:
                    keep.append(s)
            sessions = keep

        if state.hasTimedOut:
            close_expired(logical_wm())
        else:
            wm0 = logical_wm()
            for pdf in pdf_iter:
                for ts, v in zip(pdf["_ts"], pdf["_v"]):
                    ts_ms = int(pd.Timestamp(ts).value // 1_000_000)
                    lo0, hi0 = ts_ms, ts_ms + gap_ms
                    if hi0 + late_ms <= wm0 and not any(
                        s["start"] < hi0 and lo0 < s["end"]
                        for s in sessions
                    ):
                        # FULLY expired proto-window (past lateness)
                        # that merges into NO held session: dropped
                        # (Beam accepts an old element whose window
                        # merges into a live session — merge happens
                        # before expiry; within lateness a standalone
                        # late session is created below and fires a
                        # LATE pane)
                        continue
                    lo, hi = ts_ms, ts_ms + gap_ms
                    hit = [
                        s for s in sessions
                        if s["start"] < hi and lo < s["end"]
                    ]
                    hit_ids = {id(s) for s in hit}
                    rest = [s for s in sessions if id(s) not in hit_ids]
                    merged = {
                        "start": min([lo] + [s["start"] for s in hit]),
                        "end": max([hi] + [s["end"] for s in hit]),
                        "acc": a_init(),
                        "n_since": sum(s["n_since"] for s in hit),
                        "pane_index": max(
                            [0] + [s["pane_index"] for s in hit]
                        ),
                        # merged pane info: fired if any component
                        # fired (late data joining a closed session
                        # stays in the LATE regime); a session born
                        # entirely behind the watermark (standalone
                        # late element) is LATE from birth — its
                        # ON_TIME point has already passed
                        "fired": any(s.get("fired") for s in hit)
                        or (not hit and hi <= wm0),
                    }
                    # first-element wall-clock of the current pane
                    # (after-processing-time): merge keeps the
                    # earliest component deadline clock; a pane
                    # gaining its first element starts it now
                    fpts = [
                        s.get("first_pt", 0)
                        for s in hit
                        if s.get("first_pt", 0) > 0
                    ]
                    merged["first_pt"] = (
                        min(fpts) if fpts else (_now_ms() if needs_pt else 0)
                    )
                    for s in hit:
                        merged["acc"] = a_merge(merged["acc"], s["acc"])
                    merged["acc"] = a_reduce(merged["acc"], v)
                    merged["n_since"] += 1
                    rest.append(merged)
                    sessions = rest
            now = _now_ms() if needs_pt else 0
            for s in sessions:
                if s.get("fired") and s["n_since"] > 0:
                    # late data on an already-closed session: one
                    # LATE pane per micro-batch (the fixed-window
                    # machine's contract)
                    fire(s, "LATE", is_last=False)
                elif early_pred is not None:
                    if s["n_since"] > 0 and early_pred(
                        s["n_since"], s.get("first_pt", 0), now
                    ):
                        fire(s, "EARLY", is_last=False)
                elif early_w is not None and s["n_since"] > 0 and (
                    early_w(s["n_since"], s.get("first_pt", 0), now)
                ):
                    fire(s, "EARLY", is_last=False)
            # sessions whose end the watermark already passed close
            # in the same batch (data and timeout raced)
            close_expired(wm0)

        if sessions:
            state.update((pickle.dumps(sessions),))
            raw_wm = state.getCurrentWatermarkMs()
            # next logical event per session: ON_TIME at end (spark
            # scale: end - late) for unfired, eviction at end + late
            # (spark scale: end) for fired
            target = min(
                (s["end"] - late_ms) if not s.get("fired") else s["end"]
                for s in sessions
            )
            state.setTimeoutTimestamp(max(target, raw_wm + 1))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out)

    return prepped.groupBy("key").applyInPandasWithState(
        machine,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA_SESS,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


#: substrings Spark's state-store compatibility checker puts in its
#: error (error-class form and the pre-error-class prose form)
_STATE_SCHEMA_ERROR_MARKERS = (
    "STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE",
    "STATE_STORE_KEY_SCHEMA_NOT_COMPATIBLE",
    "does not match existing state schema",
    "doesn't match to the schema for existing state",
)


def explain_streaming_state_error(exc) -> str | None:
    """Recognize Spark's state-store schema-incompatibility failure
    and return the library-level recipe, else ``None`` (ADVICE r12:
    round 12 widened the paned fixed-window state row by one column,
    so a pre-round-12 checkpoint fails with a raw state-store error
    that carries no hint). The failure surfaces ASYNCHRONOUSLY —
    on ``query.awaitTermination()`` / ``query.exception()`` — which
    is why this is a recognizer the caller applies there rather than
    a wrapper around query start:

        try:
            q.awaitTermination()
        except Exception as e:
            hint = explain_streaming_state_error(e)
            if hint: ...
    """
    msg = str(exc)
    if not any(m in msg for m in _STATE_SCHEMA_ERROR_MARKERS):
        return None
    return (
        "streaming state schema incompatibility: the paned-window "
        "state row format changed in round 12 (a first_pt column "
        "for processing-time triggers), so this checkpoint was "
        "written by an older library version and cannot be resumed. "
        "Restart the query with a FRESH checkpoint directory and "
        "replay the source — the batch-id-idempotent sinks "
        "(idempotent_parquet_batch_writer, document_text_ingest, "
        "web_ingest_stream) absorb the replay without duplicates. "
        "See the state-schema note in streaming/triggers.py and "
        "MIGRATION.md."
    )
