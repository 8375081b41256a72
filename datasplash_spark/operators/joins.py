"""Joins: ``join-by`` and ``cogroup-by``.

Reference parity: ``cogroup-by`` /root/reference/src/clj/datasplash/
core.clj:1572-1691, ``join-by`` core.clj:1696-1739. Both are logical
equi-joins on a computed key over one primitive (CoGroupByKey); the
runner picks the physical plan. Semantics pinned from the reference:

- ``:required`` sides drop keys absent on that side (core.clj:1604-1643).
- nil keys do NOT join by default — each nil-keyed element emits its
  own singleton group (greedy-emit-cogbkresult, core.clj:1561-1570)
  unless ``join_nil=True``; ``drop_nil=True`` pre-filters them
  (core.clj:1588-1595).
- ``join-by`` output = per-key cartesian product of the sides, empty
  optional side contributing ``[nil]`` (outer semantics,
  core.clj:1729-1736) — which is exactly Spark's join.

Physical strategy is Catalyst's: required-sides-first join ordering
below keeps inner joins early (maximally filtering), AQE picks
broadcast/SMJ/skew handling at runtime. SQL NULL never equals NULL, so
Spark joins natively implement the reference's no-nil-join default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .elementwise import ColumnLike, _col


@dataclass
class JoinSpec:
    """One ``[pcoll key-fn {:type ... :drop-nil? ...}]`` group spec
    (core.clj:1539-1551)."""

    df: DataFrame
    key: ColumnLike
    required: bool = False
    drop_nil: bool = False
    #: prefix for output column disambiguation; default side{i}
    name: str | None = None


def _prep(spec: JoinSpec, idx: int, key_name: str) -> tuple[DataFrame, str]:
    name = spec.name or f"side{idx}"
    df = spec.df.select(
        _col(spec.key).alias(key_name),
        F.struct("*").alias(f"_{name}"),
    )
    if spec.drop_nil:
        df = df.filter(F.col(key_name).isNotNull())
    return df, name


def join_by(
    specs: list[JoinSpec],
    key_name: str = "key",
    select: list[Column] | None = None,
) -> DataFrame:
    """``join-by`` (core.clj:1696-1739): n-way equi-join; per-key
    cartesian product with null-filled optional sides.

    Join order: all required sides inner-join first (they filter), then
    optional sides attach with left joins. With >=1 required side the
    result keyset is the intersection of required keysets; with none it
    is the union (full outer chain) — matching the reference's
    "empty side contributes [nil]" semantics.

    Each side's columns come back nested as a struct ``_<name>`` (or
    ``side{i}``); pass ``select`` to flatten/merge, or post-process.
    Null join keys never match (SQL semantics == reference default).
    """
    if len(specs) < 2:
        raise ValueError("join_by needs at least two sides")
    prepped = [_prep(s, i, key_name) for i, s in enumerate(specs)]
    order = sorted(
        range(len(specs)), key=lambda i: (not specs[i].required, i)
    )
    # required sides come first in `order`, so once the accumulator is
    # non-required every remaining side is optional too: each step is
    # inner (both required), left (acc required, side optional) or
    # full outer (nothing required anywhere)
    first = order[0]
    acc = prepped[first][0]
    acc_required = specs[first].required
    for i in order[1:]:
        side_df, _ = prepped[i]
        if specs[i].required:
            how = "inner"
        elif acc_required:
            how = "left_outer"
        else:
            how = "full_outer"
        acc = acc.join(side_df, on=key_name, how=how)
    if select is not None:
        acc = acc.select(*select)
    return acc


def _union_all_balanced(dfs: list[DataFrame]) -> DataFrame:
    """n-ary ``unionByName`` as a BALANCED binary tree. A left-deep
    chain (``acc = acc.unionByName(t)`` in a loop) makes Catalyst
    re-analyze the whole accumulated subtree on every append —
    O(n²) driver time that dominates wide cogroups (the 101-way
    reference-parity shape measured ~80 s of plan construction).
    The balanced tree is O(n log n) and the physical plan (one
    flattened Union node) is identical."""
    while len(dfs) > 1:
        paired = [
            dfs[i].unionByName(dfs[i + 1])
            if i + 1 < len(dfs)
            else dfs[i]
            for i in range(0, len(dfs), 2)
        ]
        dfs = paired
    return dfs[0]


def cogroup_by(
    specs: list[JoinSpec],
    key_name: str = "key",
    join_nil: bool = False,
) -> DataFrame:
    """``cogroup-by`` (core.clj:1572-1691): n-way cogroup →
    one row per key with an array column per side.

    Physical shape — ONE shuffle, no joins: each side is tagged into a
    shared wide-struct schema (its own slot populated, the others
    null), all sides are unioned, and a single
    ``groupBy(key).agg(collect_list(slot_i) …)`` assembles the per-side
    vectors (``collect_list`` skips nulls). Beam's CoGroupByKey is the
    same plan: tag → flatten → one GBK. An n-way chain of outer joins
    would instead cost n shuffles and O(n²) planner work (the
    reference's own test does a 101-way cogroup,
    api_test.clj:577-601 — join-chaining dies there).

    ``required`` sides filter groups missing on that side
    (core.clj:1604-1643) — a post-agg ``size(arr) > 0`` filter.

    nil-key semantics: by default each nil-keyed input element emits
    its OWN singleton group with the other sides empty
    (core.clj:1561-1570); ``drop_nil`` pre-filters; ``join_nil=True``
    groups nil as a normal key.
    """
    n = len(specs)
    names = [s.name or f"side{i}" for i, s in enumerate(specs)]
    keyeds: list[DataFrame] = []
    for spec in specs:
        keyeds.append(
            spec.df.select(
                _col(spec.key).alias(key_name), F.struct("*").alias("_elem")
            )
        )
    elem_types = [k.schema["_elem"].dataType for k in keyeds]

    # Two physical encodings of the tagged union, both one shuffle:
    # - n <= 8: one struct slot column per side (native types, zero
    #   serde). O(n²) slot columns overall — fine for small n.
    # - n > 8: (key, side_idx, to_json(elem)) — a 3-column union that
    #   keeps the plan and codegen O(n); elements are re-typed with
    #   from_json after the aggregate. The reference's own 101-way
    #   cogroup test (api_test.clj:577-601) needs this path.
    wide = n > 8

    prepped: list[DataFrame] = []
    nil_singletons: dict[int, DataFrame] = {}
    for i, (spec, keyed) in enumerate(zip(specs, keyeds)):
        if spec.drop_nil:
            keyed = keyed.filter(F.col(key_name).isNotNull())
        elif not join_nil:
            nil_singletons[i] = keyed.filter(F.col(key_name).isNull())
            keyed = keyed.filter(F.col(key_name).isNotNull())
        if wide:
            prepped.append(
                keyed.select(
                    F.col(key_name),
                    F.lit(i).alias("_side"),
                    F.to_json("_elem").alias("_j"),
                )
            )
        else:
            slots = [
                (
                    F.col("_elem") if j == i else F.lit(None).cast(elem_types[j])
                ).alias(f"_s{j}")
                for j in range(n)
            ]
            prepped.append(keyed.select(F.col(key_name), *slots))

    unioned = _union_all_balanced(prepped)

    if wide:
        raw = unioned.groupBy(key_name).agg(
            *[
                F.collect_list(
                    F.when(F.col("_side") == i, F.col("_j"))
                ).alias(f"_raw{i}")
                for i in range(n)
            ]
        )

        def _parser(j: int):
            return lambda x: F.from_json(x, elem_types[j])

        acc = raw.select(
            key_name,
            *[
                F.transform(F.col(f"_raw{i}"), _parser(i)).alias(f"_{names[i]}")
                for i in range(n)
            ],
        )
    else:
        acc = unioned.groupBy(key_name).agg(
            *[F.collect_list(f"_s{i}").alias(f"_{names[i]}") for i in range(n)]
        )
    for i, spec in enumerate(specs):
        if spec.required:
            acc = acc.filter(F.size(F.col(f"_{names[i]}")) > 0)

    # nil-keyed singleton groups (dropped if any OTHER side is required,
    # because that side is necessarily empty in the singleton group).
    # Round-10 driver-cost fix: the old shape built one n-column frame
    # PER side (n² Column objects through py4j — ~50 s of the 101-way
    # reference-parity cogroup's ~80 s plan construction) and appended
    # each to the deep `acc` plan one at a time (O(n²) re-analysis).
    # Wide path now: tag the nil rows into ONE 3-column balanced
    # union and expand to the output schema with a single n-column
    # select; narrow path (n ≤ 8): the per-side loop is fine, merged
    # as a balanced union.
    allowed = [
        i
        for i in nil_singletons
        if not any(s.required for j, s in enumerate(specs) if j != i)
    ]
    if allowed and wide:
        nil_tagged = _union_all_balanced(
            [
                nil_singletons[i].select(
                    F.col(key_name),
                    F.lit(i).alias("_side"),
                    F.to_json("_elem").alias("_j"),
                )
                for i in allowed
            ]
        )
        acc = acc.unionByName(
            nil_tagged.select(
                F.col(key_name),
                *[
                    F.when(
                        F.col("_side") == j,
                        F.array(F.from_json(F.col("_j"), elem_types[j])),
                    )
                    .otherwise(
                        F.array().cast(
                            f"array<{elem_types[j].simpleString()}>"
                        )
                    )
                    .alias(f"_{names[j]}")
                    for j in range(n)
                ],
            )
        )
    elif allowed:
        nil_rows = [
            nil_singletons[i].select(
                F.col(key_name),
                *[
                    (
                        F.array(F.col("_elem"))
                        if j == i
                        else F.array().cast(
                            f"array<{elem_types[j].simpleString()}>"
                        )
                    ).alias(f"_{names[j]}")
                    for j in range(n)
                ],
            )
            for i in allowed
        ]
        acc = acc.unionByName(_union_all_balanced(nil_rows))
    return acc


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: ColumnLike | list[ColumnLike],
    left_on: ColumnLike = "ts",
    right_on: ColumnLike = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the LATEST right row of
    the same key with ``right_on <= left_on`` (``direction=
    "backward"``, the default) the EARLIEST right row with
    ``right_on >= left_on`` (``"forward"``), or whichever of the two
    is closer in time (``"nearest"``; ties → backward, as in pandas
    ``merge_asof``). Left outer — unmatched
    left rows keep nulls. Beyond the reference's surface
    (SURVEY §2.9: no time-ordered ops at all); the standard
    time-series primitive (pandas ``merge_asof``, DuckDB ``ASOF
    JOIN`` — which the oracle uses).

    Scale shape — union-tag + ordered window, NOT a range join:
    both sides shuffle ONCE on the equi-key, rows sort per key by
    (time, side) with right rows ordered before coincident left rows
    (inclusive-boundary semantics), and ``last(non-null)`` over an
    unbounded-preceding frame propagates each right payload to the
    left rows it covers. No candidate-pair blowup, no inequality-join
    BNL — cost is one shuffle + per-key sort, same as any keyed
    window. Hot keys behave like any window hot key (time-split the
    key if one key dominates).

    Ties inside a side break by the side's ordering only via the time
    value itself; coincident right rows are disambiguated by their
    position in ``last()`` (the latest in (time, input) order wins) —
    pass a composite ``right_on`` (e.g. struct(ts, id)) where strict
    determinism under duplicate timestamps is required.
    """
    keys = [on] if not isinstance(on, list) else on
    key_cols = [_col(k) for k in keys]
    key_names = [k if isinstance(k, str) else f"_k{i}" for i, k in enumerate(keys)]

    rsel = right_cols if right_cols is not None else right.columns
    l_tagged = left.select(
        *[c.alias(n) for c, n in zip(key_cols, key_names)],
        _col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct("*").alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*rsel).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *[c.alias(n) for c, n in zip(key_cols, key_names)],
        _col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct("*").alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rsel).alias("_r"),
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    # forward = the same propagation over reversed time; right rows
    # still order before coincident left rows (inclusive boundary);
    # nearest = both passes over ONE unioned frame, pick by distance
    # (ties -> backward, matching pandas merge_asof)
    unioned = l_tagged.unionByName(r_tagged)
    part = Window.partitionBy(*[F.col(n) for n in key_names])
    w_back = part.orderBy(F.col("_t").asc(), F.col("_side").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_fwd = part.orderBy(F.col("_t").desc(), F.col("_side").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # carry the right time inside the match so `nearest` can compare
    rt = F.when(F.col("_side") == 0, F.col("_t"))
    wrapped = F.when(
        F.col("_side") == 0, F.struct(rt.alias("_rt"), F.col("_r").alias("_p"))
    )
    if direction == "backward":
        matched = unioned.withColumn(
            "_match", F.last("_r", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        matched = unioned.withColumn(
            "_match", F.last("_r", ignorenulls=True).over(w_fwd)
        )
    else:
        both = unioned.withColumn(
            "_mb", F.last(wrapped, ignorenulls=True).over(w_back)
        ).withColumn("_mf", F.last(wrapped, ignorenulls=True).over(w_fwd))
        d_back = F.col("_t") - F.col("_mb._rt")
        d_fwd = F.col("_mf._rt") - F.col("_t")
        matched = both.withColumn(
            "_match",
            F.when(F.col("_mb").isNull(), F.col("_mf._p"))
            .when(F.col("_mf").isNull(), F.col("_mb._p"))
            .when(d_fwd < d_back, F.col("_mf._p"))
            .otherwise(F.col("_mb._p")),
        )
    matched = matched.filter(F.col("_side") == 1)
    out = matched.select(
        "_l.*",
        *[
            F.col(f"_match.{c}").alias(c + suffix if c in left.columns else c)
            for c in rsel
        ],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: ColumnLike | list[ColumnLike],
    point_col: ColumnLike = "ts",
    lo_col: ColumnLike = "lo",
    hi_col: ColumnLike = "hi",
    bucket_width: float = 600.0,
    point_name: str = "p",
    interval_name: str = "i",
) -> DataFrame:
    """Range (interval) join: pairs of (point row, interval row) with
    the same key and ``lo <= point <= hi``. Beyond the reference's
    surface; the scale-safe alternative to writing the inequality
    predicate directly (which Catalyst can only execute as a
    broadcast-nested-loop join — quadratic).

    Scale shape — bucketed equi-join + refine: time maps to
    fixed-width buckets (``bucket_width`` in the column's numeric
    units; seconds for timestamps). Points land in one bucket;
    intervals explode to the buckets they overlap (bounded by
    interval_length/bucket_width + 1 — pick the width near the TYPICAL
    interval length). The join is then a plain equi-join on
    (key, bucket) — hash-partitioned, AQE/skew-eligible — and the
    exact ``lo <= p <= hi`` predicate refines pairs after the match.
    Each qualifying pair meets in exactly one bucket (the point's), so
    no dedup pass is needed.

    Output: two struct columns ``point_name``/``interval_name``
    carrying the full source rows.
    """
    keys = [on] if not isinstance(on, list) else on
    key_names = [k if isinstance(k, str) else f"_k{i}" for i, k in enumerate(keys)]
    key_cols = [_col(k) for k in keys]

    def _num(c: Column) -> Column:
        return c.cast("double")

    p = points.select(
        *[c.alias(n) for c, n in zip(key_cols, key_names)],
        _col(point_col).alias("_p"),
        F.floor(_num(_col(point_col)) / bucket_width).alias("_bucket"),
        F.struct("*").alias(point_name),
    )
    i = intervals.select(
        *[c.alias(n) for c, n in zip(key_cols, key_names)],
        _col(lo_col).alias("_lo"),
        _col(hi_col).alias("_hi"),
        F.explode(
            F.sequence(
                F.floor(_num(_col(lo_col)) / bucket_width),
                F.floor(_num(_col(hi_col)) / bucket_width),
            )
        ).alias("_bucket"),
        F.struct("*").alias(interval_name),
    )
    return (
        p.join(i, on=key_names + ["_bucket"])
        .filter((F.col("_lo") <= F.col("_p")) & (F.col("_p") <= F.col("_hi")))
        .select(point_name, interval_name)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe equi-join: salt the BIG side's key with a
    deterministic hash-derived bucket and replicate the SMALL side
    across all ``salt_buckets``, so one hot key spreads over
    ``salt_buckets`` tasks instead of stalling a single reducer.

    This is the manual fallback for when AQE's skew-join split (on by
    default in `make_session`) can't help — e.g. the skew is in a
    broadcast-ineligible mid-sized dimension, or the join feeds a
    co-partitioned downstream op that AQE won't re-split. Cost: the
    small side shuffles ``salt_buckets``× — keep it for genuinely
    small-but-not-broadcastable sides.

    Only inner/left joins make sense here (the salted small side
    would multiply unmatched right rows); ``how`` is validated.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salt = F.pmod(
        F.hash(F.lit(seed), F.monotonically_increasing_id()), F.lit(salt_buckets)
    )
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = b.join(s, on=keys + ["_salt"], how=how)
    return out.drop("_salt")


def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: ColumnLike,
    parent_key: ColumnLike | None = None,
) -> DataFrame:
    """Referential-integrity audit — the join pre-flight: how many
    child rows reference a parent key that does not exist (orphans),
    how many have a NULL key, how many match. One summary row:
    ``(n_child, n_null_key, n_orphan, n_matched)``.

    Scale shape: the child reduces to a (key, count) table FIRST
    (one partial-agg shuffle on the key — child rows never move),
    the parent reduces to its distinct keys, and the verdict is one
    left join over two key-cardinality tables + integer sums. At
    100 TB both sides of the final join are vocab-sized, and AQE
    broadcasts the smaller one.

    Reference anchor: no analog; data-quality extension surface
    (BASELINE.json north_star)."""
    ck = _col(child_key)
    pk = _col(parent_key if parent_key is not None else child_key)
    counts = (
        child.select(ck.alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pkeys = parent.select(pk.alias("_k")).distinct().withColumn(
        "_hit", F.lit(1)
    )
    joined = counts.join(pkeys, "_k", "left")
    zero = F.lit(0).cast("long")
    return joined.agg(
        F.coalesce(F.sum("_n"), zero).cast("long").alias("n_child"),
        F.coalesce(
            F.sum(F.when(F.col("_k").isNull(), F.col("_n"))), zero
        )
        .cast("long")
        .alias("n_null_key"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_k").isNotNull() & F.col("_hit").isNull(),
                    F.col("_n"),
                )
            ),
            zero,
        )
        .cast("long")
        .alias("n_orphan"),
        F.coalesce(
            F.sum(F.when(F.col("_hit").isNotNull(), F.col("_n"))), zero
        )
        .cast("long")
        .alias("n_matched"),
    )
