"""Grouping, aggregation, combine.

Reference parity (all /root/reference/src/clj/datasplash/core.clj):
``group-by-key`` 926-935, ``group-by`` 990-1020, ``combine`` 1882-1913,
``combine-by`` 1915-1946, ``combine-fn`` 722-774, ``juxt`` 864-897,
``count-fn`` 1982-1990, ``sum-fn`` 1992-2002, ``mean-fn`` 2004-2017,
``max-fn``/``min-fn`` 2019-2050, ``frequencies-fn`` 2052-2063,
``frequencies`` 2065-2080, ``distinct`` 1741-1756, ``distinct-by``
1948-1980, ``sample`` 1761-1782.

Semantics pinned from the reference code (not its test comments —
SURVEY.md §7.4): a combiner's ``:mapper`` applies only to elements
passing ``:predicate``; failing elements are excluded entirely
(core.clj:1987, 1997-1999). ``count-fn``'s default mapper is
``(constantly 1)``; the others default to identity (core.clj:1983-1995).
``mean-fn`` returns 0 on empty input (core.clj:2012).

Scale notes: every aggregate here compiles to Catalyst
``HashAggregateExec`` with automatic partial (map-side) aggregation —
the reference's combiner-lifting (ClojureCombineFn.java:32-38) and
``:fanout`` hot-key fan-out come for free for algebraic aggs. For
holistic aggs on skewed keys use :func:`salted_agg`.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .elementwise import ColumnLike, _col


# ---------------------------------------------------------------- group-by

def group_by_key(
    df: DataFrame, key: ColumnLike = "key", value: ColumnLike = "value"
) -> DataFrame:
    """``group-by-key`` (core.clj:926-935): KV pcoll → KV<K, vec<V>>.

    One shuffle on the key; collect_list is a holistic agg so there is
    no map-side combine — by design, same as Beam's GroupByKey.
    """
    kc, vc = _col(key), _col(value)
    return df.groupBy(kc.alias("key")).agg(F.collect_list(vc).alias("values"))


def dgroup_by(df: DataFrame, key_expr: ColumnLike, key_name: str = "key") -> DataFrame:
    """``group-by`` (core.clj:990-1020): with-keys f + group-by-key —
    groups whole elements (struct of all columns) by a computed key."""
    return (
        df.groupBy(_col(key_expr).alias(key_name))
        .agg(F.collect_list(F.struct("*")).alias("values"))
    )


# ---------------------------------------------------------------- combiners
#
# Each *-fn returns a Column aggregate, composable into one-pass
# df.agg(...) — the reference's `juxt` sibling-fusion (core.clj:864-897)
# is then just "pass several of these to agg()".

def _masked(expr: ColumnLike, predicate: ColumnLike | None) -> Column:
    c = _col(expr)
    if predicate is None:
        return c
    return F.when(_col(predicate), c)  # failing rows → NULL → ignored by aggs


def count_fn(
    predicate: ColumnLike | None = None, mapper: ColumnLike | None = None
) -> Column:
    """``count-fn`` (core.clj:1982-1990). Default mapper = 1 (weight);
    with a mapper it is a weighted count (i.e. a sum of weights)."""
    expr = _col(mapper) if mapper is not None else F.lit(1)
    return F.coalesce(F.sum(_masked(expr, predicate)), F.lit(0))


def sum_fn(expr: ColumnLike, predicate: ColumnLike | None = None) -> Column:
    """``sum-fn`` (core.clj:1992-2002); ``expr`` plays the :mapper
    role. Empty/all-excluded input → 0, matching the reference's
    ``(sum-fn)`` init ``(constantly 0)`` — consistent with count_fn
    and mean_fn."""
    return F.coalesce(F.sum(_masked(expr, predicate)), F.lit(0))


def mean_fn(expr: ColumnLike, predicate: ColumnLike | None = None) -> Column:
    """``mean-fn`` (core.clj:2004-2017): mean; empty input → 0."""
    return F.coalesce(F.avg(_masked(expr, predicate)), F.lit(0.0))


def max_fn(expr: ColumnLike, predicate: ColumnLike | None = None) -> Column:
    """``max-fn`` (core.clj:2019-2034), nil-safe (nulls ignored)."""
    return F.max(_masked(expr, predicate))


def min_fn(expr: ColumnLike, predicate: ColumnLike | None = None) -> Column:
    """``min-fn`` (core.clj:2036-2050), nil-safe."""
    return F.min(_masked(expr, predicate))


def frequencies(df: DataFrame, expr: ColumnLike, alias: str = "value") -> DataFrame:
    """``frequencies`` (core.clj:2065-2080, Beam Count.perElement):
    global element→count. Partial-aggregated count, one shuffle."""
    return df.groupBy(_col(expr).alias(alias)).agg(F.count(F.lit(1)).alias("count"))


def frequencies_by(
    df: DataFrame, key_expr: ColumnLike, value_expr: ColumnLike
) -> DataFrame:
    """``frequencies-fn`` as a per-key combiner (core.clj:2052-2063):
    per group, a value→count map.

    Two-level aggregation — groupBy(key, value).count() first (fully
    partial-aggregatable, skew-tolerant), then assemble the map. This
    beats collecting raw values per key at scale.
    """
    k, v = _col(key_expr), _col(value_expr)
    counted = df.groupBy(k.alias("key"), v.alias("_v")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return counted.groupBy("key").agg(
        F.map_from_entries(F.collect_list(F.struct("_v", "_n"))).alias("freqs")
    )


def combine(df: DataFrame, *aggs: Column) -> DataFrame:
    """``combine`` with ``:scope :global`` (core.clj:1882-1913) →
    singleton result. Multiple aggs fuse into one pass (``juxt``,
    core.clj:864-897, is free in Catalyst)."""
    return df.agg(*aggs)


def combine_per_key(
    df: DataFrame, *aggs: Column, key: ColumnLike = "key"
) -> DataFrame:
    """``combine`` with ``:scope :per-key`` (core.clj:1898-1904)."""
    return df.groupBy(_col(key)).agg(*aggs)


def combine_by(
    df: DataFrame, key_expr: ColumnLike, *aggs: Column, key_name: str = "key"
) -> DataFrame:
    """``combine-by`` (core.clj:1915-1946): with-keys + combine per key."""
    return df.groupBy(_col(key_expr).alias(key_name)).agg(*aggs)


def juxt(*aggs: Column) -> list[Column]:
    """``juxt`` (core.clj:864-897): fuse N combiners into one pass.
    In Catalyst N aggregates in one ``agg()`` are already one pass;
    kept as API sugar for parity."""
    return list(aggs)


# ---------------------------------------------------------------- distinct

def distinct(df: DataFrame) -> DataFrame:
    """``distinct`` (core.clj:1741-1756)."""
    return df.distinct()


def distinct_by(df: DataFrame, repr_expr: ColumnLike) -> DataFrame:
    """``distinct-by`` (core.clj:1948-1980): dedup by representative
    f(e), keeping an arbitrary witness element (order not guaranteed,
    same as the reference's first-non-nil accumulator)."""
    cols = df.columns
    return (
        df.groupBy(_col(repr_expr).alias("_repr"))
        .agg(*[F.any_value(c).alias(c) for c in cols])
        .drop("_repr")
    )


# ---------------------------------------------------------------- sample

def sample(
    df: DataFrame,
    n: int,
    scope: str = "any",
    key: ColumnLike | None = None,
    seed: int = 42,
    deterministic_by: ColumnLike | None = None,
) -> DataFrame:
    """``sample`` (core.clj:1761-1782).

    - ``any``: cheap first-N (Beam ``Sample.any``) → ``limit`` —
      nondeterministic by design.
    - ``global``: fixed-size uniform. ``orderBy(rand).limit(n)``
      compiles to TakeOrderedAndProject: per-partition top-n heap +
      driver merge — no full sort, safe at 100 TB for sane n.
    - ``per-key``: fixed-size uniform per key via row_number over a
      rand-ordered window.

    ``deterministic_by=<unique id column>`` replaces ``rand(seed)``
    with ``md5(seed || id)`` ordering: still uniform-ish (md5 is an
    avalanche hash) but REPRODUCIBLE across engines, runs, and
    partitionings — the right default for training-data pipelines
    where a re-run must pick the same subset, and it makes the sample
    oracle-checkable. Same physical shape (top-n heap / window).
    """
    if deterministic_by is not None:
        order = F.md5(F.concat(F.lit(str(seed)), _col(deterministic_by).cast("string")))
    else:
        order = F.rand(seed)
    if scope == "any":
        return df.limit(n)
    if scope == "global":
        return df.orderBy(order).limit(n)
    if scope == "per-key":
        if key is None:
            raise ValueError("per-key sample requires key=")
        from pyspark.sql import Window

        w = Window.partitionBy(_col(key)).orderBy(order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
        )
    raise ValueError(f"unknown sample scope: {scope}")


# ---------------------------------------------------------------- skew

def salted_agg(
    df: DataFrame,
    key_expr: ColumnLike,
    partial_aggs: Sequence[tuple[Column, Callable[[str], Column]]],
    salt_buckets: int = 16,
    key_name: str = "key",
) -> DataFrame:
    """``:fanout`` hot-key fan-out (core.clj:1866-1868) for *holistic*
    aggregates (collect_list/set-style), where Spark has no map-side
    combine: two-level salt-and-merge.

    ``partial_aggs`` is a list of ``(partial_agg_col, merge_fn)`` where
    ``merge_fn(partial_col_name)`` builds the second-level aggregate.
    Algebraic aggs don't need this — HashAggregateExec partials absorb
    skew already.

    Example (collect_list)::

        salted_agg(df, "k",
                   [(F.collect_list("v").alias("p0"),
                     lambda c: F.flatten(F.collect_list(F.col(c))).alias("values"))])
    """
    salted = df.withColumn("_salt", (F.rand(7) * salt_buckets).cast("int"))
    level1 = salted.groupBy(
        _col(key_expr).alias(key_name), F.col("_salt")
    ).agg(*[p for p, _ in partial_aggs])
    # level-1 output columns beyond key+salt, in order
    pcols = [c for c in level1.columns if c not in (key_name, "_salt")]
    merged = level1.groupBy(key_name).agg(
        *[merge(c) for (_, merge), c in zip(partial_aggs, pcols)]
    )
    return merged


def approx_distinct_fn(
    expr: ColumnLike, rsd: float = 0.05, predicate: ColumnLike | None = None
) -> Column:
    """HyperLogLog++ distinct-count combiner. Absent from the
    reference (SURVEY §2.9 — no approximate aggregates exist there);
    surfaced because at 100 TB `countDistinct` shuffles every distinct
    value while the HLL sketch is a few KB per group and merges
    map-side like any algebraic combiner. Follows the reference's
    mapper/predicate contract (predicate filters, then expr maps)."""
    return F.approx_count_distinct(_masked(expr, predicate), rsd)


def approx_quantile_fn(
    expr: ColumnLike,
    probabilities: Sequence[float] = (0.5,),
    accuracy: int = 10000,
    predicate: ColumnLike | None = None,
) -> Column:
    """Greenwald–Khanna approximate quantiles as a combiner: a
    mergeable sketch, so it partial-aggregates before the shuffle —
    the scale path for percentiles (exact percentile is holistic and
    moves every value)."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return F.percentile_approx(_masked(expr, predicate), probs, F.lit(accuracy))


def top_k(
    df: DataFrame,
    n: int,
    order_by: ColumnLike | Sequence[ColumnLike],
    key: ColumnLike | None = None,
    key_name: str = "key",
) -> DataFrame:
    """Top-k rows, global or per-key. The reference has no ordering
    operator at all (SURVEY §2.9); in Spark a global top-k is
    TakeOrderedAndProject (per-partition heaps, no full sort) and the
    per-key form is a rank-over-window with partial pushdown — both
    survive 100 TB where a full `orderBy` would not.

    ``order_by`` columns should carry ``.desc()`` where wanted."""
    cols = (
        [_col(order_by)]
        if not isinstance(order_by, (list, tuple))
        else [_col(c) for c in order_by]
    )
    if key is None:
        return df.orderBy(*cols).limit(n)
    w = Window.partitionBy(_col(key).alias(key_name)).orderBy(*cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def percentile_fn(
    expr: ColumnLike,
    probabilities: Sequence[float] = (0.5,),
    predicate: ColumnLike | None = None,
) -> Column:
    """Exact percentile combiner (linear interpolation — matches
    DuckDB ``quantile_cont``, so it IS oracle-checkable, unlike the
    sketch). Holistic: every group value moves through the shuffle —
    at 100 TB prefer :func:`approx_quantile_fn` unless exactness is a
    requirement."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return F.percentile(_masked(expr, predicate), probs)


def stratified_sample(
    df: DataFrame,
    key: ColumnLike,
    fractions: dict,
    seed: int = 42,
    deterministic_by: ColumnLike | None = None,
) -> DataFrame:
    """Stratified sampling — per-stratum fractions (the training-mix
    reweighting op: e.g. keep 10% of crawl, 100% of curated).

    Default: Spark's native ``sampleBy`` (per-row Bernoulli, one
    scan, no shuffle — the 100 TB default when exact per-stratum
    counts don't matter). With ``deterministic_by=<unique id col>``:
    EXACT ``ceil(fraction · stratum_count)`` rows per stratum, chosen
    by md5(seed‖id) order — reproducible across runs/engines and
    oracle-checkable; costs one shuffle on the stratum key (two
    window functions: hash rank + stratum count).

    Strata absent from ``fractions`` are dropped (sampleBy parity).
    """
    k = _col(key)
    if deterministic_by is None:
        return df.sampleBy(k, fractions, seed)
    from pyspark.sql import Window

    order = F.md5(
        F.concat(F.lit(str(seed)), _col(deterministic_by).cast("string"))
    )
    w = Window.partitionBy(k)
    frac = None
    for kv, fv in fractions.items():
        cond = k == F.lit(kv)
        frac = F.when(cond, F.lit(float(fv))) if frac is None else frac.when(
            cond, F.lit(float(fv))
        )
    out = (
        df.withColumn("_frac", frac)
        .filter(F.col("_frac").isNotNull())
        .withColumn("_rk", F.row_number().over(w.orderBy(order)))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * F.col("_frac")))
        .drop("_frac", "_rk", "_n")
    )
    return out


def token_budget_sample(
    df: DataFrame,
    key: ColumnLike,
    budgets: dict,
    weight: ColumnLike,
    seed: int = 42,
    deterministic_by: ColumnLike = "doc_id",
) -> DataFrame:
    """Corpus mixing under per-stratum WEIGHT budgets (typically token
    counts): admit rows per stratum in md5(seed‖id) order while the
    stratum's running weight total stays within its budget. This is
    the mixing primitive a training-data pipeline actually wants —
    "700M tokens of crawl, 400M of code" — where
    :func:`stratified_sample` only speaks row fractions.

    Deterministic and exact: re-runs, repartitions, and engines pick
    the same subset (the hash order is data-derived, not RNG-derived),
    so mixes are reproducible and oracle-checkable. Strata absent
    from ``budgets`` are dropped; the first row whose cumulative
    total would exceed the budget is excluded (strict
    prefix-under-budget). Cost: one shuffle on the stratum key (a
    window cumsum in hash order) — no collect, no second pass.
    """
    from pyspark.sql import Window

    k = _col(key)
    order = F.md5(
        F.concat(F.lit(str(seed)), _col(deterministic_by).cast("string"))
    )
    budget = None
    for kv, bv in budgets.items():
        cond = k == F.lit(kv)
        budget = (
            F.when(cond, F.lit(int(bv)))
            if budget is None
            else budget.when(cond, F.lit(int(bv)))
        )
    w = (
        Window.partitionBy(k)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_budget", budget)
        .filter(F.col("_budget").isNotNull())
        .withColumn("_cum", F.sum(_col(weight).cast("long")).over(w))
        .filter(F.col("_cum") <= F.col("_budget"))
        .drop("_budget", "_cum")
    )


def temperature_mix(
    df: DataFrame,
    key: ColumnLike,
    weight: ColumnLike,
    total_budget: int,
    alpha: float = 0.5,
    seed: int = 42,
    deterministic_by: ColumnLike = "doc_id",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-T5 / XLM-R
    recipe): stratum ``i`` receives a share of ``total_budget``
    proportional to ``n_i^alpha`` where ``n_i`` is its total
    ``weight`` (typically tokens). ``alpha=1`` reproduces natural
    proportions, ``alpha=0`` gives uniform shares, and the usual
    ``0.2–0.7`` range up-samples low-resource strata — the standard
    fix for head-heavy corpora where natural sampling starves the
    tail. Unlike :func:`token_budget_sample`, the per-stratum budgets
    are DERIVED from the corpus itself, not supplied.

    Rows with a NULL stratum key are excluded (from the normalizer
    AND the output — a NULL stratum cannot be budgeted).

    Two passes by necessity (the shares are global statistics):
    pass 1 is one partial-agg shuffle to stratum totals (rows =
    #strata) plus a single-row normalizer, joined back as lazy
    broadcasts — no collect; pass 2 admits rows per stratum in
    md5(seed‖id) order under the derived budget (one window cumsum
    per stratum — same shape as ``token_budget_sample``).
    Deterministic and engine-exact: the share is rounded to 9
    decimals before the floor so a 1-ulp ``pow`` difference between
    engines cannot flip a budget.
    """
    from pyspark.sql import Window

    if not 0.0 <= float(alpha) <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    k, wgt = _col(key), _col(weight).cast("long")
    # NULL-key rows are excluded from BOTH the normalizer and the
    # admission join — otherwise their weight would shrink every real
    # stratum's budget while the equality join silently dropped them
    df = df.filter(k.isNotNull())
    totals = df.groupBy(k.alias("_k")).agg(F.sum(wgt).alias("_n"))
    norm = totals.agg(
        F.sum(F.pow(F.col("_n").cast("double"), float(alpha))).alias("_s")
    )
    budgets = totals.crossJoin(F.broadcast(norm)).select(
        "_k",
        F.floor(
            F.lit(int(total_budget))
            * F.round(
                F.pow(F.col("_n").cast("double"), float(alpha))
                / F.col("_s"),
                9,
            )
        ).alias("_budget"),
    )
    order = F.md5(
        F.concat(F.lit(str(seed)), _col(deterministic_by).cast("string"))
    )
    win = (
        Window.partitionBy(k)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a stratum whose derived budget floors to 0 admits NOTHING —
    # without the budget>0 guard its zero-weight rows would slip
    # through (their cumsum never exceeds 0)
    return (
        df.join(F.broadcast(budgets), on=k == F.col("_k"))
        .withColumn("_cum", F.sum(wgt).over(win))
        .filter((F.col("_cum") <= F.col("_budget")) & (F.col("_budget") > 0))
        .drop("_k", "_budget", "_cum")
    )


def pivot_table(
    df: DataFrame,
    key: ColumnLike,
    pivot_col: str,
    agg: Column,
    values: Sequence | None = None,
    key_name: str = "key",
) -> DataFrame:
    """Pivot (long → wide): one row per ``key``, one column per
    distinct ``pivot_col`` value, cells = ``agg``. Beyond the
    reference's surface (no reshaping ops at all).

    Scale note: ALWAYS pass ``values`` at scale — without it Spark
    runs an extra distinct-collect job over the pivot column to
    discover the columns (fine ad hoc, a full extra scan at 100 TB).
    The aggregation itself partial-aggregates like any groupBy.
    """
    g = df.groupBy(_col(key).alias(key_name))
    p = g.pivot(pivot_col, list(values)) if values is not None else g.pivot(pivot_col)
    return p.agg(agg)


def rollup_agg(
    df: DataFrame,
    keys: Sequence[ColumnLike],
    *aggs: Column,
    cube: bool = False,
    grouping_id_name: str = "gid",
) -> DataFrame:
    """ROLLUP (hierarchical subtotals + grand total) or CUBE (all key
    subsets) aggregation, with ``grouping_id`` exposed so consumers
    can tell a real NULL key from a subtotal row. Beyond the
    reference's surface (SURVEY §2.9: no grouping sets).

    One pass: Spark expands grouping sets inside the aggregate —
    partial aggregation still applies per set; cost scales with the
    number of sets (rollup: n+1, cube: 2^n — keep n small at scale).
    """
    cols = [_col(k) for k in keys]
    g = df.cube(*cols) if cube else df.rollup(*cols)
    return g.agg(F.grouping_id().alias(grouping_id_name), *aggs)


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One-pass data profile: per column — row count, non-null count,
    exact distinct count, min/max (as strings for a uniform schema).
    The ingest-validation op a pipeline runs on every new batch.

    Single aggregation job: all metrics for all columns compute in
    one scan; the multi-column exact ``count(DISTINCT ...)`` uses
    Spark's EXPAND strategy (one shuffle, data duplicated per
    distinct-column — switch heavy audits to
    ``approx_count_distinct`` via ``exact_distinct=False`` at 100 TB).
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nonnull"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
            for c in names
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def hash_split(
    df: DataFrame,
    weights: "dict[str, float]",
    id_col: ColumnLike,
    seed: int = 42,
    split_name: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test): assign each row a
    split label by ``md5(seed‖id)`` mapped to [0,1) against cumulative
    weights. Reproducible across runs, engines, and partitionings —
    what `randomSplit` (sampling-based, partition-dependent) is not —
    and stable under corpus growth: a document keeps its split forever
    because the hash depends only on its id.

    Pure Column expression (one scan, no shuffle). Weights must sum
    to 1 (±1e-9).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed)), _col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long") / F.lit(float(1 << 32))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_name, expr)


def quota_per_key(
    df: DataFrame,
    key: ColumnLike,
    max_rows: int,
    id_col: ColumnLike,
    seed: int = 42,
) -> DataFrame:
    """Per-key quota cap: keep at most ``max_rows`` rows per key,
    chosen by deterministic ``md5(seed‖id)`` order — the domain-cap
    op of web-corpus curation (no single domain/source may dominate
    the training mix; CommonCrawl-derived datasets cap per-domain
    page counts exactly like this).

    Deterministic (reproducible across runs, engines, partitionings
    — a row's fate depends only on its id and its key's population),
    one shuffle on the key, and the per-key top-N is a
    ``WindowGroupLimit``-eligible rank filter, so each partition
    drops its beyond-quota rows before the final sort of survivors.
    """
    from pyspark.sql import Window

    order = F.md5(F.concat(F.lit(str(seed)), _col(id_col).cast("string")))
    rk = F.row_number().over(Window.partitionBy(_col(key)).orderBy(order))
    return (
        df.withColumn("_rk", rk)
        .filter(F.col("_rk") <= int(max_rows))
        .drop("_rk")
    )


def filter_by_quantile(
    df: DataFrame,
    expr: ColumnLike,
    q: float,
    keep: str = "above",
    approx: bool = False,
) -> DataFrame:
    """Quantile-threshold filter: keep rows whose ``expr`` is above
    (or below) the corpus q-quantile — "drop the bottom 10% by
    quality score", the relative-threshold cut corpus curation uses
    when absolute thresholds don't transfer between corpora.

    Two passes by necessity (the threshold is a global statistic):
    pass 1 reduces the corpus to ONE row (exact ``percentile`` for
    oracle parity, or ``approx_percentile`` — the t-digest sketch,
    one partial-agg shuffle, the 100 TB default); pass 2 streams the
    corpus against the broadcast single-row threshold. No collect —
    the threshold joins in as a lazy broadcast, so the plan stays
    whole and Catalyst can reuse a cached scan across both passes.

    ``keep``: "above" keeps expr >= threshold, "below" keeps
    expr <= threshold.
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    e = _col(expr)
    agg = (
        F.approx_percentile(e, F.lit(float(q)))
        if approx
        else F.percentile(e, F.lit(float(q)))
    )
    thr = df.agg(agg.alias("_thr"))
    cond = (
        e >= F.col("_thr") if keep == "above" else e <= F.col("_thr")
    )
    return df.crossJoin(F.broadcast(thr)).filter(cond).drop("_thr")


def importance_resample(
    df: DataFrame,
    n: int,
    weight: ColumnLike,
    id_col: ColumnLike,
    seed: int = 42,
    keep_name: str | None = None,
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling — the
    SELECTION step of importance-resampling pipelines (DSIR et al.:
    score the corpus, then admit documents with probability
    proportional to weight). Row ``i`` is kept iff
    ``u_i < n * w_i / Σw`` where ``u_i = md5(seed‖id)``-uniform —
    expected sample size ``n`` (Bernoulli thinning, the scalable
    standard; rows with ``n*w_i > Σw`` are always kept, shrinking the
    expected total accordingly — use :func:`weighted_sample` for
    exact-size draws).

    Engine-exact determinism by construction: weights quantize to
    nano fixed-point BIGINT (``Σw`` is an integer sum — order
    independent), ``u_i`` is an exact 32-bit rational, and the only
    float ops are single IEEE multiplies (correctly rounded, so
    identical across Spark/DuckDB/any IEEE engine — no libm). One
    aggregate for ``Σw`` (broadcast single row), then one scan; no
    shuffle of the data itself. Negative/NULL weights are dropped
    (weight 0 never admits).

    Overflow safety (the 100 TB regime): ``Σw_nano`` accumulates in
    ``decimal(38,0)`` and ``n·w_nano`` multiplies in decimal — both
    exact to 1e38, i.e. valid while ``Σw < 1e29`` and
    ``n·w_row < 1e29`` (e.g. 1e13 rows of 1e9-char docs is 1e31
    nano — still 7 orders under the cap on the per-row product and
    the mirror DuckDB oracle sums in HUGEINT). A BIGINT sum would
    wrap silently (non-ANSI) or throw (ANSI) at ~9.2e18 nano ≈
    Σw 9.2e9 — reachable with count-like weights at trillion-row
    scale.

    ``keep_name=None`` filters; a string instead ADDS the 0/1 flag
    (audit mode — every row kept, the curation-ledger companion).

    Reference anchor: no analog (Beam samples uniformly only);
    LLM-pipeline extension (BASELINE.json north_star).
    """
    if n <= 0:
        raise ValueError("importance_resample: n must be positive")
    # per-row nano weight in decimal(28,0) — a long would overflow at
    # w >= ~9.2e9 per row; decimal is exact to 1e28 nano (w < 1e19)
    w_nano_dec = F.when(
        _col(weight).isNotNull() & (_col(weight) > 0),
        F.round(_col(weight).cast("double") * 1e9).cast("decimal(28,0)"),
    ).otherwise(F.lit(0).cast("decimal(28,0)"))
    # sum(decimal(28,0)) widens to decimal(38,0) — exact to 1e38
    tot = df.agg(F.sum(w_nano_dec).alias("_wtot"))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed)), _col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") / F.lit(float(1 << 32))
    # u * Σw_nano < n * w_nano — the products are exact (decimal),
    # each side then takes ONE correctly-rounded double conversion/
    # multiply, so the comparison is engine-exact (no libm)
    keep = (
        (u * F.col("_wtot").cast("double"))
        < (F.lit(int(n)).cast("decimal(10,0)") * w_nano_dec).cast("double")
    ).cast("int")
    out = df.crossJoin(F.broadcast(tot))
    if keep_name is None:
        return out.filter(keep == 1).drop("_wtot")
    return out.select("*", keep.alias(keep_name)).drop("_wtot")


#: atanh-series coefficients 1/3, 1/5, … 1/13 as decimal literals —
#: both engines parse the identical literal to the identical double,
#: so the polynomial is a fixed sequence of correctly-rounded IEEE
#: mul/adds (deterministic across engines, unlike libm log())
_LN_C = (
    "0.3333333333333333",
    "0.2",
    "0.14285714285714285",
    "0.1111111111111111",
    "0.09090909090909091",
    "0.07692307692307693",
)
_LN2 = "0.6931471805599453"


def _det_ln_u(id_col, seed: int):
    """Engine-exact ``ln(u)`` for the md5-rational uniform
    ``u = m / 2^32`` (``m`` = first 8 md5 hex digits of seed‖id,
    clamped to ≥ 1): decompose ``m = t · 2^(b-1)`` with
    ``b = len(bin(m))`` and ``t ∈ [1, 2)``, then
    ``ln u = atanh-series(t) + (b - 33)·ln2`` — series
    ``2z(1 + c₃s + c₅s² + …)``, ``z = (t-1)/(t+1)``, ``s = z²``,
    truncated after z¹³ (|error| < 2e-8, identical in every IEEE
    engine: only correctly-rounded +,-,*,/ on identical literals —
    the :func:`importance_resample` no-libm construction applied to
    the log). Exact SQL mirror in ``queries.ORACLE_WEIGHTED_SAMPLE_DET``."""
    m = F.greatest(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(seed)), _col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    b = F.length(F.bin(m))
    # 2^(b-1) built exactly as the binary string '1' + (b-1)·'0'
    # (PySpark's shiftleft takes only literal shift amounts)
    pow2 = F.conv(
        F.concat(F.lit("1"), F.repeat(F.lit("0"), b - 1)), 2, 10
    ).cast("double")
    t = m.cast("double") / pow2
    z = (t - F.lit(1.0)) / (t + F.lit(1.0))
    s = z * z
    poly = F.lit(float(_LN_C[-1]))
    for c in reversed(_LN_C[:-1]):
        poly = F.lit(float(c)) + s * poly
    ln_t = F.lit(2.0) * z * (F.lit(1.0) + s * poly)
    return ln_t + (b - F.lit(33)).cast("double") * F.lit(float(_LN2))


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: ColumnLike,
    id_col: ColumnLike,
    seed: int = 42,
    key: ColumnLike | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """Exact-size weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006): every row draws ``key = ln(u)/w`` with the
    deterministic md5 uniform and the ``n`` LARGEST keys win —
    equivalent to sequential draws proportional to weight. Physical
    shape is ``TakeOrderedAndProject`` (per-partition top-n heap +
    driver merge of n·#partitions candidates), the same no-total-sort
    shape as :func:`sample` — never a global sort.

    Cross-engine caveat of the default mode: ``ln`` is libm — Spark
    and another engine may disagree in the last ulp, which can swap
    rows whose keys collide to ~1e-15. Within ONE engine the draw is
    fully deterministic and reproducible (partitioning-independent).
    ``deterministic=True`` swaps libm ``ln`` for the engine-exact
    atanh-series log (:func:`_det_ln_u` — correctly-rounded IEEE
    arithmetic only, ~2e-8 from true ln, statistically negligible),
    making the draw bit-identical across engines — the oracle-gated
    mode (`weighted_sample_det` corpus query, global + per-key).
    Rows with NULL/non-positive weight never win. Ties break by id.

    ``key=`` switches to a per-key draw (``n`` winners per key): a
    rank-over-window in the same order — WindowGroupLimit-eligible,
    so each partition drops beyond-``n`` rows before the per-key
    merge (the :func:`quota_per_key` shape, weight-biased).
    """
    if n <= 0:
        raise ValueError("weighted_sample: n must be positive")
    if deterministic:
        ln_u = _det_ln_u(id_col, seed)
    else:
        u = F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(str(seed)), _col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long") / F.lit(float(1 << 32))
        # guard u=0 (ln(0) = -inf is fine for ordering, but NULL
        # weights must lose)
        ln_u = F.log(F.greatest(u, F.lit(2.0 ** -33)))
    # es_key = ln(u)/w, larger is better; w <= 0 -> NULL key sorts
    # last under desc_nulls_last below
    es_key = F.when(
        _col(weight).isNotNull() & (_col(weight) > 0),
        ln_u / _col(weight).cast("double"),
    )
    if key is not None:
        w = Window.partitionBy(_col(key)).orderBy(
            F.col("_es_key").desc_nulls_last(), _col(id_col).asc()
        )
        return (
            df.withColumn("_es_key", es_key)
            .withColumn("_es_rn", F.row_number().over(w))
            .filter(F.col("_es_rn") <= int(n))
            .drop("_es_key", "_es_rn")
        )
    return (
        df.withColumn("_es_key", es_key)
        .orderBy(
            F.col("_es_key").desc_nulls_last(), _col(id_col).asc()
        )
        .limit(int(n))
        .drop("_es_key")
    )


def quantile_buckets_per_key(
    df: DataFrame,
    expr: ColumnLike,
    n: int,
    key: ColumnLike,
    bucket_name: str = "qbucket",
    approx: bool = False,
) -> DataFrame:
    """Per-key :func:`quantile_buckets` — each key's rows bucket
    against their OWN quantile cut points (the CCNet shape: per-
    source/per-language perplexity head/middle/tail tiers, so one
    source's score distribution never skews another's tiers).

    One groupBy(key) aggregate computes each key's ``n-1`` cuts
    (exact ``percentile`` for oracle parity, ``approx_percentile``
    at scale), joined back BROADCAST (key cardinality ≪ rows — a
    per-source cut table is sources-sized); the bucket is
    ``1 + #cuts <= value`` per row. No window, no sort, no
    single-partition ntile. NULL keys are a key like any other
    (null-safe join — their rows bucket against the NULL group's own
    cuts instead of silently dropping).
    """
    e = _col(expr)
    probs = F.array(*[F.lit(i / n) for i in range(1, int(n))])
    agg = (
        F.approx_percentile(e, probs) if approx else F.percentile(e, probs)
    )
    cuts = df.groupBy(_col(key).alias("_qk")).agg(agg.alias("_cuts"))
    bucket = (
        F.size(
            F.filter(F.col("_cuts"), lambda c: e.cast("double") >= c)
        )
        + 1
    ).alias(bucket_name)
    return (
        df.join(F.broadcast(cuts), _col(key).eqNullSafe(F.col("_qk")))
        .select(*df.columns, bucket)
    )


def quantile_buckets(
    df: DataFrame,
    expr: ColumnLike,
    n: int,
    bucket_name: str = "qbucket",
    approx: bool = False,
) -> DataFrame:
    """Assign each row its quantile bucket 1..n by ``expr`` (the
    curriculum-binning op: difficulty tiers, length tiers, quality
    tiers for staged sampling).

    NOT a global ntile — ``ntile`` needs a total order, which is a
    single-partition window (the classic 100 TB trap). Instead: one
    aggregate computes the n-1 cut points (exact ``percentile`` for
    oracle parity, ``approx_percentile`` as the scale default), joins
    in as a broadcast single row, and the bucket is
    ``1 + #cuts <= value`` per row — one scan, no sort, no window.
    Equal-size buckets are therefore only approximate under heavy
    ties (boundary-valued rows all land in the upper bucket —
    deterministic, engine-independent).
    """
    e = _col(expr)
    probs = F.array(*[F.lit(i / n) for i in range(1, int(n))])
    agg = (
        F.approx_percentile(e, probs) if approx else F.percentile(e, probs)
    )
    cuts = df.agg(agg.alias("_cuts"))
    bucket = (
        F.size(
            F.filter(F.col("_cuts"), lambda c: e.cast("double") >= c)
        )
        + 1
    ).alias(bucket_name)
    return df.crossJoin(F.broadcast(cuts)).select("*", bucket).drop("_cuts")


def shuffle_key(
    seed: int, *id_cols: ColumnLike, alias: str = "shuffle_key"
) -> Column:
    """Deterministic per-row shuffle key: ``md5(seed ‖ id…)`` with a
    unit-separator (``\\x1f``) between components — the separator is
    what makes multi-column ids collision-free (without it
    ``(1, 12)`` and ``(11, 2)`` concatenate identically and their
    relative order becomes engine-dependent). NULL ids map to a
    ``\\x00``-prefixed sentinel no cast output can produce, so they
    get a stable (not NULL-propagated) position. Exposed as a
    first-class column so the training order is reproducible and
    resumable; a new epoch is just a new seed. DuckDB-exact:
    ``md5('7' || chr(31) || CAST(id AS VARCHAR) …)``."""
    parts: list[Column] = [F.lit(str(seed))]
    for c in id_cols:
        parts.append(F.lit("\x1f"))
        parts.append(
            F.coalesce(_col(c).cast("string"), F.lit("\x00null"))
        )
    return F.md5(F.concat(*parts)).alias(alias)


def curriculum_order(
    df: DataFrame,
    difficulty: ColumnLike,
    n_stages: int = 3,
    seed: int = 42,
    key: ColumnLike | None = None,
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Difficulty-staged deterministic training order (curriculum
    learning, Bengio et al. 2009) — the missing third leg of the
    training-order family (:func:`global_shuffle` = uniform order,
    :func:`zorder_key` = locality order, this = staged order): each
    row lands in difficulty stage 1..n via exact quantile cuts
    (per-``key`` cuts when given, so one source's difficulty
    distribution never skews another's stages; global cuts
    otherwise), and ``curriculum_key`` = zero-padded stage ‖
    md5(seed‖id) — lexicographic order is easy-stages-first with a
    deterministic md5 shuffle WITHIN each stage.

    The key is a SORT KEY, not a rank: write the corpus with a
    range-partitioned sort on it (``repartitionByRange`` +
    ``sortWithinPartitions`` — the :func:`global_shuffle`
    discipline), so there is no global window, no single-partition
    ntile, no rank materialization. A different seed reshuffles
    within stages without moving anything across stages. Returns the
    input columns + ``(stage, curriculum_key)``.

    Reference anchor: no analog; training-order extension surface
    (BASELINE.json north_star)."""
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    if key is not None:
        staged = quantile_buckets_per_key(
            df, difficulty, n_stages, key, bucket_name="stage"
        )
    else:
        staged = quantile_buckets(
            df, difficulty, n_stages, bucket_name="stage"
        )
    ck = F.concat(
        F.lpad(F.col("stage").cast("string"), 2, "0"),
        F.lit("-"),
        F.md5(
            F.concat(
                F.lit(str(seed)),
                F.lit("\x1f"),
                _col(id_col).cast("string"),
            )
        ),
    )
    return staged.select(
        *df.columns, "stage", ck.alias("curriculum_key")
    )


def global_shuffle(
    df: DataFrame,
    seed: int,
    *id_cols: ColumnLike,
    num_partitions: int | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Deterministic GLOBAL shuffle for training-order randomization:
    total-order the corpus by :func:`shuffle_key` (reference has no
    analog — Beam pipelines reach for ``Reshuffle``, which
    randomizes *placement*, not a reproducible read order; trainers
    need both).

    NOT a single-partition sort: ``orderBy`` range-partitions on a
    sampled key distribution then sorts within partitions — the
    standard distributed total order. md5 keys are uniform by
    construction, so the range partitions are balanced regardless of
    id skew — no hot partition at 100 TB, and downstream
    ``spark.read`` of the written shards replays the exact order.
    ``num_partitions`` pins the output shard count (defaults to the
    session shuffle parallelism); ``keep_key`` retains the key
    column for audit/resume bookkeeping.
    """
    if not id_cols:
        raise ValueError("global_shuffle needs at least one id column")
    key = shuffle_key(seed, *id_cols, alias="_gs_key")
    out = df.withColumn("_gs_key", key)
    if num_partitions is not None:
        out = out.repartitionByRange(int(num_partitions), "_gs_key")
        out = out.sortWithinPartitions("_gs_key")
    else:
        out = out.orderBy("_gs_key")
    if keep_key:
        return out.withColumnRenamed("_gs_key", "shuffle_key")
    return out.drop("_gs_key")


def zorder_key(
    df: DataFrame,
    cols: list,
    bits: int = 4,
    key_name: str = "zkey",
    approx: bool = False,
    cut_round: int | None = 6,
) -> DataFrame:
    """Z-order (Morton) clustering key over quantile-ranked columns —
    the multi-dimensional layout key behind data-skipping file
    organization (Delta ``OPTIMIZE ZORDER BY``, Hudi space-filling
    curves): rows close in EVERY keyed dimension get close keys, so
    range-partitioning on the key yields parquet files with tight
    min/max stats on all keyed columns at once (a plain sort only
    helps its leading column).

    Per column: ONE aggregate computes the 2^bits − 1 quantile cut
    points (exact ``percentile`` for oracle parity; ``approx=True``
    for the scale default — same contract as
    :func:`quantile_buckets`), broadcast as a single row; the rank is
    ``#cuts <= value`` (0 .. 2^bits−1), and the key interleaves rank
    bits round-robin (earlier ``cols`` take the more significant bit
    of each round). No sort, no window, one scan. NULL cells rank 0
    (NULLS FIRST), and an all-NULL column degrades to rank 0 for all
    rows — ``zkey`` is never NULL, so downstream
    ``repartitionByRange`` keeps its spread.

    ``cut_round`` (default 6) rounds both the interpolated cut
    points and the compared values before ranking: interpolated
    percentiles differ across engines in the last ulp, and a row
    whose value sits exactly ON a cut would otherwise rank
    differently per engine (observed at sf0.1, where the corpus is
    large enough for a value to tie a cut) — for a LAYOUT key the
    sub-1e-6 tie direction is irrelevant, engine-exactness is not.
    ``None`` disables.

    Reference anchor: no analog (Beam has no storage layout);
    LLM-pipeline extension for 100 TB parquet curation.
    """
    d = len(cols)
    if d == 0:
        raise ValueError("zorder_key: need at least one column")
    if bits <= 0 or d * bits > 63:
        raise ValueError("zorder_key: need 0 < cols*bits <= 63")
    n = 1 << bits
    probs = F.array(*[F.lit(i / n) for i in range(1, n)])
    perc = F.approx_percentile if approx else F.percentile
    cuts = df.agg(
        *[
            perc(_col(c).cast("double"), probs).alias(f"_zc{j}")
            for j, c in enumerate(cols)
        ]
    )

    def _ge(e):
        return lambda cut: e >= cut  # closure factory: HOF arity = 1

    # NULL contract (explicit, not incidental): a NULL cell ranks 0
    # (NULLS FIRST — NULLs cluster with the minimum, the same corner
    # range-partitioned sorts put them in), and an all-NULL column
    # (percentile returns a NULL cut array) contributes rank 0 for
    # every row instead of poisoning the whole key to NULL — without
    # this, repartitionByRange on an all-NULL zkey funnels the entire
    # dataset into ONE partition with no error (ADVICE r4).
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        e = _col(c).cast("double")
        cuts_j = F.col(f"_zc{j}")
        if cut_round is not None:
            e = F.round(e, cut_round)
            cuts_j = F.transform(cuts_j, lambda cc: F.round(cc, cut_round))
        rank = F.when(
            _col(c).cast("double").isNull() | F.col(f"_zc{j}").isNull(),
            F.lit(0),
        ).otherwise(
            F.size(F.filter(cuts_j, _ge(e)))
        ).cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(rank, b).bitwiseAND(F.lit(1).cast("long")),
                b * d + (d - 1 - j),
            )
    out = df.crossJoin(F.broadcast(cuts)).select(
        "*", key.alias(key_name)
    )
    return out.drop(*[f"_zc{j}" for j in range(d)])


def zorder_layout(
    df: DataFrame,
    cols: list,
    num_partitions: int,
    bits: int = 8,
    approx: bool = True,
) -> DataFrame:
    """Range-partition + sort by the Z-order key: the write-side
    layout step (``zorder_layout(df, ["a", "b"], 1024).write...``).
    Each output partition covers a contiguous z-range, so every file
    gets tight min/max on all keyed columns — the distributed sort is
    Spark's range-partitioned TeraSort shape, never a single
    partition."""
    keyed = zorder_key(df, cols, bits=bits, approx=approx)
    return keyed.repartitionByRange(
        int(num_partitions), "zkey"
    ).sortWithinPartitions("zkey")


def skew_report(
    df: DataFrame,
    key: ColumnLike,
    top_n: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/agg-key skew diagnostics: the ``top_n`` heaviest keys
    with row count, corpus fraction, and the salt factor that would
    split each onto ``target_rows_per_task``-row tasks — the
    pre-flight check before any big keyed join (feeds
    :func:`~.joins.salted_join`'s ``salt_buckets`` and the AQE
    skew-join threshold choice).

    ONE partial-agg shuffle on the key + a single-row total broadcast
    + TakeOrdered top-n (per-partition heap, no global sort). NULL
    keys are reported like any other key (they hash-partition
    together and skew exactly the same way).

    Returns ``(key, n, frac, salt)`` — ``frac`` rounded to 9 dp,
    ``salt = max(1, ceil(n / target))``.
    """
    counts = df.groupBy(_col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("_tot").cast("double"), 9
            ).alias("frac"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(
                    F.col("n") / F.lit(int(target_rows_per_task))
                ).cast("long"),
            ).alias("salt"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc_nulls_last())
        .limit(int(top_n))
    )


def mad_outliers(
    df: DataFrame,
    expr: ColumnLike,
    z: float = 3.5,
    flag_name: str | None = None,
) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation
    (Iglewicz & Hoaglin 1993): modified z-score
    ``0.6745 · (x − median) / MAD`` with MAD = median(|x − median|)
    — the curation-grade outlier rule (mean/stddev break down when
    the outliers themselves move the mean; the median pair does
    not). Default cutoff 3.5 is the standard recommendation.

    ``flag_name=None`` FILTERS outliers out; a string instead ADDS
    the 0/1 outlier flag (audit mode — keep every row, the
    filter_report companion shape).

    Two aggregate passes by necessity (MAD is a statistic of the
    residuals of a statistic): each is ONE exact-percentile
    aggregate reduced to a single broadcast row — no window, no
    sort of the data. All arithmetic is correctly-rounded IEEE on
    the exact aggregate outputs (0.6745 is the same literal both
    engines parse) — oracle-exact without libm. A constant column
    (MAD = 0) flags nothing (every modified z is NULL → not an
    outlier), matching the reference treatment.
    """
    e = _col(expr).cast("double")
    med = df.agg(F.percentile(e, F.lit(0.5)).alias("_med"))
    with_med = df.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(e - F.col("_med")), F.lit(0.5)).alias("_mad")
    )
    mz = F.when(
        F.col("_mad") > 0,
        F.lit(0.6745) * (e - F.col("_med")) / F.col("_mad"),
    )
    is_out = (F.abs(mz) > F.lit(float(z))).cast("int")
    out = with_med.crossJoin(F.broadcast(mad))
    if flag_name is None:
        return out.filter(
            F.coalesce(is_out, F.lit(0)) == 0
        ).drop("_med", "_mad")
    return out.select(
        "*", F.coalesce(is_out, F.lit(0)).alias(flag_name)
    ).drop("_med", "_mad")


def domain_reweight(
    losses: DataFrame,
    iterations: int = 5,
    eta: float = 0.1,
    domain: ColumnLike = "domain",
    loss_nano: ColumnLike = "loss_nano",
) -> DataFrame:
    """Multiplicative-weights domain reweighting — the first-order
    form of DoReMi-style mix optimization (Xie et al. 2023): domains
    whose loss exceeds the current weighted mean gain weight, easier
    domains shed it, iterated to a reweighted sampling mix. Input is
    the DOMAIN-SIZED loss table ``(domain, loss_nano)`` (nano
    fixed-point — e.g. per-token corpus-LM negative log-prob from
    :func:`~..functions.text.bigram_doc_scores` aggregates); output
    is ``(domain, weight_nano)`` with mean weight 1e9.

    Per iteration (all engine-exact: integer/decimal sums are
    order-independent, every float op is a correctly-rounded IEEE
    step on exact aggregate outputs — an unrolled CTE chain is a
    valid oracle):

    1. ``m`` = Σ(w·loss)/Σw (decimal sums → double division);
    2. ``x`` = max|loss − m| (0 → no-op iteration);
    3. ``w ← round(w · (1 + η·(loss − m)/x))`` — factors bounded to
       [1−η, 1+η], positive for η < 1;
    4. renormalize to mean 1e9 (round(w · N·1e9/Σw)).

    Execution shape (r13 optimization, guide §1.2 step 1): the table
    is DOMAINS-SIZED by contract, so every per-iteration aggregate is
    a full-table WINDOW over one post-exchange partition — the whole
    recurrence is ONE lazy plan (Exchange SinglePartition + 3 stacked
    Window nodes per iteration), so the corpus is touched exactly
    once by whatever produced the losses and NO per-iteration jobs
    run at all. The previous shape (crossJoin(broadcast(agg)) per
    step + an eager localCheckpoint per iteration) executed ~20 tiny
    jobs whose scheduling latency dominated the query (measured at
    sf0.1: 3.0 s wall with 0.55 s of stage time); the window chain
    computes the identical values (same decimal/double expression
    steps, order-independent sums) with zero mid-loop actions.

    Reference anchor: no analog; mixing extension surface
    (BASELINE.json north_star).
    """
    # The recurrence is built from parsed SQL (r13, guide §1.2 step
    # 2): the former 8-withColumn chain per iteration cost ~1.4 s of
    # pure driver py4j time per call. Three selects per iteration —
    # the minimum layering that keeps every window argument free of
    # nested windows — with the IDENTICAL expression steps: decimal
    # sums, double division/round in the same left-to-right op order
    # (`1.0D`/`...D` literals parse to the same IEEE doubles as
    # F.lit; integer/decimal aggregates are order-independent).
    eta_d = repr(float(eta)) + "D"
    cur = losses.select(
        _col(domain).alias("domain"),
        _col(loss_nano).cast("long").alias("_loss"),
        F.lit(1_000_000_000).cast("long").alias("weight_nano"),
    )
    exc = "(CAST(_loss AS DOUBLE) - CAST(_wl AS DOUBLE) / CAST(_w AS DOUBLE))"
    for _ in range(int(iterations)):
        lay1 = cur.select(
            "domain",
            "_loss",
            "weight_nano",
            F.expr(
                "SUM(CAST(weight_nano AS DECIMAL(38,0))"
                " * CAST(_loss AS DECIMAL(38,0))) OVER ()"
            ).alias("_wl"),
            F.expr("SUM(CAST(weight_nano AS DECIMAL(38,0))) OVER ()").alias(
                "_w"
            ),
            F.expr("COUNT(1) OVER ()").alias("_n"),
        )
        lay2 = lay1.select(
            "domain",
            "_loss",
            "weight_nano",
            "_n",
            F.expr(exc).alias("_exc"),
            F.expr(f"MAX(ABS{exc}) OVER ()").alias("_x"),
        )
        w1 = (
            "(CASE WHEN _x > 0 THEN"
            " CAST(ROUND(CAST(weight_nano AS DOUBLE)"
            f" * (1.0D + {eta_d} * _exc / _x)) AS BIGINT)"
            " ELSE weight_nano END)"
        )
        cur = lay2.select(
            "domain",
            "_loss",
            F.expr(
                f"CAST(ROUND(CAST({w1} AS DOUBLE)"
                " * (CAST(_n AS DOUBLE) * 1000000000.0D"
                f" / CAST(SUM(CAST({w1} AS DECIMAL(38,0))) OVER ()"
                " AS DOUBLE))) AS BIGINT)"
            ).alias("weight_nano"),
        )
    return cur.select("domain", "weight_nano")
