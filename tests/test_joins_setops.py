"""Join/cogroup + set-op tests — ports of
/root/reference/test/datasplash/api_test.clj:560-722, 1025-1050."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasplash_spark import operators as ops
from datasplash_spark.operators import JoinSpec
from tests.helpers import contains_only


def sides(spark):
    # api_test.clj:563-564 ragged shapes: one row with nil key on p1
    p1 = spark.createDataFrame(
        [("a", 42), (None, 56), ("c", 65)], "key string, val long"
    )
    p2 = spark.createDataFrame(
        [("a", 1), ("b", 2)], "key string, lue long"
    )
    return p1, p2


def test_join_by_outer_default(spark):
    # join-by with no :required → full outer; nil keys never join
    p1, p2 = sides(spark)
    out = ops.join_by(
        [JoinSpec(p1, "key", name="l"), JoinSpec(p2, "key", name="r")],
        select=[
            F.col("key"),
            F.col("_l.val").alias("val"),
            F.col("_r.lue").alias("lue"),
        ],
    )
    contains_only(
        out,
        [
            ("a", 42, 1),
            (None, 56, None),  # nil key emits alone (no match)
            ("c", 65, None),
            ("b", None, 2),
        ],
    )


def test_join_by_required_both_is_inner(spark):
    p1, p2 = sides(spark)
    out = ops.join_by(
        [
            JoinSpec(p1, "key", required=True, name="l"),
            JoinSpec(p2, "key", required=True, name="r"),
        ],
        select=[F.col("key"), F.col("_l.val").alias("val"), F.col("_r.lue").alias("lue")],
    )
    contains_only(out, [("a", 42, 1)])


def test_join_by_one_required(spark):
    # left required, right optional → keys of left (minus nil no-join rule:
    # nil-keyed left rows still emit with null right)
    p1, p2 = sides(spark)
    out = ops.join_by(
        [
            JoinSpec(p1, "key", required=True, name="l"),
            JoinSpec(p2, "key", name="r"),
        ],
        select=[F.col("key"), F.col("_l.val").alias("val"), F.col("_r.lue").alias("lue")],
    )
    contains_only(out, [("a", 42, 1), (None, 56, None), ("c", 65, None)])


def test_join_by_drop_nil(spark):
    p1, p2 = sides(spark)
    out = ops.join_by(
        [
            JoinSpec(p1, "key", required=True, drop_nil=True, name="l"),
            JoinSpec(p2, "key", name="r"),
        ],
        select=[F.col("key"), F.col("_l.val").alias("val"), F.col("_r.lue").alias("lue")],
    )
    contains_only(out, [("a", 42, 1), ("c", 65, None)])


def test_join_by_cartesian_per_key(spark):
    # join-by output = per-key cartesian product (core.clj:1729-1736)
    l = spark.createDataFrame([("k", 1), ("k", 2)], "key string, a long")
    r = spark.createDataFrame([("k", 10), ("k", 20)], "key string, b long")
    out = ops.join_by(
        [JoinSpec(l, "key", name="l"), JoinSpec(r, "key", name="r")],
        select=[F.col("_l.a").alias("a"), F.col("_r.b").alias("b")],
    )
    contains_only(out, [(1, 10), (1, 20), (2, 10), (2, 20)])


def test_cogroup_by_basic(spark):
    # api_test.clj:560-601: per-key vectors per side
    p1, p2 = sides(spark)
    out = ops.cogroup_by(
        [JoinSpec(p1, "key", name="l"), JoinSpec(p2, "key", name="r")]
    ).select(
        "key",
        F.sort_array(F.col("_l.val")).alias("lvals"),
        F.sort_array(F.col("_r.lue")).alias("rvals"),
    )
    contains_only(
        out,
        [
            ("a", [42], [1]),
            ("b", [], [2]),
            ("c", [65], []),
            (None, [56], []),  # nil-keyed element → its own singleton group
        ],
    )


def test_cogroup_by_required_drops_missing(spark):
    p1, p2 = sides(spark)
    out = ops.cogroup_by(
        [
            JoinSpec(p1, "key", name="l"),
            JoinSpec(p2, "key", required=True, name="r"),
        ]
    ).select(
        "key",
        F.sort_array(F.col("_l.val")).alias("lvals"),
        F.sort_array(F.col("_r.lue")).alias("rvals"),
    )
    contains_only(out, [("a", [42], [1]), ("b", [], [2])])


@pytest.mark.slow  # 25 s; the n-way path is default-gated at lower
# arity (test_cogroup_by_basic / _required_drops_missing) — this is
# the 101-input reference-parity stress (api_test.clj:577-601)
def test_cogroup_101_way(spark):
    # api_test.clj:577-601: 101-input cogroup on :i
    n_sides = 101
    base = spark.createDataFrame(
        [(i, p) for p in range(n_sides) for i in range(5)], "i long, key long"
    ).coalesce(1).persist()
    dfs = [base.filter(F.col("key") == p) for p in range(n_sides)]
    out = ops.cogroup_by([JoinSpec(d, "i", name=f"s{j}") for j, d in enumerate(dfs)])
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        for j in range(n_sides):
            assert len(r[f"_s{j}"]) == 1


def test_set_ops(spark):
    # api_test.clj:1025-1050
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "x long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x long")
    contains_only(ops.intersect_distinct(a, b), [(2,), (3,)])
    contains_only(ops.union_distinct(a, b), [(1,), (2,), (3,), (4,)])
    contains_only(ops.except_distinct(a, b), [(1,)])
    contains_only(
        ops.concat(a, b),
        [(1,), (2,), (2,), (3,), (2,), (3,), (4,)],
    )


def test_diamond_dag_math(spark):
    """math-and-diamond-test (api_test.clj:1009-1023): one input fans
    into four global combines whose results are concatenated back —
    the DAG-sharing shape. Values match the reference's [1 3.0 5 15]
    (typed engine: all coerced to double)."""
    inp = spark.createDataFrame([(i,) for i in range(1, 6)], "v long")
    branches = [
        ops.combine(inp, agg.cast("double").alias("value"))
        for agg in (
            ops.mean_fn("v"),
            ops.max_fn("v"),
            ops.min_fn("v"),
            ops.sum_fn("v"),
        )
    ]
    contains_only(ops.concat(*branches), [(3.0,), (5.0,), (1.0,), (15.0,)])
    assert ops.sample(inp, 2).count() == 2


def test_dflatten(spark):
    df = spark.createDataFrame([([1, 2],), ([3],)], "xs array<long>")
    contains_only(ops.dflatten(df, "xs"), [(1,), (2,), (3,)])


def test_cogroup_multiple_nils_emit_separate_groups(spark):
    """THE distinguishing nil rule (core.clj:1561-1570): two nil-keyed
    elements → two singleton groups, not one SQL null-group."""
    p1 = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3)], "key string, v int"
    )
    p2 = spark.createDataFrame([("a", 10)], "key string, w int")
    out = ops.cogroup_by(
        [JoinSpec(p1, "key", name="l"), JoinSpec(p2, "key", name="r")]
    )
    rows = out.collect()
    nil_rows = [r for r in rows if r.key is None]
    assert len(nil_rows) == 2  # one group per nil element
    assert all(len(r._l) == 1 and len(r._r) == 0 for r in nil_rows)
    # join_nil=True instead groups them as one ordinary key
    joined = ops.cogroup_by(
        [JoinSpec(p1, "key", name="l"), JoinSpec(p2, "key", name="r")],
        join_nil=True,
    )
    nil_joined = [r for r in joined.collect() if r.key is None]
    assert len(nil_joined) == 1 and len(nil_joined[0]._l) == 2


def test_asof_join_backward_inclusive(spark):
    """Inclusive boundary: a right row at exactly left's time matches;
    earlier rows match the latest prior; no prior → nulls (left outer)."""
    from datasplash_spark.operators import asof_join
    from datasplash_spark.sources import generate_input

    quotes = generate_input(
        spark,
        [(1, 10, 100.0), (1, 20, 101.0), (2, 15, 50.0)],
        "uid bigint, t bigint, px double",
    )
    trades = generate_input(
        spark,
        [(1, 15, 1.0), (1, 20, 2.0), (1, 5, 3.0), (2, 14, 4.0), (3, 9, 5.0)],
        "uid bigint, t bigint, qty double",
    )
    out = {
        (r.uid, r.t): (r.t_r, r.px)
        for r in asof_join(
            trades, quotes, on="uid", left_on="t", right_on="t",
            right_cols=["t", "px"],
        ).collect()
    }
    assert out == {
        (1, 15): (10, 100.0),
        (1, 20): (20, 101.0),  # inclusive: coincident quote wins
        (1, 5): (None, None),
        (2, 14): (None, None),
        (3, 9): (None, None),
    }


def test_range_join_bucket_boundaries(spark):
    """Intervals spanning multiple buckets match exactly once; points
    outside every interval drop; boundaries are inclusive."""
    from datasplash_spark.operators import range_join
    from datasplash_spark.sources import generate_input

    pts = generate_input(
        spark,
        [(1, 12.0), (1, 20.0), (1, 45.0), (2, 5.0), (2, 7.0)],
        "uid bigint, ts double",
    )
    iv = generate_input(
        spark,
        [(1, 10.0, 20.0), (1, 40.0, 41.0), (2, 0.0, 6.0)],
        "uid bigint, lo double, hi double",
    )
    # bucket_width far smaller than the widest interval: multi-bucket
    # explosion must still yield exactly one row per qualifying pair
    rows = range_join(
        pts, iv, on="uid", point_col="ts", lo_col="lo", hi_col="hi",
        bucket_width=3.0,
    ).select("p.uid", "p.ts", "i.lo", "i.hi").collect()
    got = sorted((r.uid, r.ts, r.lo, r.hi) for r in rows)
    assert got == [
        (1, 12.0, 10.0, 20.0),
        (1, 20.0, 10.0, 20.0),  # hi inclusive
        (2, 5.0, 0.0, 6.0),
    ]


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics: one hot key (90% of the
    big side) + normal keys, inner and left, vs the unsalted join."""
    from datasplash_spark.operators import salted_join
    from datasplash_spark.sources import generate_input

    big_rows = [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 12)]
    small_rows = [(1, "hot"), (2, "a"), (3, "b"), (99, "unmatched")]
    big = generate_input(spark, big_rows, "k bigint, v bigint")
    small = generate_input(spark, small_rows, "k bigint, label string")

    for how in ("inner", "left"):
        plain = sorted(
            (r.k, r.v, r.label) for r in big.join(small, "k", how).collect()
        )
        salted = sorted(
            (r.k, r.v, r.label)
            for r in salted_join(big, small, "k", how=how, salt_buckets=8).collect()
        )
        assert salted == plain, how

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(big, small, "k", how="full_outer")


def test_asof_join_matches_pandas_merge_asof(spark):
    """Seeded random series vs pandas.merge_asof (backward,
    inclusive) — the de-facto as-of semantics reference."""
    import random

    import pandas as pd

    from datasplash_spark.operators import asof_join
    from datasplash_spark.sources import generate_input

    rng = random.Random(17)
    for trial in range(3):
        left_rows = sorted(
            (rng.randrange(1, 4), rng.randrange(0, 1000)) for _ in range(40)
        )
        right_rows = sorted(
            {(rng.randrange(1, 4), rng.randrange(0, 1000)) for _ in range(30)}
        )
        lpdf = pd.DataFrame(left_rows, columns=["uid", "t"]).sort_values("t")
        rpdf = pd.DataFrame(right_rows, columns=["uid", "t"]).assign(
            rv=lambda d: d.t * 10
        ).sort_values("t")
        exp = pd.merge_asof(
            lpdf, rpdf, on="t", by="uid", direction="backward", suffixes=("", "_r")
        )
        expected = sorted(
            (r.uid, r.t, None if pd.isna(r.rv) else int(r.rv))
            for r in exp.itertuples()
        )
        ldf = generate_input(spark, left_rows, "uid bigint, t bigint")
        rdf = generate_input(
            spark, [(u, t, t * 10) for u, t in right_rows],
            "uid bigint, t bigint, rv bigint",
        )
        out = asof_join(ldf, rdf, on="uid", left_on="t", right_on="t",
                        right_cols=["rv"])
        got = sorted((r.uid, r.t, r.rv) for r in out.collect())
        assert got == expected, f"trial {trial}"


def test_asof_join_composite_keys(spark):
    """Multi-column equi-keys: matches must respect BOTH keys."""
    from datasplash_spark.operators import asof_join
    from datasplash_spark.sources import generate_input

    quotes = generate_input(
        spark,
        [(1, "x", 10, 1.0), (1, "y", 10, 2.0), (2, "x", 5, 3.0)],
        "uid bigint, sym string, t bigint, px double",
    )
    trades = generate_input(
        spark,
        [(1, "x", 15), (1, "y", 15), (1, "z", 15), (2, "x", 4)],
        "uid bigint, sym string, t bigint",
    )
    out = {
        (r.uid, r.sym): r.px
        for r in asof_join(
            trades, quotes, on=["uid", "sym"], left_on="t", right_on="t",
            right_cols=["px"],
        ).collect()
    }
    assert out == {(1, "x"): 1.0, (1, "y"): 2.0, (1, "z"): None, (2, "x"): None}


def test_asof_join_forward_matches_pandas(spark):
    """direction='forward' vs pandas.merge_asof forward semantics."""
    import random

    import pandas as pd

    from datasplash_spark.operators import asof_join
    from datasplash_spark.sources import generate_input

    rng = random.Random(23)
    left_rows = sorted((rng.randrange(1, 4), rng.randrange(0, 500)) for _ in range(30))
    right_rows = sorted({(rng.randrange(1, 4), rng.randrange(0, 500)) for _ in range(20)})
    lpdf = pd.DataFrame(left_rows, columns=["uid", "t"]).sort_values("t")
    rpdf = (
        pd.DataFrame(right_rows, columns=["uid", "t"])
        .assign(rv=lambda d: d.t * 10)
        .sort_values("t")
    )
    exp = pd.merge_asof(
        lpdf, rpdf, on="t", by="uid", direction="forward", suffixes=("", "_r")
    )
    expected = sorted(
        (r.uid, r.t, None if pd.isna(r.rv) else int(r.rv)) for r in exp.itertuples()
    )
    ldf = generate_input(spark, left_rows, "uid bigint, t bigint")
    rdf = generate_input(
        spark, [(u, t, t * 10) for u, t in right_rows], "uid bigint, t bigint, rv bigint"
    )
    out = asof_join(
        ldf, rdf, on="uid", left_on="t", right_on="t", right_cols=["rv"],
        direction="forward",
    )
    got = sorted((r.uid, r.t, r.rv) for r in out.collect())
    assert got == expected


def test_asof_join_nearest_matches_pandas(spark):
    """direction='nearest' vs pandas merge_asof on tie-free data."""
    import random

    import pandas as pd

    from datasplash_spark.operators import asof_join
    from datasplash_spark.sources import generate_input

    rng = random.Random(31)
    left_rows = sorted({(rng.randrange(1, 4), rng.randrange(0, 500) * 2) for _ in range(30)})
    right_rows = sorted({(rng.randrange(1, 4), rng.randrange(0, 500) * 2 + 1) for _ in range(20)})
    lpdf = pd.DataFrame(left_rows, columns=["uid", "t"]).sort_values("t")
    rpdf = (
        pd.DataFrame(right_rows, columns=["uid", "t"])
        .assign(rv=lambda d: d.t * 10)
        .sort_values("t")
    )
    exp = pd.merge_asof(
        lpdf, rpdf, on="t", by="uid", direction="nearest", suffixes=("", "_r")
    )
    expected = sorted(
        (r.uid, r.t, None if pd.isna(r.rv) else int(r.rv)) for r in exp.itertuples()
    )
    ldf = generate_input(spark, sorted(left_rows), "uid bigint, t bigint")
    rdf = generate_input(
        spark, [(u, t, t * 10) for u, t in sorted(right_rows)],
        "uid bigint, t bigint, rv bigint",
    )
    out = asof_join(
        ldf, rdf, on="uid", left_on="t", right_on="t", right_cols=["rv"],
        direction="nearest",
    )
    got = sorted((r.uid, r.t, r.rv) for r in out.collect())
    assert got == expected
