"""Grouping/combining tests — ports of
/root/reference/test/datasplash/api_test.clj:546-558, 683-712,
724-776, 778-937 golden shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasplash_spark import operators as ops
from tests.helpers import contains_only, equals_to


def ints_df(spark):
    return spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)], "x long")


def test_group_by_key(spark):
    src = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], "key string, value long"
    )
    out = ops.group_by_key(src).select(
        "key", F.sort_array("values").alias("values")
    )
    contains_only(out, [("a", [1, 1]), ("b", [2, 2])])


def test_dgroup_by_ragged(spark):
    # api_test.clj:546-558: ragged maps {:key :a :val 42} … {:key :a :lue 65}
    src = spark.createDataFrame(
        [("a", 42, None), ("b", 56, None), ("a", None, 65)],
        "key string, val long, lue long",
    )
    out = ops.dgroup_by(src, "key")
    rows = {r["key"]: r["values"] for r in out.collect()}
    assert len(rows["a"]) == 2 and len(rows["b"]) == 1


def test_combine_global_sum(spark):
    # api_test.clj:724-732: (combine + pcoll) => 15
    out = ops.combine(ints_df(spark), F.sum("x").alias("sum"))
    equals_to(out, (15,))


def test_combine_by_and_juxt(spark):
    # api_test.clj:761-776: juxt of combiners in one pass
    src = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = ops.combine_by(
        src,
        "k",
        *ops.juxt(
            ops.count_fn().alias("cnt"),
            ops.sum_fn("v").alias("sum"),
            ops.mean_fn("v").alias("mean"),
            ops.min_fn("v").alias("min"),
            ops.max_fn("v").alias("max"),
        ),
    )
    contains_only(
        out,
        [("a", 2, 4.0, 2.0, 1.0, 3.0), ("b", 1, 10.0, 10.0, 10.0, 10.0)],
    )


def test_combiner_mapper_predicate_semantics(spark):
    # SURVEY §7.4: mapper applies ONLY to elements passing predicate;
    # failing elements are excluded entirely (core.clj:1987,1997-1999).
    df = ints_df(spark)
    out = ops.combine(
        df,
        ops.count_fn(predicate=F.col("x") % 2 == 1).alias("cnt_odd"),
        ops.count_fn(
            predicate=F.col("x") % 2 == 1, mapper=F.col("x") * 0 + 2
        ).alias("weighted"),
        ops.sum_fn(F.col("x") * 10, predicate=F.col("x") > 3).alias("sum_gt3"),
        ops.mean_fn("x", predicate=F.col("x") > 100).alias("mean_empty"),
    )
    equals_to(out, (3, 6, 90, 0.0))


def test_frequencies(spark):
    # api_test.clj:930-937
    src = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    contains_only(ops.frequencies(src, "v"), [("a", 2), ("b", 1)])


def test_frequencies_by(spark):
    src = spark.createDataFrame(
        [("k1", "x"), ("k1", "x"), ("k1", "y"), ("k2", "z")],
        "k string, v string",
    )
    rows = {r["key"]: r["freqs"] for r in ops.frequencies_by(src, "k", "v").collect()}
    assert rows == {"k1": {"x": 2, "y": 1}, "k2": {"z": 1}}


def test_distinct_and_distinct_by(spark):
    # api_test.clj:683-704
    src = spark.createDataFrame([(1,), (1,), (2,)], "x long")
    contains_only(ops.distinct(src), [(1,), (2,)])

    kv = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    )
    out = ops.distinct_by(kv, "k")
    rows = out.collect()
    assert len(rows) == 2 and {r["k"] for r in rows} == {"a", "b"}


def test_sample(spark):
    # api_test.clj:706-712
    df = ints_df(spark)
    assert ops.sample(df, 3, scope="any").count() == 3
    got = ops.sample(df, 3, scope="global").collect()
    assert len(got) == 3 and len({r["x"] for r in got}) == 3
    kv = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", 1)], "k string, v long"
    )
    per_key = ops.sample(kv, 2, scope="per-key", key="k")
    counts = {
        r["k"]: r["n"]
        for r in per_key.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 2, "b": 1}


def test_salted_agg_matches_plain_collect(spark):
    src = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 1)], "k string, v long"
    )
    out = ops.salted_agg(
        src,
        "k",
        [
            (
                F.collect_list("v").alias("p0"),
                lambda c: F.flatten(F.collect_list(F.col(c))).alias("values"),
            )
        ],
        salt_buckets=4,
    )
    rows = {r["key"]: sorted(r["values"]) for r in out.collect()}
    assert rows == {"hot": list(range(100)), "cold": [1]}


def test_top_k_global_and_per_key(spark):
    """Beyond-reference ordering op (SURVEY §2.9): global top-k is
    TakeOrderedAndProject (no full sort); per-key is rank-over-window."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("b", 9), ("b", 2)], "k string, v long"
    )
    top2 = ops.top_k(df, 2, F.col("v").desc())
    assert [(r.k, r.v) for r in top2.collect()] == [("b", 9), ("a", 5)]
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        top2.explain()
    assert "TakeOrderedAndProject" in buf.getvalue()

    per_key = ops.top_k(df, 1, F.col("v").desc(), key="k")
    assert {(r.k, r.v) for r in per_key.collect()} == {("a", 5), ("b", 9)}


def test_approx_combiners_mergeable_and_sane(spark):
    """HLL distinct + GK quantiles: mergeable sketches that partial-agg
    (plan shows partial_ before the Exchange); values sane vs exact."""
    df = spark.createDataFrame(
        [("g", i % 50) for i in range(1000)], "k string, v long"
    ).repartition(8)
    out = ops.combine_by(
        df,
        "k",
        ops.approx_distinct_fn("v").alias("nd"),
        ops.approx_quantile_fn("v", [0.5]).alias("med"),
    ).collect()[0]
    assert abs(out.nd - 50) <= 5  # within HLL rsd (5%) of exact
    assert 20 <= out.med[0] <= 30

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ops.combine_by(
            df, "k", ops.approx_distinct_fn("v").alias("nd")
        ).explain()
    assert "partial_approx_count_distinct" in buf.getvalue()


def test_sum_fn_empty_is_zero(spark):
    """Reference parity: (sum-fn) init is (constantly 0), so a group
    where the predicate excludes everything sums to 0, not NULL —
    consistent with count_fn / mean_fn."""
    from datasplash_spark.operators.grouping import combine, juxt, sum_fn, mean_fn, count_fn

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    row = combine(
        df,
        *juxt(
            sum_fn("v", predicate=F.col("v") > 100).alias("s"),
            mean_fn("v", predicate=F.col("v") > 100).alias("m"),
            count_fn(predicate=F.col("v") > 100).alias("c"),
        ),
    ).collect()[0]
    assert (row.s, row.m, row.c) == (0.0, 0.0, 0)


def test_sessionize_gap_islands(spark):
    """New session exactly when gap > threshold; 0-based per key."""
    from datasplash_spark.operators import sessionize
    from datasplash_spark.sources import generate_input

    rows = [
        ("a", 0.0), ("a", 10.0), ("a", 100.0), ("a", 105.0), ("a", 300.0),
        ("b", 0.0),
    ]
    df = generate_input(spark, rows, "k string, t double")
    got = {
        (r.k, r.t): r.session_id
        for r in sessionize(df, "k", "t", gap_seconds=50).collect()
    }
    assert got == {
        ("a", 0.0): 0, ("a", 10.0): 0,
        ("a", 100.0): 1, ("a", 105.0): 1,
        ("a", 300.0): 2,
        ("b", 0.0): 0,
    }


def test_stratified_sample_deterministic_exact_counts(spark):
    """Deterministic path: exact ceil(frac·n) per stratum, repeatable;
    strata missing from fractions drop; native sampleBy path returns
    a plausible Bernoulli subset."""
    from datasplash_spark.operators import stratified_sample
    from datasplash_spark.sources import generate_input

    rows = [(i, "a" if i < 100 else "b" if i < 130 else "c") for i in range(150)]
    df = generate_input(spark, rows, "id bigint, grp string")
    out = stratified_sample(
        df, "grp", {"a": 0.25, "b": 0.5}, seed=3, deterministic_by="id"
    )
    got = [(r.id, r.grp) for r in out.collect()]
    by_grp = {}
    for _id, g in got:
        by_grp[g] = by_grp.get(g, 0) + 1
    assert by_grp == {"a": 25, "b": 15}  # exact ceil counts, no 'c'
    again = [(r.id, r.grp) for r in stratified_sample(
        df, "grp", {"a": 0.25, "b": 0.5}, seed=3, deterministic_by="id"
    ).collect()]
    assert sorted(got) == sorted(again)  # reproducible

    bern = stratified_sample(df, "grp", {"a": 0.3}, seed=3).collect()
    assert all(r.grp == "a" for r in bern)


def test_pivot_and_rollup(spark):
    from datasplash_spark.operators import pivot_table, rollup_agg
    from datasplash_spark.sources import generate_input

    df = generate_input(
        spark,
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4), ("a", "x", 8)],
        "k string, p string, v bigint",
    )
    piv = {
        r.key: (r.x, r.y)
        for r in pivot_table(df, "k", "p", F.sum("v"), values=["x", "y"]).collect()
    }
    assert piv == {"a": (9, 2), "b": (4, None)}

    roll = {
        (r.k, r.p, r.gid): r.s
        for r in rollup_agg(df, ["k", "p"], F.sum("v").alias("s")).collect()
    }
    assert roll[("a", "x", 0)] == 9
    assert roll[("a", None, 1)] == 11   # subtotal over k='a'
    assert roll[(None, None, 3)] == 15  # grand total
    cube = rollup_agg(df, ["k", "p"], F.sum("v").alias("s"), cube=True)
    assert cube.count() == 8  # 2x2 pairs + 2 k-subtotals + 2... all subsets


def test_profile_table_nulls_and_distincts(spark):
    from datasplash_spark.operators import profile_table
    from datasplash_spark.sources import generate_input

    df = generate_input(
        spark,
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "x bigint, s string",
    )
    got = {r.column: (r.n_rows, r.n_nonnull, r.n_distinct, r.min_value, r.max_value)
           for r in profile_table(df).collect()}
    assert got == {
        "x": (4, 3, 3, "1", "3"),
        "s": (4, 3, 2, "a", "b"),
    }


def test_hash_split_deterministic_and_proportional(spark):
    from datasplash_spark.operators import hash_split
    from datasplash_spark.sources import generate_input

    df = generate_input(spark, [(i,) for i in range(2000)], "id bigint")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.id: r.split for r in hash_split(df, w, "id", seed=5).collect()}
    b = {r.id: r.split for r in hash_split(df, w, "id", seed=5).collect()}
    assert a == b  # reproducible
    from collections import Counter

    frac = {k: v / 2000 for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # stability under growth: adding rows never moves existing ids
    grown = generate_input(spark, [(i,) for i in range(4000)], "id bigint")
    c = {r.id: r.split for r in hash_split(grown, w, "id", seed=5).collect()}
    assert all(c[i] == a[i] for i in a)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.6}, "id")


def test_token_budget_sample_exact_prefix(spark):
    from datasplash_spark.operators import token_budget_sample
    from datasplash_spark.sources import generate_input

    df = generate_input(
        spark,
        [(i, "a" if i % 2 == 0 else "b", 10) for i in range(100)],
        "doc_id bigint, src string, n_tok bigint",
    )
    out = token_budget_sample(df, "src", {"a": 100, "b": 35}, "n_tok", seed=3)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r.doc_id)
    # budgets respected exactly: 10 tokens/row -> 10 rows of a, 3 of b
    assert len(by_src["a"]) == 10
    assert len(by_src["b"]) == 3
    # deterministic: same seed -> same subset; different seed -> (almost
    # surely) different subset
    again = {r.doc_id for r in token_budget_sample(
        df, "src", {"a": 100, "b": 35}, "n_tok", seed=3).collect()}
    assert again == {r.doc_id for r in rows}
    other = {r.doc_id for r in token_budget_sample(
        df, "src", {"a": 100, "b": 35}, "n_tok", seed=4).collect()}
    assert other != again
    # strata without a budget are dropped entirely
    assert not {r.src for r in rows} - {"a", "b"}


def test_zorder_key_matches_reference_interleave(spark):
    """zorder_key equals a numpy percentile-rank + bit-interleave
    reference on integer data (cuts are exact rationals in both);
    zorder_layout yields disjoint, ordered zkey ranges per
    partition."""
    import numpy as np

    from datasplash_spark.operators import zorder_key, zorder_layout
    from datasplash_spark.sources import generate_input

    rng = np.random.RandomState(3)
    rows = [
        (i, int(rng.randint(0, 1000)), int(rng.randint(0, 50)))
        for i in range(300)
    ]
    df = generate_input(spark, rows, "id bigint, a bigint, b bigint")
    got = {
        r.id: r.zkey
        for r in zorder_key(df, ["a", "b"], bits=4).collect()
    }

    bits, d = 4, 2
    avals = np.array([r[1] for r in rows], dtype=float)
    bvals = np.array([r[2] for r in rows], dtype=float)
    probs = [100.0 * i / 16 for i in range(1, 16)]
    ca = np.percentile(avals, probs)
    cb = np.percentile(bvals, probs)

    def rank(v, cuts):
        return int(sum(v >= c for c in cuts))

    for i, a, b in rows:
        ra, rb = rank(a, ca), rank(b, cb)
        z = 0
        for bit in range(bits):
            z += ((ra >> bit) & 1) << (bit * d + 1)
            z += ((rb >> bit) & 1) << (bit * d + 0)
        assert got[i] == z, (i, a, b)

    parts = (
        zorder_layout(df, ["a", "b"], 4, bits=4, approx=False)
        .select(F.spark_partition_id().alias("p"), "zkey")
        .collect()
    )
    by_p: dict[int, list] = {}
    for r in parts:
        by_p.setdefault(r.p, []).append(r.zkey)
    ranges = sorted((min(v), max(v)) for v in by_p.values())
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, ordered z-ranges

    import pytest as _pt

    with _pt.raises(ValueError):
        zorder_key(df, [], bits=4)
    with _pt.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=40)


def test_zorder_key_null_contract(spark):
    """ADVICE r4: NULL cells rank 0 (NULLS FIRST, explicit not
    incidental) and an all-NULL column degrades to rank 0 instead of
    poisoning every zkey to NULL (which would funnel the whole
    dataset into ONE range partition)."""
    from datasplash_spark.operators import zorder_key
    from datasplash_spark.sources import generate_input

    df = generate_input(
        spark,
        [(1, None, 10), (2, 5, 20), (3, 9, None), (4, None, None)],
        "id bigint, a bigint, b bigint",
    )
    got = {r.id: r.zkey for r in zorder_key(df, ["a", "b"], bits=2).collect()}
    assert None not in got.values()
    # NULL a clusters with the minimum a: rows 1 and 4 share a-rank 0
    nn = {r.id: r.zkey for r in zorder_key(df, ["a"], bits=2).collect()}
    assert nn[1] == nn[4] == 0
    assert nn[2] < nn[3]  # non-NULLs still rank by value

    # all-NULL column: zkey never NULL, other columns still spread
    allnull = generate_input(
        spark,
        [(i, None, i * 7 % 40) for i in range(1, 9)],
        "id bigint, a bigint, b bigint",
    )
    rows = zorder_key(allnull, ["a", "b"], bits=2).collect()
    assert all(r.zkey is not None for r in rows)
    assert len({r.zkey for r in rows}) > 1


def test_importance_resample_deterministic_proportional(spark):
    """Bernoulli weight-proportional selection: reproducible across
    invocations, weight-monotone in aggregate, zero/NULL/negative
    weights never admitted, and certainty rows (n*w > sum(w)) always
    admitted. Audit mode keeps every row with the 0/1 flag."""
    from datasplash_spark.sources import generate_input

    rows = [(i, float((i % 10) + 1)) for i in range(1, 401)]
    rows += [(1001, None), (1002, 0.0), (1003, -5.0)]
    df = generate_input(spark, rows, "id bigint, w double")

    got1 = {r.id for r in ops.importance_resample(df, 60, "w", "id").collect()}
    got2 = {r.id for r in ops.importance_resample(df, 60, "w", "id").collect()}
    assert got1 == got2                      # deterministic
    assert {1001, 1002, 1003}.isdisjoint(got1)
    # aggregate weight-monotonicity: the high-weight half of the
    # 1..10 weight classes must be admitted strictly more often
    lo = sum(1 for i in got1 if (i % 10) + 1 <= 5)
    hi = sum(1 for i in got1 if (i % 10) + 1 > 5)
    assert hi > lo
    # expected size ~n=60 (sd ~7; very loose band)
    assert 30 <= len(got1) <= 95

    audit = ops.importance_resample(df, 60, "w", "id", keep_name="kept")
    assert audit.count() == len(rows)
    assert {r.id for r in audit.filter("kept = 1").collect()} == got1

    # certainty: a row with n*w > sum(w) is always admitted, and the
    # remaining expectation shrinks accordingly (documented contract)
    big = generate_input(
        spark,
        rows + [(2001, 10_000.0)],
        "id bigint, w double",
    )
    got_big = {r.id for r in ops.importance_resample(big, 60, "w", "id").collect()}
    assert 2001 in got_big
    assert len(got_big) < len(got1)  # mass shifted to the heavy row


def test_weighted_sample_matches_reference_es(spark):
    """Efraimidis-Spirakis exact-size draw equals a pure-Python
    replica using the same md5 uniform (key = ln(u)/w, top-n by key
    desc, id tiebreak); non-positive/NULL weights never win."""
    import hashlib
    import math

    from datasplash_spark.sources import generate_input

    rows = [(i, float(((i * 7) % 13) + 1)) for i in range(1, 201)]
    rows += [(900, 0.0), (901, -1.0), (902, None)]
    df = generate_input(spark, rows, "id bigint, w double")
    got = [r.id for r in ops.weighted_sample(df, 20, "w", "id", seed=9).collect()]
    assert len(got) == 20

    def u_of(i):
        h = hashlib.md5(f"9{i}".encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32)

    keyed = []
    for i, w in rows:
        if w is None or w <= 0:
            continue
        keyed.append((math.log(max(u_of(i), 2.0 ** -33)) / w, i))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    assert sorted(got) == sorted(i for _, i in keyed[:20])

    # per-key scope: n winners per key, same order within each key
    kdf = generate_input(
        spark,
        [(i, "ab"[i % 2], float(((i * 7) % 13) + 1)) for i in range(1, 101)],
        "id bigint, k string, w double",
    )
    per = ops.weighted_sample(kdf, 5, "w", "id", seed=9, key="k")
    by_k = {}
    for r in per.collect():
        by_k.setdefault(r.k, []).append(r.id)
    assert all(len(v) == 5 for v in by_k.values()) and set(by_k) == {"a", "b"}
    for kname, ids in by_k.items():
        ranked = []
        for i in range(1, 101):
            if "ab"[i % 2] != kname:
                continue
            w = float(((i * 7) % 13) + 1)
            ranked.append((math.log(max(u_of(i), 2.0 ** -33)) / w, i))
        ranked.sort(key=lambda t: (-t[0], t[1]))
        assert sorted(ids) == sorted(i for _, i in ranked[:5])


def test_quantile_buckets_per_key_matches_numpy(spark):
    """Per-key buckets equal numpy per-key percentile cuts; a single
    key degenerates to the global quantile_buckets."""
    import numpy as np

    from datasplash_spark.sources import generate_input

    rng = np.random.RandomState(4)
    rows = [
        (i, ["a", "b", "c"][i % 3], float(rng.randint(0, 1000)))
        for i in range(240)
    ]
    df = generate_input(spark, rows, "id bigint, k string, v double")
    got = {
        r.id: r.qbucket
        for r in ops.quantile_buckets_per_key(df, "v", 4, "k").collect()
    }
    for key in ("a", "b", "c"):
        vals = np.array([v for i, k, v in rows if k == key])
        cuts = np.percentile(vals, [25.0, 50.0, 75.0])
        for i, k, v in rows:
            if k != key:
                continue
            assert got[i] == 1 + int(sum(v >= c for c in cuts)), (i, v)

    one = generate_input(
        spark, [(i, "x", float(i)) for i in range(50)],
        "id bigint, k string, v double",
    )
    per_key = {
        r.id: r.qbucket
        for r in ops.quantile_buckets_per_key(one, "v", 3, "k").collect()
    }
    global_ = {
        r.id: r.qbucket for r in ops.quantile_buckets(one, "v", 3).collect()
    }
    assert per_key == global_

    # NULL keys are a key like any other (null-safe join, no drops)
    withnull = generate_input(
        spark,
        [(1, None, 1.0), (2, None, 9.0), (3, "x", 5.0)],
        "id bigint, k string, v double",
    )
    got_null = {
        r.id: r.qbucket
        for r in ops.quantile_buckets_per_key(withnull, "v", 2, "k").collect()
    }
    assert got_null == {1: 1, 2: 2, 3: 2}  # NULL group has its own cuts


def test_skew_report_counts_and_salt(spark):
    """skew_report: ordered by count desc, NULL keys reported, frac
    sums to <=1 over top_n, salt = ceil(n/target) with floor 1."""
    from datasplash_spark.sources import generate_input

    rows = (
        [("hot",)] * 50 + [("warm",)] * 10 + [("cold",)] * 2 + [(None,)] * 5
    )
    df = generate_input(
        spark, [(i, k) for i, (k,) in enumerate(rows)], "id bigint, k string"
    )
    got = ops.skew_report(df, "k", top_n=3, target_rows_per_task=20).collect()
    assert [(r.key, r.n, r.salt) for r in got] == [
        ("hot", 50, 3),
        ("warm", 10, 1),
        (None, 5, 1),
    ]
    assert abs(got[0].frac - 50 / 67) < 1e-9


def test_importance_resample_monotone_in_n(spark):
    """For a fixed seed, the admitted set is MONOTONE in n (the keep
    test u < n*w/total only relaxes as n grows) — so budgets can be
    raised without churning previously admitted documents."""
    from datasplash_spark.sources import generate_input

    df = generate_input(
        spark,
        [(i, float((i * 13) % 29 + 1)) for i in range(1, 301)],
        "id bigint, w double",
    )
    sets = []
    for n in (20, 60, 180):
        sets.append(
            {r.id for r in ops.importance_resample(df, n, "w", "id").collect()}
        )
    assert sets[0] <= sets[1] <= sets[2]
    assert len(sets[0]) < len(sets[2])

    import pytest as _pt

    with _pt.raises(ValueError):
        ops.importance_resample(df, 0, "w", "id")
    with _pt.raises(ValueError):
        ops.weighted_sample(df, -1, "w", "id")


def test_importance_resample_huge_weights_no_overflow(spark):
    """ADVICE r5: Σ(w·1e9) beyond BIGINT (9.2e18) must not wrap or
    throw — the nano sum accumulates in decimal(38,0). 200 rows of
    w = 1e8 give Σnano = 2e19 > 2^63; every row's p = n·w/Σw = 1
    here (uniform weights, n = 200 = rows), so ALL rows admit — a
    wrapped (negative) Σ would admit none."""
    from datasplash_spark.sources import generate_input

    df = generate_input(
        spark,
        [(i, 1.0e8) for i in range(200)],
        "id bigint, w double",
    )
    got = ops.importance_resample(df, 200, "w", "id").count()
    assert got == 200
    # and a skewed variant keeps proportionality with huge weights:
    # one row at 199·1e8 + 199 rows at ~0 weight relative share
    df2 = generate_input(
        spark,
        [(0, 199.0e8)] + [(i, 1.0e8) for i in range(1, 200)],
        "id bigint, w double",
    )
    kept = {r.id for r in ops.importance_resample(df2, 2, "w", "id").collect()}
    assert 0 in kept  # p_0 = 2*199e8/398e8 = 1 -> always admitted


def test_weighted_sample_deterministic_mode(spark):
    """deterministic=True: the es_key uses the engine-exact atanh-
    series log — pure-Python reimplementation of the series (same
    literal coefficients, same op order) must select the identical
    winners; and the selection approximates the libm draw (the
    series is within ~1e-8 of true ln, so winners rarely differ)."""
    import hashlib

    from datasplash_spark.sources import generate_input

    rows = [(i, float((i * 37) % 101 + 1)) for i in range(1, 401)]
    df = generate_input(spark, rows, "id bigint, w double")

    def py_key(i, w, seed=42):
        m = int(hashlib.md5(f"{seed}{i}".encode()).hexdigest()[:8], 16)
        m = max(m, 1)
        b = m.bit_length()
        t = float(m) / float(1 << (b - 1))
        z = (t - 1.0) / (t + 1.0)
        s = z * z
        cs = [0.3333333333333333, 0.2, 0.14285714285714285,
              0.1111111111111111, 0.09090909090909091,
              0.07692307692307693]
        poly = cs[-1]
        for c in reversed(cs[:-1]):
            poly = c + s * poly
        ln_t = 2.0 * z * (1.0 + s * poly)
        ln_u = ln_t + float(b - 33) * 0.6931471805599453
        return ln_u / w

    expect = {
        i
        for i, _ in sorted(
            ((i, py_key(i, w)) for i, w in rows),
            key=lambda kv: (-kv[1], kv[0]),
        )[:50]
    }
    got = {
        r.id
        for r in ops.weighted_sample(
            df, 50, "w", "id", deterministic=True
        ).collect()
    }
    assert got == expect
    libm = {r.id for r in ops.weighted_sample(df, 50, "w", "id").collect()}
    assert len(got & libm) >= 48  # series ≈ ln: near-identical draw

    # per-key deterministic draw: 2 winners per bucket of 4 keys
    kdf = df.withColumn("k", F.pmod(F.col("id"), F.lit(4)))
    per = ops.weighted_sample(
        kdf, 2, "w", "id", key="k", deterministic=True
    ).collect()
    assert len(per) == 8
    from collections import Counter

    assert set(Counter(r.k for r in per).values()) == {2}


def test_domain_reweight_matches_reference(spark):
    """domain_reweight equals the pure-Python multiplicative-weights
    recurrence; harder domains gain weight; constant losses are a
    fixed point (x=0 guard)."""
    from datasplash_spark.sources import generate_input

    losses = [("web", 4_500_000_000), ("code", 2_000_000_000),
              ("books", 3_000_000_000), ("wiki", 2_500_000_000)]
    df = generate_input(spark, losses, "domain string, loss_nano bigint")
    got = {
        r.domain: r.weight_nano
        for r in ops.domain_reweight(df, iterations=5, eta=0.1).collect()
    }

    w = {d: 10 ** 9 for d, _ in losses}
    loss = dict(losses)
    n = len(losses)
    for _ in range(5):
        wl = sum(w[d] * loss[d] for d in w)
        ws = sum(w.values())
        m = float(wl) / float(ws)
        exc = {d: float(loss[d]) - m for d in w}
        x = max(abs(e) for e in exc.values())
        if x > 0:
            w = {
                d: round(float(w[d]) * (1.0 + 0.1 * exc[d] / x))
                for d in w
            }
        s = sum(w.values())
        w = {d: round(float(w[d]) * (n * 1e9 / float(s))) for d in w}
    assert got == w
    assert got["web"] > got["code"]  # hardest domain gains weight

    const = generate_input(
        spark, [("a", 5), ("b", 5)], "domain string, loss_nano bigint"
    )
    cw = {
        r.domain: r.weight_nano
        for r in ops.domain_reweight(const, iterations=3).collect()
    }
    assert cw == {"a": 10 ** 9, "b": 10 ** 9}
