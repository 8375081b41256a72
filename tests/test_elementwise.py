"""Element-wise operator tests — ports of
/root/reference/test/datasplash/api_test.clj:280-544 shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasplash_spark import operators as ops
from tests.helpers import contains_only

INTS = [(1,), (2,), (3,), (4,), (5,)]


def ints_df(spark):
    return spark.createDataFrame(INTS, "x long")


def test_dmap(spark):
    # api_test.clj:327-340 (inc over ints)
    df = ops.dmap(ints_df(spark), (F.col("x") + 1).alias("x"))
    contains_only(df, [(2,), (3,), (4,), (5,), (6,)])


def test_dfilter(spark):
    # api_test.clj:402-410 (even?)
    df = ops.dfilter(ints_df(spark), F.col("x") % 2 == 0)
    contains_only(df, [(2,), (4,)])


def test_dkeep_keeps_false(spark):
    # api_test.clj:412-419: keep drops nil but KEEPS false
    src = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    expr = F.when(F.col("x") == 1, F.lit(None).cast("boolean")).otherwise(
        F.col("x") % 2 == 0
    )
    df = ops.dkeep(src, expr)
    contains_only(df, [(True,), (False,)])


def test_dmapcat(spark):
    # api_test.clj mapcat: x -> [x, x*10]
    df = ops.dmapcat(
        ints_df(spark).limit(2).orderBy("x"),
        F.array(F.col("x"), F.col("x") * 10),
    )
    contains_only(df, [(1,), (10,), (2,), (20,)])


def test_dmap_kv_and_with_keys(spark):
    # api_test.clj:439-466 id/rank keying
    src = spark.createDataFrame(
        [("a", 1), ("b", 2)], "id string, rank long"
    )
    kv = ops.dmap_kv(src, "id", "rank")
    contains_only(kv, [("a", 1), ("b", 2)])
    keyed = ops.with_keys(src, F.upper("id"))
    contains_only(keyed, [("A", "a", 1), ("B", "b", 2)])


def test_partition_by(spark):
    # api_test.clj:486-498: route elements into N outputs
    parts = ops.partition_by(ints_df(spark), F.col("x") % 2, 2)
    contains_only(parts[0], [(2,), (4,)])
    contains_only(parts[1], [(1,), (3,), (5,)])


def test_side_outputs(spark):
    # api_test.clj:532-544: tags :simple (x) and :multi (10x)
    outs = ops.side_outputs(
        ints_df(spark),
        {"simple": F.col("x"), "multi": F.col("x") * 10},
    )
    contains_only(outs["simple"], [(1,), (2,), (3,), (4,), (5,)])
    contains_only(outs["multi"], [(10,), (20,), (30,), (40,), (50,)])


def test_side_input_broadcast(spark):
    # api_test.clj:500-530: broadcast map side input
    mapping = {1: "a", 2: "b", 3: "c", 4: "d", 5: "e"}
    b = spark.sparkContext.broadcast(mapping)
    mapping_expr = F.create_map(
        *[F.lit(x) for kv in b.value.items() for x in kv]
    )
    df = ops.dmap(ints_df(spark), mapping_expr[F.col("x")].alias("v"))
    contains_only(df, [("a",), ("b",), ("c",), ("d",), ("e",)])


def test_side_outputs_predicate_routes_elements(spark):
    """Boolean tags route whole elements (the reference's tag shape,
    core.clj:302-360); non-boolean tags project."""
    from datasplash_spark import operators as ops

    df = spark.createDataFrame([(i, i * 10) for i in range(6)], "x int, y int")
    outs = ops.side_outputs(
        df,
        {"big": F.col("x") > 2, "doubled": (F.col("y") * 2)},
    )
    assert sorted(r.x for r in outs["big"].collect()) == [3, 4, 5]
    assert outs["big"].columns == ["x", "y"]  # whole elements
    assert sorted(r.doubled for r in outs["doubled"].collect()) == [
        0, 20, 40, 60, 80, 100,
    ]


def test_with_keys_collision_raises(spark):
    from datasplash_spark import operators as ops

    df = spark.createDataFrame([(1, 2)], "key int, v int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key_name"):
        ops.with_keys(df, F.col("v"))
    ok = ops.with_keys(df, F.col("v"), key_name="k2")
    assert ok.columns == ["k2", "key", "v"]
