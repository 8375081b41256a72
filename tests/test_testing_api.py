"""The shipped testing API (datasplash_spark.testing) — the PySpark
re-expression of the reference's datasplash.testing namespace
(testing.clj + testing/assert.clj, cited per function)."""

from __future__ import annotations

import pytest

from datasplash_spark.testing import (
    as_map,
    as_multimap,
    contains_only,
    equals_to,
    generate,
    is_empty,
    satisfies,
)


def test_generate_and_contains_only(spark):
    """generate (testing.clj:10-22) + contains-only multiset
    semantics (assert.clj:81-92): duplicates count; order does not."""
    df = generate(spark, [(1, "a"), (2, "b"), (1, "a")], "k int, v string")
    contains_only(df, [(2, "b"), (1, "a"), (1, "a")])
    with pytest.raises(AssertionError):
        contains_only(df, [(1, "a"), (2, "b")])  # multiplicity matters


def test_empty_and_singleton(spark):
    df = generate(spark, [], "k int")
    is_empty(df)
    one = generate(spark, [(7, "x")], "k int, v string")
    equals_to(one, (7, "x"))
    with pytest.raises(AssertionError):
        is_empty(one)
    with pytest.raises(AssertionError):
        equals_to(generate(spark, [(1,), (2,)], "k int"), (1,))


def test_as_map_and_multimap(spark):
    """as-map (assert.clj:42-46) requires unique keys; as-multimap
    (assert.clj:48-52) collects value multisets per key."""
    kv = generate(spark, [("a", 1), ("b", 2)], "k string, v int")
    assert as_map(kv) == {"a": 1, "b": 2}
    dup = generate(spark, [("a", 1), ("a", 2)], "k string, v int")
    with pytest.raises(AssertionError, match="duplicate key"):
        as_map(dup)
    mm = as_multimap(
        generate(spark, [("a", 1), ("a", 1), ("b", 3)], "k string, v int")
    )
    assert mm["a"][1] == 2 and mm["b"][3] == 1


def test_assertions_accept_objectmode_pcollections(spark):
    """Every assertion takes DataFrames, object-mode PCollections, or
    plain iterables — the reference's asserts work on any PCollection."""
    from datasplash_spark.objectmode import PCollection

    pc = PCollection.from_items(spark, [("a", 1), ("b", 2)])
    contains_only(pc, [("b", 2), ("a", 1)])
    assert as_map(pc) == {"a": 1, "b": 2}
    satisfies(pc, lambda rows: len(rows) == 2)
    contains_only([("x",)], ["x"])  # plain iterable + scalar expected


def test_test_session_factory():
    """test-pipeline analog (testing.clj:24-28): tuned local session;
    getOrCreate under an existing session still yields a working one."""
    from datasplash_spark.testing import test_session

    s = test_session()
    assert s.range(3).count() == 3
