"""User-facing pipeline-testing utilities: the PySpark re-expression
of the reference's testing API
(/root/reference/src/clj/datasplash/testing.clj and
testing/assert.clj) — a session factory tuned for tests, input
generation, and PAssert-style golden-output assertions.

Where Beam needs a dedicated ``TestPipeline`` with explicit
``PAssert`` transforms evaluated at run time (assertions are deferred
graph nodes), Spark's eager ``collect()`` lets assertions be plain
function calls over materialized results — same contract
(order-insensitive multiset semantics, singleton/map/multimap
coercions), radically simpler machinery. Raises ``AssertionError``
like the reference (assert.clj:3-5 documents the same).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession


def test_session(
    app_name: str = "datasplash-spark-test",
    parallelism: int = 4,
    **conf: str,
) -> SparkSession:
    """``test-pipeline`` analog (testing.clj:24-28): a local session
    sized for unit tests — small core count and shuffle-partition
    count (job latency, not throughput, dominates test wall time),
    UI off, AQE on (the production default, so plans under test match
    plans in production). Extra ``conf`` kwargs pass through."""
    b = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in conf.items():
        b = b.config(k.replace("__", "."), v)
    return b.getOrCreate()


def generate(
    spark: SparkSession, values: list, schema=None
) -> DataFrame:
    """``datasplash.testing/generate`` (testing.clj:10-22): input
    generation for tests. The reference wraps ``generate-input`` with
    a uniquified transform name because Beam's TestPipeline rejects
    duplicate names; Spark has no named-transform constraint, so this
    simply delegates — kept so ported test code maps one-to-one."""
    from .sources.files import generate_input

    return generate_input(spark, values, schema)


# --------------------------------------------------------- assertions

def _hashable(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, set):
        return frozenset(_hashable(x) for x in v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def _rows(data) -> list[tuple]:
    """Accept a DataFrame, an object-mode PCollection, or a plain
    iterable of rows — every assertion below takes any of the three."""
    if isinstance(data, DataFrame):
        return [tuple(r) for r in data.collect()]
    collect = getattr(data, "collect", None)
    if collect is not None:  # object-mode PCollection
        out = []
        for v in collect():
            out.append(tuple(v) if isinstance(v, tuple) else (v,))
        return out
    return [tuple(r) if isinstance(r, tuple) else (r,) for r in data]


def rows_multiset(data) -> Counter:
    return Counter(_hashable(r) for r in _rows(data))


def contains_only(data, expected: list) -> None:
    """``contains-only`` (assert.clj:81-92): order-insensitive
    multiset equality — duplicates count."""
    actual = rows_multiset(data)
    want = Counter(
        _hashable(tuple(r) if isinstance(r, tuple) else (r,))
        for r in expected
    )
    assert actual == want, f"multiset mismatch:\n got {actual}\nwant {want}"


def is_empty(data) -> None:
    """``is-empty`` (assert.clj:96-99)."""
    rows = _rows(data)
    assert not rows, f"expected empty, got {len(rows)} rows: {rows[:5]}"


def equals_to(data, expected_row) -> None:
    """``equals-to`` on a singleton (assert.clj:101-105, as-singleton
    assert.clj:36-40): exactly one element, equal to ``expected_row``."""
    rows = _rows(data)
    assert len(rows) == 1, f"expected singleton, got {len(rows)} rows"
    want = (
        tuple(expected_row)
        if isinstance(expected_row, tuple)
        else (expected_row,)
    )
    assert _hashable(rows[0]) == _hashable(want), (
        f"singleton mismatch: got {rows[0]!r}, want {want!r}"
    )


def as_map(data) -> dict:
    """``as-map`` (assert.clj:42-46): coerce a (k, v) collection to a
    dict, asserting keys are unique."""
    rows = _rows(data)
    out = {}
    for r in rows:
        assert len(r) == 2, f"as_map needs (k, v) rows, got {r!r}"
        k, v = r
        assert k not in out, f"duplicate key {k!r} in as_map"
        out[k] = v
    return out


def as_multimap(data) -> dict:
    """``as-multimap`` (assert.clj:48-52): coerce a (k, v) collection
    to {k: multiset-of-values} (order under a key is not meaningful)."""
    rows = _rows(data)
    out: dict = {}
    for r in rows:
        assert len(r) == 2, f"as_multimap needs (k, v) rows, got {r!r}"
        k, v = r
        out.setdefault(k, Counter())[_hashable(v)] += 1
    return out


def satisfies(data, predicate) -> None:
    """Arbitrary-predicate assertion (the reference's
    PredicateMatcher seam, assert.clj:54-79)."""
    rows = _rows(data)
    assert predicate(rows), f"predicate failed on {len(rows)} rows"
