"""PAssert-style golden-output helpers.

Ports the reference's assertion surface
(/root/reference/src/clj/datasplash/testing/assert.clj:16-105):
``contains-only`` = order-insensitive multiset equality;
``is-empty``; ``equals-to`` for singletons; ``satisfies`` = arbitrary
predicate. All operate on ``df.collect()`` output.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame


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


def rows_multiset(df: DataFrame) -> Counter:
    return Counter(_hashable(tuple(r)) for r in df.collect())


def contains_only(df: DataFrame, expected: list[tuple]) -> None:
    """Order-insensitive multiset equality (assert.clj:81-92)."""
    actual = rows_multiset(df)
    want = Counter(_hashable(tuple(r)) for r in expected)
    assert actual == want, f"multiset mismatch:\n got {actual}\nwant {want}"


def is_empty(df: DataFrame) -> None:
    assert df.count() == 0


def equals_to(df: DataFrame, expected_row: tuple) -> None:
    """Singleton equality (assert.clj:94-105)."""
    rows = df.collect()
    assert len(rows) == 1, f"expected singleton, got {len(rows)} rows"
    assert _hashable(tuple(rows[0])) == _hashable(tuple(expected_row))


def satisfies(df: DataFrame, predicate) -> None:
    assert predicate(df.collect())
