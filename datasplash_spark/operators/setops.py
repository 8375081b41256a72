"""Set operations, union, flatten.

Reference parity (/root/reference/src/clj/datasplash/core.clj):
``concat`` 1811-1821, ``flatten`` 1784-1797, ``intersect-distinct``
1823-1835, ``union-distinct`` 1837-1848, ``except-distinct`` 1850-1861.

All compile to native Catalyst set operators (Union / Intersect /
Except), which get partial aggregation + AQE for free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .elementwise import ColumnLike, _col


def concat(*dfs: DataFrame, by_name: bool = True) -> DataFrame:
    """``concat`` (core.clj:1811-1821): union-all of N collections
    (Beam ``Flatten.pCollections``). No dedup, no shuffle."""
    if not dfs:
        raise ValueError("concat needs at least one DataFrame")
    op = DataFrame.unionByName if by_name else DataFrame.unionAll
    return reduce(op, dfs)


def dflatten(
    df: DataFrame,
    expr: ColumnLike,
    alias: str = "value",
    keep_cols: list[ColumnLike] | None = None,
) -> DataFrame:
    """``flatten`` (core.clj:1784-1797, Beam ``Flatten.iterables``):
    elements are iterables → one row per inner element; ``keep_cols``
    ride along unexploded."""
    keep = [_col(c) for c in (keep_cols or [])]
    return df.select(*keep, F.explode(_col(expr)).alias(alias))


def intersect_distinct(*dfs: DataFrame) -> DataFrame:
    """``intersect-distinct`` (core.clj:1823-1835)."""
    if len(dfs) < 2:
        raise ValueError("intersect_distinct needs >=2 DataFrames")
    return reduce(DataFrame.intersect, dfs)


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """``union-distinct`` (core.clj:1837-1848)."""
    return concat(*dfs).distinct()


def except_distinct(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """``except-distinct`` (core.clj:1850-1861): distinct(p1) − p2 − …"""
    if not rest:
        raise ValueError("except_distinct needs >=2 DataFrames")
    # DataFrame.subtract is EXCEPT DISTINCT (dedups the result)
    return reduce(DataFrame.subtract, [first, *rest])
