"""Pipeline composition sugar + side-input views.

Reference parity (/root/reference/src/clj/datasplash/core.clj):
``ptransform`` 937-952 (named composite), ``pt->>`` 954-970 (named
thread-last), ``pt-cond->>`` 972-988 (conditional stages), ``view``
(side-input PCollectionView) 776-808, diamond DAGs
(test/datasplash/api_test.clj:1009-1023).

In Spark a composite transform is just a ``DataFrame → DataFrame``
function; these helpers keep the reference's naming/conditional
ergonomics and ``DataFrame.transform`` chaining.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import wraps

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


def ptransform(name: str) -> Callable[[Transform], Transform]:
    """``ptransform`` (core.clj:937-952): name a composite transform.
    The name lands on the output via ``DataFrame.alias`` (the
    ``apply-transform`` naming analog, core.clj:498-519)."""

    def deco(fn: Transform) -> Transform:
        @wraps(fn)
        def run(df: DataFrame, *args, **kwargs) -> DataFrame:
            return fn(df, *args, **kwargs).alias(name)

        run.transform_name = name
        return run

    return deco


def pt_thread(df: DataFrame, *fns: Transform) -> DataFrame:
    """``pt->>`` (core.clj:954-970): thread a DataFrame through stages."""
    for fn in fns:
        df = df.transform(fn)
    return df


def pt_cond(df: DataFrame, *stages: tuple[bool, Transform]) -> DataFrame:
    """``pt-cond->>`` (core.clj:972-988): apply each stage only when
    its guard is truthy."""
    for guard, fn in stages:
        if guard:
            df = df.transform(fn)
    return df


def view(df: DataFrame, view_type: str = "list"):
    """Side-input view (core.clj:776-808) for Layer 0: collect a
    *small* DataFrame and broadcast it into UDF closures.

    view_type: ``singleton`` (1 row, 1 col → scalar) | ``list`` (rows
    as dicts) | ``map`` (2 cols → {k: v}) | ``multi-map`` (2 cols →
    {k: [v...]}) | ``iterable`` (alias of list).

    For joins against a small side, prefer ``F.broadcast(df)`` — a
    broadcast hash join keeps everything JVM-side; ``view`` is for
    closures that need the data as a Python value.
    """
    rows = df.collect()
    if view_type == "singleton":
        if len(rows) != 1 or len(rows[0]) != 1:
            raise ValueError("singleton view needs exactly 1 row × 1 column")
        payload = rows[0][0]
    elif view_type == "map":
        if len(df.columns) != 2:
            raise ValueError("map view needs exactly 2 columns (key, value)")
        payload = {r[0]: r[1] for r in rows}
    elif view_type == "multi-map":
        if len(df.columns) != 2:
            raise ValueError("multi-map view needs exactly 2 columns")
        payload = {}
        for r in rows:
            payload.setdefault(r[0], []).append(r[1])
    elif view_type in ("list", "iterable"):
        payload = [r.asDict() for r in rows]
    else:
        raise ValueError(f"unknown view type {view_type!r}")
    return df.sparkSession.sparkContext.broadcast(payload)
