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


class PlanGuardError(AssertionError):
    """Raised by :func:`plan_guard` with the offending plan excerpt."""


#: The plan nodes that sink 100 TB jobs: accidental cartesian
#: products, row-at-a-time Python evaluation, and single-partition
#: global sorts. ``plan_guard``'s default forbid list.
DEFAULT_FORBIDDEN = (
    "CartesianProduct",
    "BatchEvalPython",
)


def plan_guard(
    df: DataFrame,
    forbid: tuple | list = DEFAULT_FORBIDDEN,
    require: tuple | list = (),
    mode: str = "extended",
) -> DataFrame:
    """Assert physical-plan shape at pipeline-build time — the
    repo's own plan-pinning discipline (``tests/test_plans.py``)
    exported as a production guardrail: call it on any DataFrame
    before a big run (or in CI) and it raises :class:`PlanGuardError`
    naming the first forbidden node (or missing required node) with
    a plan excerpt, instead of letting a silent plan regression —
    a lost broadcast, a Python UDF sneaking into the hot path, a
    join degenerating to a cartesian product — surface as a
    1000-executor incident.

    ``forbid`` defaults to the scale sinkholes (cartesian product,
    row-at-a-time Python). ``require`` asserts markers that must be
    present (e.g. ``("PushedFilters: [IsNotNull",)`` or
    ``("BroadcastHashJoin",)``). Returns ``df`` unchanged so it
    chains: ``plan_guard(big_join).write...``.

    Matching is plain substring over ``df.explain(mode)`` text —
    the same contract the plan tests use.
    """
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    plan = buf.getvalue()

    def excerpt(marker: str) -> str:
        lines = plan.splitlines()
        hits = [i for i, l in enumerate(lines) if marker in l]
        if not hits:
            return "\n".join(lines[:12])
        i = hits[0]
        return "\n".join(lines[max(0, i - 2) : i + 3])

    for marker in forbid:
        if marker in plan:
            raise PlanGuardError(
                f"forbidden plan node {marker!r} present:\n"
                f"{excerpt(marker)}"
            )
    for marker in require:
        if marker not in plan:
            raise PlanGuardError(
                f"required plan marker {marker!r} absent; plan head:\n"
                f"{excerpt('__none__')}"
            )
    return df
