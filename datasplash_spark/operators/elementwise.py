"""Element-wise transforms (the reference's ParDo family).

Reference parity (all /root/reference/src/clj/datasplash/core.clj):
``map`` 612-628, ``map-kv`` 630-645, ``mapcat`` 647-659, ``filter``
661-674, ``keep`` 676-691, ``with-keys`` 903-924, ``partition-by``
842-853, side outputs 302-360, ``identity`` 424-428.

Design: expression-first. Each operator takes/returns DataFrames and
Column expressions so Catalyst retains pushdown / pruning / codegen.
Arbitrary-Python-object parity (closures over ragged values) lives in
``datasplash_spark.objectmode`` — never default to it.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Column | str


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dmap(df: DataFrame, *exprs: ColumnLike, name: str | None = None) -> DataFrame:
    """``map`` (core.clj:612-628): apply expressions to every element.

    In expression form this is a projection — Catalyst folds constants
    and prunes the parquet scan down to the referenced columns.
    """
    out = df.select(*[_col(e) for e in exprs])
    return out.alias(name) if name else out


def dmap_kv(
    df: DataFrame,
    key_expr: ColumnLike,
    value_expr: ColumnLike,
    name: str | None = None,
) -> DataFrame:
    """``map-kv`` (core.clj:630-645): f returns ``[k v]`` → two-column
    (key, value) DataFrame, the Spark shape of a ``KV`` pcoll."""
    out = df.select(_col(key_expr).alias("key"), _col(value_expr).alias("value"))
    return out.alias(name) if name else out


def dmapcat(df: DataFrame, expr: ColumnLike, *keep_cols: ColumnLike) -> DataFrame:
    """``mapcat`` (core.clj:647-659): 1→N flatten. ``expr`` must be an
    array-typed expression; each element becomes a row (rows with
    empty arrays vanish, like a fn returning ``[]``)."""
    return df.select(*[_col(c) for c in keep_cols], F.explode(_col(expr)).alias("value"))


def dfilter(df: DataFrame, predicate: ColumnLike) -> DataFrame:
    """``filter`` (core.clj:661-674): keep rows where predicate holds."""
    return df.filter(_col(predicate))


def dkeep(df: DataFrame, expr: ColumnLike, alias: str = "value") -> DataFrame:
    """``keep`` (core.clj:676-691): map then drop only null results.

    Falsey-but-not-nil results survive (reference pins this:
    test/datasplash/api_test.clj:412-419 keeps ``false``)."""
    c = _col(expr).alias(alias)
    return df.select(c).filter(F.col(alias).isNotNull())


def identity(df: DataFrame) -> DataFrame:
    """``identity`` DoFn (core.clj:424-428): pass-through."""
    return df


def with_keys(df: DataFrame, key_expr: ColumnLike, key_name: str = "key") -> DataFrame:
    """``with-keys`` (core.clj:903-924): key each element by f(e),
    keeping the element itself (all original columns)."""
    if key_name in df.columns:
        raise ValueError(
            f"input already has a column named {key_name!r}; "
            "pass key_name= to avoid an ambiguous reference"
        )
    return df.select(_col(key_expr).alias(key_name), "*")


def partition_by(
    df: DataFrame, partition_expr: ColumnLike, n: int, cache: bool = True
) -> list[DataFrame]:
    """``partition-by`` (core.clj:842-853): route each element to one of
    N outputs by ``partition_expr`` (must evaluate to 0..n-1).

    Returns N DataFrames. With ``cache`` (default) the input is
    persisted so the N branches share one scan instead of re-reading
    the source N times — the Beam runner fuses this for free; Spark
    needs the explicit cache when more than one branch is consumed.
    Pass ``cache=False`` when only one branch will be used (a persist
    for a single consumer is pure overhead).
    """
    if n <= 0:
        raise ValueError("partition count must be positive")
    pidx = _col(partition_expr)
    src = df.persist() if cache else df
    return [src.filter(pidx == i) for i in range(n)]


def side_outputs(
    df: DataFrame, tagged_exprs: dict[str, Column]
) -> dict[str, DataFrame]:
    """Side outputs (core.clj:302-360): one pass, multiple tagged
    outputs; the shared input is persisted once. Each tag maps to
    either a boolean *filter* predicate — that tag receives the whole
    matching elements, the reference's tag-routing shape — or any
    other expression, projected as a one-column output.

    Spark shape: N selects/filters off one cached intermediate (the
    reference returns a map of keyword→pcoll; we return
    dict[str, DataFrame]).
    """
    cached = df.persist()
    out: dict[str, DataFrame] = {}
    for tag, expr in tagged_exprs.items():
        dtype = cached.select(expr.alias(tag)).schema[tag].dataType.simpleString()
        if dtype == "boolean":
            out[tag] = cached.filter(expr)
        else:
            out[tag] = cached.select(expr.alias(tag))
    return out


def checkpoint(df: DataFrame, path: str, fmt: str = "json") -> DataFrame:
    """``:checkpoint`` option (core.clj:517-518, 557-559): dump the
    intermediate collection for debugging, return it unchanged."""
    df.write.mode("overwrite").format(fmt).save(path)
    return df


def dmap_in_pandas(
    df: DataFrame,
    fn: Callable,
    schema,
) -> DataFrame:
    """``pardo`` escape hatch (core.clj:602-610): per-batch imperative
    logic via Arrow-batched ``mapInPandas`` (never row-at-a-time)."""
    return df.mapInPandas(fn, schema=schema)


def make_partition_mapping(coll) -> dict:
    """``make-partition-mapping`` (core.clj:1496-1498): value →
    partition-index mapping (insertion order), the routing table for
    :func:`partition_by` / by-transform file writes."""
    return {v: i for i, v in enumerate(coll)}


def mapping_to_column(mapping: dict, col: ColumnLike, default: int = 0):
    """Chained-CASE Column for a value→index ``mapping`` (the Spark
    form of the reference's ``(get mapping (f elt) 0)`` routing,
    core.clj:1507-1512): unknown values fall to ``default``. Feed the
    result to :func:`partition_by` as the partition expression."""
    from pyspark.sql import functions as F

    c = _col(col)
    expr = F.lit(int(default))
    for v, i in reversed(list(mapping.items())):
        expr = F.when(c == F.lit(v), F.lit(int(i))).otherwise(expr)
    return expr
