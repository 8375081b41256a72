"""Similarity search over embedding columns (``array<float>``).

LLM-data-pipeline extension (BASELINE.json north_star). Two tiers:

- :func:`brute_force_topk` — exact cosine top-k. The ranking is a
  TakeOrderedAndProject (per-partition heap + driver merge), so the
  full corpus is scanned but never sorted; fine as the correctness
  baseline and for one-off queries.
- :func:`lsh_bucketed_topk` — random-hyperplane (SimHash-for-vectors)
  LSH: probe only the query's bucket. The scale path: bucket keys
  shuffle, vectors don't move; recall is tunable via bits/tables.

Dot products run as ``F.zip_with`` + ``F.aggregate`` — JVM-side
whole-stage-codegen'd loops, no Python. (A Pandas-UDF/numpy variant is
a worthwhile alternative once vectors are wide; at d≲1024 the
expression form avoids Arrow transfer entirely.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col


def dot(a: ColumnLike, b: ColumnLike) -> Column:
    """Σ aᵢ·bᵢ in double precision, left-to-right (matches DuckDB
    ``list_dot_product`` evaluation order for oracle exactness)."""
    return F.aggregate(
        F.zip_with(
            _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: ColumnLike) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: ColumnLike, b: ColumnLike) -> Column:
    """Cosine similarity of two vector columns (0 when either is 0)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: ColumnLike = "embedding",
    id_col: ColumnLike = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    Scores round to 9 dp before ranking and ties break on id, so the
    result set is engine-independent (oracle-stable)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        _col(id_col).alias("vec_id"),
        F.round(cosine(_col(vec_col), q), 9).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-driven ±1 entries —
    sign-random projections; oracle SQL can embed the same planes)."""
    planes = []
    state = seed
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1.0 if (state >> 32) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(
    vec: ColumnLike, planes: list[list[float]]
) -> Column:
    """LSH bucket id: sign bits of the vector against each plane."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        acc = acc + F.when(
            dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return acc


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    vec_col: ColumnLike = "embedding",
    id_col: ColumnLike = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket. At scale, persist the bucketed table partitioned by
    ``bucket`` so the probe prunes partitions instead of scanning."""
    dim = len(query_vec)
    planes = random_hyperplanes(dim, bits, seed)
    bucketed = df.withColumn("bucket", hyperplane_bucket(_col(vec_col), planes))
    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0
    )
    return brute_force_topk(
        bucketed.filter(F.col("bucket") == qbucket),
        query_vec,
        k,
        vec_col,
        id_col,
    )
