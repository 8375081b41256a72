"""Distributed graph primitives for dedup clustering: connected
components over a candidate-pair edge list (LLM-data-pipeline
extension beyond the reference's operator surface — the reference has
no graph ops; near-dup *clustering* is the step after near-dup *pair*
generation in any real corpus-dedup pipeline).

Design for 100 TB:

- Hash-min label propagation: each node repeatedly adopts the minimum
  label among itself and its neighbors. Converges in O(diameter)
  rounds; LSH duplicate clusters are near-cliques (diameter 1-2), so
  3-4 rounds in practice. Each round is one shuffle join (labels ⋈
  edges on the neighbor key) + one partial-aggregated min — no
  driver-side graph, no collect.
- The symmetrized edge list is persisted once and reused every round;
  per-round results are ``localCheckpoint``-ed to truncate lineage
  (the classic iterative-DataFrame trap: without it the plan doubles
  per round and Catalyst analysis time explodes). On a real cluster
  with reliable storage, swap in ``checkpoint()`` against a
  checkpoint dir for fault tolerance — same shape.
- Convergence is detected by counting label decreases (labels are
  monotonically non-increasing), one cheap action per round over the
  already-checkpointed frame.
- Known scale hazard: a single giant component makes its min label a
  hot key in late rounds. The fix at that scale is the
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond") which bounds per-round degree;
  hash-min is the right default for dedup workloads where components
  are small and numerous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col


def connected_components(
    edges: DataFrame,
    src: ColumnLike = "src",
    dst: ColumnLike = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns ``(node, component)`` — one row per distinct node that
    appears in any edge; ``component`` is the minimum node id in the
    node's component (a canonical, deterministic representative —
    ids must be orderable, e.g. numeric or string doc ids).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence (a diameter larger than ``max_iter``): returning a
    half-propagated labeling would silently split components.
    """
    from pyspark import StorageLevel

    # symmetrize in ONE pass over the (possibly expensive) upstream
    # plan: explode each edge into both directions. A union of two
    # selects would duplicate the whole upstream subtree (e.g. the
    # LSH pipeline feeding dedup clustering) and compute it twice.
    s, d = _col(src), _col(dst)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(s.alias("a"), d.alias("b")),
                    F.struct(d.alias("a"), s.alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    try:
        for _ in range(max_iter):
            # each node's candidate = min(own label, neighbors' labels)
            nbr = sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("component")
                ),
                on="b",
            ).select(F.col("a").alias("node"), "component")
            new_labels = (
                labels.unionByName(nbr)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .localCheckpoint()
            )
            changed = (
                new_labels.withColumnRenamed("component", "new_c")
                .join(labels, on="node")
                .filter(F.col("new_c") < F.col("component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds max_iter (raise it, or use a "
            "star-contraction algorithm for long-chain graphs)"
        )
    finally:
        sym.unpersist()


def cluster_assignments(
    df: DataFrame,
    components: DataFrame,
    id_col: ColumnLike = "doc_id",
) -> DataFrame:
    """Attach a cluster id to EVERY row of ``df``: the component
    representative for nodes that appear in ``components``, the row's
    own id for singletons (docs with no near-dup edge). Output:
    ``(doc_id, cluster_id)``.

    The join is a left join on the id — at corpus scale the component
    table is orders of magnitude smaller than the corpus (only docs
    with at least one candidate pair), so AQE broadcasts it.
    """
    ids = df.select(_col(id_col).alias("doc_id"))
    comp = components.select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    return ids.join(comp, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
