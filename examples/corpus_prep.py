#!/usr/bin/env python
"""End-to-end training-corpus preparation — the full 100 TB pipeline
shape, composed from the round-2 operator surface:

    quality gate (Gopher heuristics, one filter)
      → exact dedup (digest groupBy)
      → near-dup CLUSTERING (MinHash/LSH pairs → connected components
        → keep the canonical survivor per cluster)
      → repeated-span removal (Lee et al. ExactSubstr trim)
      → token-budget chunking (explode, no shuffle)
      → deterministic global shuffle (reproducible training order)

Every stage is a Column-expression plan: no Python in any hot path,
one shuffle per keyed stage, cluster iterations touch only the pair
list. At deployment scale, insert `materialize_dir=` on the LSH stage
and write the output with `write_partitioned` / `write_bucketed`.

Usage::

    python examples/corpus_prep.py [--sf-dir=/root/testdata/sf0.01] \
        [--chunk-tokens=64] [--overlap=8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import dedup as dd
from datasplash_spark.functions import text as tx
from datasplash_spark.pipeline import load_table, make_session, options_from_args
from datasplash_spark.plans import plan_guard


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="corpus-prep-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    chunk_tokens = int(conf.pop("chunkTokens", 64))
    overlap = int(conf.pop("overlap", 8))
    opts.extra_conf = conf
    spark = make_session(opts)

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate — single boolean Column, whole-stage codegen
    quality = docs.filter(tx.gopher_quality_pass("text"))
    n1 = quality.count()

    # 2. exact dedup — keep min doc_id per digest
    survivors = dd.dedup_exact(quality)
    exact = quality.join(survivors, on="doc_id", how="left_semi")
    n2 = exact.count()

    # 3. near-dup clustering — one survivor per LSH cluster
    clusters = dd.dedup_clusters(exact)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    deduped = exact.join(keep, on="doc_id", how="left_semi")
    n3 = deduped.count()

    # 4. repeated-span removal — trim corpus-wide boilerplate runs
    # instead of dropping whole docs (empty survivors filtered out)
    trimmed = (
        deduped.drop("text")
        .join(
            dd.remove_repeated_spans(deduped, k=8, min_count=2).select(
                "doc_id", F.col("text_clean").alias("text"), "n_removed"
            ),
            on="doc_id",
        )
        .filter(F.col("text") != "")
    )
    n4 = trimmed.count()

    # 5. chunking — token-budget chunks with overlap
    chunks = tx.chunk_documents(trimmed, chunk_tokens, overlap)
    # plan guardrail: fail fast if a refactor ever drops a Python
    # UDF or a cartesian product into the hot path (CI-able)
    plan_guard(chunks)
    n5 = chunks.count()

    # 6. reproducible training order — distributed total order on
    # md5(seed‖doc_id‖chunk_id); write these shards and any reader
    # replays the exact order
    from datasplash_spark.operators import global_shuffle

    ordered = global_shuffle(chunks, 7, "doc_id", "chunk_id")
    n6 = ordered.count()

    print(f"documents:          {n0}")
    print(f"after quality gate: {n1}")
    print(f"after exact dedup:  {n2}")
    print(f"after near-dedup:   {n3}")
    print(f"after span trim:    {n4}")
    print(f"chunks produced:    {n5}")
    print(f"shuffled chunks:    {n6}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
