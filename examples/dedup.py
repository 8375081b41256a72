#!/usr/bin/env python
"""DeDup + near-dup — the reference's dedup example
(/root/reference/src/clj/datasplash/examples.clj:56-76) extended with
the MinHash near-dup pipeline (the 100 TB training-data use case).

Usage::

    python examples/dedup.py [--sf-dir=/root/testdata/sf0.01] \
        [--jaccard-threshold=0.5]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import dedup as dd
from datasplash_spark.pipeline import make_session, options_from_args


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="dedup-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    threshold = float(conf.pop("jaccardThreshold", 0.5))
    opts.extra_conf = conf
    spark = make_session(opts)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    total = docs.count()

    # 1. exact dedup (examples.clj run-dedup = ds/distinct on lines)
    survivors = dd.dedup_exact(docs)
    n_exact = survivors.count()
    print(f"exact dedup: {total} docs -> {n_exact} unique texts")

    # 2. near-dup: LSH candidates, then exact Jaccard verification
    cands = dd.lsh_candidate_pairs(docs, num_hashes=16, bands=4, k=3)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    verified = (
        cands.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(dd.ngram_jaccard("ta", "tb", k=3), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy(F.desc("jaccard"))
    )
    pairs = verified.collect()
    print(f"near-dup pairs with jaccard >= {threshold}: {len(pairs)}")
    for r in pairs[:10]:
        print(f"  doc {r.doc_a} ~ doc {r.doc_b}  jaccard={r.jaccard}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
