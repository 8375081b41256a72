#!/usr/bin/env python
"""Targeted data selection + training-pair mining — the round-5
operator surface composed end-to-end (the DSIR / CCNet / contrastive
recipes on one corpus):

    DSIR scoring (hashed-unigram log-ratio vs a target sample)
      → importance RESAMPLING (engine-exact weight-proportional
        Bernoulli admission, the paper's selection step)
      → per-source CCNet perplexity tiers (head/middle/tail)
      → collocation mining (bigram PMI) on the admitted slice
      → contrastive (anchor, positive, negative) triples over the
        embedding table for embedding-model training
      → pre-flight skew report on the grouping key

Every stage is a Column-expression plan (the contrastive positive
mining can switch to the Arrow/BLAS backend at scale with
``backend="arrow"``).

Usage::

    python examples/targeted_selection.py [--sf-dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import similarity as sim
from datasplash_spark.functions import text as tx
from datasplash_spark.operators import (
    importance_resample,
    quantile_buckets_per_key,
    skew_report,
)
from datasplash_spark.pipeline import load_table, make_session, options_from_args


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="targeted-selection-example")
    sf_dir = getattr(opts, "sf_dir", None) or "/root/testdata/sf0.01"
    spark = make_session(opts)

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )

    # 1. DSIR: score raw docs against a "target" sample (here: the
    # en slice stands in for the high-quality target distribution)
    target = docs.filter(F.col("lang") == "en").limit(200)
    scores = tx.dsir_scores(docs, target, n_buckets=4096)

    # 2. the selection step: admit with p ∝ exp(score) — expected
    # 300 docs, deterministic and partitioning-independent
    weighted = docs.join(scores, "doc_id").withColumn(
        "w", F.exp(F.col("dsir_score"))
    )
    admitted = importance_resample(weighted, 300, "w", "doc_id")
    print(f"admitted {admitted.count()} docs (target expectation 300)")

    # 3. CCNet tiers per source over the admitted slice
    uni = tx.unigram_doc_scores(admitted)
    scored = admitted.join(
        uni.select(
            "doc_id",
            (
                -F.col("sum_logp_nano").cast("double")
                / F.col("n_toks").cast("double")
                / 1e9
            ).alias("neg_logp"),
        ),
        "doc_id",
    )
    tiers = quantile_buckets_per_key(
        scored, "neg_logp", 3, "source", bucket_name="tier"
    )
    tiers.groupBy("source", "tier").count().orderBy("source", "tier").show()

    # 4. collocations worth protecting from tokenization splits
    pmi = tx.bigram_pmi(admitted, min_count=3)
    pmi.orderBy(F.desc("pmi_nano")).limit(10).show(truncate=False)

    # 5. contrastive triples for embedding-model training
    triples = sim.contrastive_pairs(emb, n_cells=16)
    print(f"triples: {triples.count()} (with in-cell positives:", end=" ")
    print(f"{triples.filter(F.col('pos_id').isNotNull()).count()})")

    # 6. pre-flight: is 'source' safe to shuffle on?
    skew_report(docs, "source", top_n=5, target_rows_per_task=10_000).show()

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
