#!/usr/bin/env python
"""Retrieval-training data pipeline — build a serving index once,
then mine the training pairs a dual-encoder needs:

    postings index (term-bucket partitioned, stats sidecar)
      → batch BM25 labels (many queries, ONE pruned scan)
      → lexical hard negatives (DPR recipe: top non-positive hits)
      → embedding-space contrastive triples (hardest in-cell
        positive + deterministic cross-cell negative)
      → length-bucketed batch plan (padding-waste accounting)

The index is built once and grown incrementally
(`tx.append_postings`); every mining pass prunes to the query
terms' buckets.

Usage::

    python examples/retrieval_training.py [--sf-dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import similarity as sim
from datasplash_spark.functions import text as tx
from datasplash_spark.pipeline import load_table, make_session, options_from_args


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="retrieval-training-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    opts.extra_conf = conf
    spark = make_session(opts)

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. serving index: one corpus pass at write time, pruned probes
    store = os.path.join(tempfile.mkdtemp(prefix="retrieval_ex_"), "postings")
    stats = tx.materialize_postings(docs, store, n_buckets=64)

    # 2. batch BM25 relevance labels — one pruned scan for all queries
    queries = {
        "q_exec": ["spark", "hash", "window"],
        "q_store": ["table", "row", "scan"],
    }
    labels = tx.bm25_batch_from_store(spark, store, queries, top_k=1)
    positives = {
        r.query_id: int(r.doc_id) for r in labels.collect()
    }  # top-1 doc as the labeled positive (queries-sized collect)

    # 3. lexical hard negatives: strongest NON-positive hits
    negs = tx.bm25_hard_negatives(
        docs,
        {q: (terms, positives[q]) for q, terms in queries.items()},
        n_negatives=3,
    )
    n_neg = negs.count()

    # 4. embedding-space triples (the semantic counterpart)
    triples = sim.contrastive_pairs(
        emb, centroids=sim.ivf_centroids(emb, 8)
    )
    n_tri = triples.count()

    # 5. batch plan for the encoder: pad to batch max, not corpus max
    plan = tx.length_batches(docs, 32, part="source")
    waste = plan.agg({"waste_tok": "sum"}).collect()[0][0]

    print(f"index: {stats['n_docs']} docs, {stats['n_buckets']} buckets")
    print(f"positives: {positives}")
    print(f"lexical hard negatives: {n_neg}")
    print(f"embedding triples:      {n_tri}")
    print(f"padding waste (tokens): {waste}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
