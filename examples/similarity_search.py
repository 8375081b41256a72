#!/usr/bin/env python
"""Similarity search over an embedding column — the ANN toolkit at
its three operating points (no analog in the reference; LLM-pipeline
extension surface):

    brute-force cosine top-k        exact, one corpus scan
      → IVF store                   materialize once, partition-pruned
                                    probes read nprobe/n_cells of it
      → batch k-NN join             a whole query SET against the
                                    corpus in one plan

Usage::

    python examples/similarity_search.py [--sf-dir=/root/testdata/sf0.01] \
        [--store-dir=/tmp/ivf_store] [--k=5] [--nprobe=3]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import similarity as sim
from datasplash_spark.pipeline import make_session, options_from_args


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="similarity-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    store_dir = conf.pop("storeDir", "/tmp/ivf_store")
    k = int(conf.pop("k", 5))
    nprobe = int(conf.pop("nprobe", 3))
    opts.extra_conf = conf
    spark = make_session(opts)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    query = [float(x) for x in emb.limit(1).collect()[0].embedding]

    # 1. exact baseline: one scan, JVM-side fold dot products
    exact = sim.brute_force_topk(emb, query, k=k).collect()
    print("brute-force top-k:", [(r.vec_id, round(r.score, 4)) for r in exact])

    # 2. IVF store: pay cell assignment once, then every probe scans
    #    only nprobe partitions (partition pruning, not row filtering)
    sim.materialize_ivf(emb, store_dir, n_cells=16)
    approx = sim.ivf_topk_from_store(
        spark, store_dir, query, k=k, nprobe=nprobe
    ).collect()
    print(f"IVF store probe (nprobe={nprobe}):",
          [(r.vec_id, round(r.score, 4)) for r in approx])
    hits = len({r.vec_id for r in exact} & {r.vec_id for r in approx})
    print(f"recall@{k} vs exact: {hits}/{k}")

    # 3. batch k-NN join: every query in the (broadcast-small) query
    #    set gets its top-k in ONE plan — per-query top-k is a
    #    WindowGroupLimit rank, the corpus streams once
    queries = emb.limit(3).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    joined = sim.knn_join(emb, queries, k=k)
    print("k-NN join rows:", joined.count(), "(= |queries| × k)")

    # 4. batch ANN: same query set, IVF-pruned — only probed cells
    #    are scored; measure the recall cost of the pruned scan
    pruned = sim.ivf_knn_join(emb, queries, k=k, n_cells=16, nprobe=nprobe)
    got = {(r.query_id, r.vec_id) for r in pruned.collect()}
    truth = {(r.query_id, r.vec_id) for r in joined.collect()}
    print(f"batch-ANN recall@{k} (nprobe={nprobe}):",
          f"{len(got & truth)}/{len(truth)}")

    # 5. SemDeDup: semantic near-dup marking over the same cells —
    #    one survivor (the centroid outlier) per duplicate group
    marked = sim.semantic_dedup(emb, n_cells=16, eps=0.3, cache=True)
    n_all = marked.count()
    n_keep = marked.filter("keep = 1").count()
    print(f"semantic_dedup: keep {n_keep}/{n_all}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
