#!/usr/bin/env python
"""Mixed-document ingest — the shared-drive / data-dump shape:

    tar shards of arbitrary documents
      → member split (read_tar_shards: bytes stay on the executor)
      → universal text router (document_text_features: sniff by
        magic + zip layout, extract pdf/docx/epub/pptx/odt/rtf/
        latex/html/markdown/plain with per-row typed quarantine)
      → quality gate → exact + near-dup dedup (the standard text
        pipeline takes over)

Usage::

    python examples/document_ingest.py [--sf-dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import dedup as dd
from datasplash_spark.functions import text as tx
from datasplash_spark.functions.doctext import (
    document_text_features,
    synthesize_documents_from_text,
)
from datasplash_spark.pipeline import load_table, make_session, options_from_args
from datasplash_spark.sources.archives import read_tar_shards, write_tar_shards


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="document-ingest-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    opts.extra_conf = conf
    spark = make_session(opts)

    docs = load_table(spark, sf_dir, "documents").limit(400)

    with tempfile.TemporaryDirectory() as tmp:
        # 0. build the dump: mixed-format documents in tar shards
        # (every one of the eight families, rotating on doc_id)
        mixed = synthesize_documents_from_text(docs)
        shards = mixed.select(
            (F.col("doc_id") % 8).cast("string").alias("shard_id"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("family").alias("ext"),
            F.col("media").alias("data"),
        )
        n_written = write_tar_shards(shards, tmp).agg(
            F.sum("n_members")
        ).first()[0]

        # 1. ingest: member split -> universal router, one plan
        members = read_tar_shards(spark, tmp + "/*.tar")
        blobs = members.select(
            F.col("key").cast("bigint").alias("doc_id"),
            F.col("data").alias("media"),
        )
        texts = document_text_features(blobs).persist()
        by_kind = {
            r.kind: r.n
            for r in texts.groupBy("kind").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        n_quarantined = texts.where(~F.col("ok")).count()

        # 2. the standard text pipeline takes over
        clean = texts.where("ok").select("doc_id", "text")
        quality = clean.filter(tx.gopher_quality_pass("text", min_tokens=5))
        n_quality = quality.count()
        survivors = dd.dedup_exact(quality).count()
        texts.unpersist()

    print(f"documents written to tar shards: {n_written}")
    print(f"extracted by kind:               {dict(sorted(by_kind.items()))}")
    print(f"quarantined:                     {n_quarantined}")
    print(f"pass quality gate:               {n_quality}")
    print(f"after exact dedup:               {survivors}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
