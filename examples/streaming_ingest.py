#!/usr/bin/env python
"""Continuous ingestion, both shapes (round 12):

1. the CRAWL shape — WARC shards arriving in a watched directory →
   ``prep.web_ingest_stream``: per micro-batch extract → robots gate
   → quality → paragraph dedup, then near-dup ADMISSION against the
   growing parquet store (intra-batch minhash, exact + LSH refusal
   of docs already stored, batch-id idempotent append);

2. the SHARED-DRIVE shape — tar shards of arbitrary documents →
   ``doctext.document_text_ingest``: per micro-batch the universal
   router (pdf/docx/epub/pptx/odt/rtf/latex/html/markdown/plain)
   lands extracted rows in a corpus table and per-document failures
   in a typed quarantine table, both batch-id idempotent.

Each drain uses ``trigger="once"`` so the example terminates; a real
deployment starts the query once and lets micro-batches follow the
directory.

Usage::

    python examples/streaming_ingest.py [--sf-dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import doctext as dt
from datasplash_spark.functions import markdown as mdw
from datasplash_spark.functions import prep as pp
from datasplash_spark.pipeline import load_table, make_session, options_from_args
from datasplash_spark.sources.archives import write_tar_shards, write_warc_shards


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="streaming-ingest-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    opts.extra_conf = conf
    spark = make_session(opts)

    docs = load_table(spark, sf_dir, "documents").limit(200)

    with tempfile.TemporaryDirectory() as tmp:
        # ---- shape 1: crawl (WARC -> web_ingest_stream) ----
        crawl = os.path.join(tmp, "crawl")
        store = os.path.join(tmp, "store")
        pages = docs.select(
            (F.col("doc_id") % 8).cast("string").alias("shard_id"),
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 4).cast("string"),
                F.lit(".example.com/doc/"),
                F.col("doc_id").cast("string"),
            ).alias("target_uri"),
            F.encode(
                F.concat(
                    F.lit("<html><body><p>"),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("payload"),
        )
        write_warc_shards(pages, os.path.join(crawl, "batch0")).collect()
        robots = spark.createDataFrame(
            [
                ("h%d.example.com" % i, "User-agent: *\nDisallow: /private/\n")
                for i in range(4)
            ],
            "host string, robots_txt string",
        )
        q = pp.web_ingest_stream(
            spark, crawl + "/*/*.warc.gz", robots, store,
            os.path.join(tmp, "ckpt_web"), trigger="once",
        )
        q.awaitTermination(300)
        admitted = spark.read.parquet(store)
        print("crawl shape: admitted %d docs to the store" % admitted.count())

        # ---- shape 2: shared drive (tar -> document_text_ingest) ----
        dump = os.path.join(tmp, "dump")
        corpus = os.path.join(tmp, "corpus")
        quarantine = os.path.join(tmp, "quarantine")
        mixed = dt.synthesize_documents_from_text(docs).select(
            (F.col("doc_id") % 4).cast("string").alias("shard_id"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("family").alias("ext"),
            F.col("media").alias("data"),
        )
        write_tar_shards(mixed, os.path.join(dump, "batch0")).collect()
        # a second micro-batch arrives: markdown READMEs + one poison blob
        extra = spark.createDataFrame(
            [
                ("9", "readme", "md",
                 bytearray(mdw.encode_markdown(
                     ["alpha beta gamma", "delta epsilon"],
                     title="README",
                 ))),
                ("9", "poison", "docx",
                 bytearray(b"PK\x03\x04 corrupt, not a zip")),
            ],
            "shard_id string, key string, ext string, data binary",
        )
        q = dt.document_text_ingest(
            spark, dump + "/*/*.tar", corpus, quarantine,
            os.path.join(tmp, "ckpt_doc"), trigger="once",
        )
        q.awaitTermination(300)
        write_tar_shards(extra, os.path.join(dump, "batch1")).collect()
        q = dt.document_text_ingest(
            spark, dump + "/*/*.tar", corpus, quarantine,
            os.path.join(tmp, "ckpt_doc"), trigger="once",
        )
        q.awaitTermination(300)

        got = spark.read.parquet(corpus)
        by_kind = {
            r.kind: r.n
            for r in got.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        print("shared-drive shape: %d extracted docs by kind: %s" % (
            got.count(), dict(sorted(by_kind.items())),
        ))
        for r in spark.read.parquet(quarantine).collect():
            print("quarantined: %s (%s): %s" % (r.member, r.kind, r.err))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
