#!/usr/bin/env python
"""Shared-drive / mailbox / crawl-sidecar curation — the round-13
modality front of the corpus pipeline: one routed kernel pass over a
mixed-format blob column, per-format text policies, a typed reject
relation, and the routing-drift report a production ingest watches.

    sniff + route (22 formats, 3 compression + 4 encoding transports)
      → per-format policy inside ONE Arrow kernel:
          eml   Subject + body; headers/attachments vanish
          log   messages only (6 dialects incl. RFC 5424, logfmt,
                JSON logs); tracebacks stay attached to their ERROR
          feed  titles + entry bodies; GUIDs/permalinks/dates vanish
          ics   event prose; RRULE/UID/VALARM plumbing vanishes
          vcf   TYPED QUARANTINE — contact dumps are PII
          utf16/cp1252  decoded, never mojibake
      → corpus / rejected split (typed reasons, auditable)
      → per-kind routing report (drift watch: a sniff regression
        moves a kind's count long before a downstream metric does)

The demo corpus is synthesized deterministically from the documents
table the same way the gated queries do it, so every number printed
here is reproducible.

Usage::

    python examples/shared_drive_curation.py [--sf-dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import doctext as dtx
from datasplash_spark.pipeline import PipelineOptions, load_table, make_session


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    spark = make_session(PipelineOptions(app_name="shared-drive-curation"))

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )

    # a mixed dump: the 19-family rotation (pdf/office/markup/code/
    # tabular/email/log/feed) with every 23rd blob poisoned — the
    # same shape a real shared-drive ingest sees
    blobs = dtx.synthesize_documents_from_text(
        docs, families=19
    ).withColumn(
        "media",
        F.when(
            F.col("doc_id") % 23 == 7,
            F.lit(b"PK\x03\x04 deterministic poison, not a zip"),
        ).otherwise(F.col("media")),
    )

    feats = dtx.document_text_features(blobs).persist()
    try:
        corpus = feats.where("ok")
        rejected = feats.where("NOT ok")

        print("== routing report (the drift watch) ==")
        for r in (
            feats.groupBy("kind")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("ok").cast("long")).alias("n_ok"),
            )
            .orderBy("kind")
            .collect()
        ):
            print(f"  {r.kind:8s} docs={r.n_docs:6d} ok={r.n_ok:6d}")

        n_corpus = corpus.count()
        n_rejected = rejected.count()
        chars = corpus.agg(
            F.sum(F.col("n_chars").cast("long"))
        ).first()[0]
        print(f"corpus docs:   {n_corpus} ({chars} chars of clean text)")
        print(f"rejected docs: {n_rejected} (typed reasons below)")
        for r in (
            rejected.groupBy("err").count().orderBy(F.desc("count"))
            .limit(5).collect()
        ):
            print(f"  {r['count']:6d}  {r.err[:70]}")
    finally:
        feats.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
