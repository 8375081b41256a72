#!/usr/bin/env python
"""Web-crawl + SFT curation — the round-6 front half of the corpus
pipeline, the stages that run BEFORE `examples/corpus_prep.py`'s
quality/dedup chain:

    robots.txt gate (broadcast rules, longest-match + Allow tiebreak)
      → URL gate (host blocklist + path terms, auditable drop reasons)
      → URL-canonical dedup (normalize_url key: tracking params
        stripped, params sorted, fragment dropped)
      → corpus-frequency boilerplate line removal (CCNet pass —
        digest-only frequency shuffle)
      → compressibility screen (zlib Arrow seam: drop the most
        repetitive tail)
      → topic routing (dictionary tags for the mixing stage)
      → chat-transcript QA (parse + structural validation, only
        valid conversations survive)

Every relational stage is a Column-expression plan; zlib is the one
deliberate Arrow seam. URLs and transcripts are synthesized here the
same deterministic way the gated corpus queries do it.

Usage::

    python examples/web_curation.py [--sf-dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.functions import chat as ch
from datasplash_spark.functions import dedup as dd
from datasplash_spark.functions import text as tx
from datasplash_spark.functions import web as wb
from datasplash_spark.pipeline import load_table, make_session, options_from_args


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="web-curation-example")
    conf = dict(opts.extra_conf)
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.01")
    opts.extra_conf = conf
    spark = make_session(opts)

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")

    # -1. ARCHIVE INGEST (round 11) — the step before everything
    # below when the input is a crawl rather than a text corpus:
    # WARC shards → html_extract → robots gate → Gopher quality →
    # paragraph + minhash dedup, composed as ONE plan
    # (prep.web_ingest_prep; raw bytes never pass an Exchange).
    import tempfile

    from datasplash_spark.functions import prep as pp
    from datasplash_spark.sources import archives as ar

    with tempfile.TemporaryDirectory() as tmp:
        shards = docs.limit(200).select(
            (d % 8).alias("shard_id"),
            F.concat(
                F.lit("https://h"), (d % 4).cast("string"),
                F.lit(".example.com"),
                F.when(d % 7 == 0, F.lit("/private/")).otherwise(
                    F.lit("/doc/")
                ),
                d.cast("string"),
            ).alias("target_uri"),
            F.encode(
                F.concat(
                    F.lit("<html><body><p>"), F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("payload"),
        )
        ar.write_warc_shards(shards, tmp).count()
        ingest_robots = spark.createDataFrame(
            [
                (f"h{i}.example.com", "User-agent: *\nDisallow: /private/\n")
                for i in range(4)
            ],
            "host string, robots_txt string",
        )
        n_ingest = pp.web_ingest_prep(
            spark, tmp + "/*.warc.gz", ingest_robots, min_tokens=5
        ).count()
    print(f"WARC ingest survivors: {n_ingest} (of 200 crawled)")
    pages = docs.select(
        "doc_id",
        "text",
        "lang",
        F.concat(
            F.lit("HTTPS://"),
            F.when(d % 4 == 0, F.lit("WWW.News.COM"))
            .when(d % 4 == 1, F.lit("blog.example.org"))
            .when(d % 4 == 2, F.lit("spam.example.net"))
            .otherwise(F.lit("cdn.example.io")),
            F.when(d % 5 == 0, F.lit("/casino/p")).otherwise(F.lit("/p")),
            F.lit("/"),
            d.cast("string"),
            F.when(
                d % 3 == 0,
                F.concat(F.lit("?utm_source=feed&id="), d.cast("string")),
            ).otherwise(F.lit("")),
        ).alias("url"),
    )
    n0 = pages.count()

    # 0. robots.txt gate (round 10 s2) — the FIRST thing a polite
    # crawler-derived corpus applies: hosts-sized rules broadcast,
    # per-URL decision is a codegen'd longest-match expression
    robots = spark.createDataFrame(
        [
            ("blog.example.org", "User-agent: *\nDisallow: /casino/\n"),
            ("spam.example.net", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    polite = wb.robots_filter(pages, robots).where("allowed").drop(
        "host", "allowed"
    )
    n_robots = polite.count()

    # 1. URL gate — broadcast-literal membership, auditable funnel
    gated = wb.url_filter(
        polite,
        blocked_hosts=["spam.example.net"],
        blocked_path_terms=["casino"],
    )
    funnel = gated.groupBy("drop_reason").count().collect()
    kept = gated.where("keep").drop("keep", "drop_reason")
    n1 = kept.count()

    # 2. URL-canonical dedup — one key expression, one dropDuplicates
    deduped = kept.withColumn(
        "url_key", wb.normalize_url("url")
    ).dropDuplicates(["url_key"])
    n2 = deduped.count()

    # 3. boilerplate line removal — synthesize the shared lang line
    # every crawler sees, then strip lines crossing the threshold
    multiline = deduped.select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("text"), F.concat(F.lit("lang: "), F.col("lang"))
        ).alias("text"),
    )
    clean = dd.remove_boilerplate_lines(multiline, min_docs=5)
    n3 = clean.where(F.col("n_lines_out") > 0).count()

    # 4. compressibility screen — the zlib Arrow seam; drop the most
    # repetitive tail (ratio far below prose)
    ratios = tx.compression_ratio(
        clean.select("doc_id", F.col("clean_text").alias("text"))
    )
    screened = ratios.where(F.col("ratio_micro") > 200_000)
    n4 = screened.count()

    # 5. topic routing — dictionary tags for the mixing stage
    tags = tx.topic_tags(
        deduped,
        {
            "joins": ["join", "merge", "hash"],
            "streaming": ["stream", "window", "batch"],
        },
    )
    n5 = tags.count()

    # 6. chat QA — synthesize transcripts, keep only structurally
    # valid training conversations
    conv = deduped.select(
        "doc_id",
        F.concat(
            F.lit('[{"role":"user","content":"about '),
            F.col("lang"),
            F.lit('"},{"role":"assistant","content":"re #'),
            d.cast("string"),
            F.when(d % 6 == 0, F.lit("")).otherwise(F.lit('"}]')),
        ).alias("conv_json"),
    )
    valid = ch.conversation_stats(conv).where("valid")
    n6 = valid.count()

    print(f"pages crawled:        {n0}")
    print(f"after robots gate:    {n_robots}")
    print(f"after URL gate:       {n1}  (funnel: {sorted((str(r[0]), r[1]) for r in funnel)})")
    print(f"after URL dedup:      {n2}")
    print(f"non-empty after bp:   {n3}")
    print(f"after zlib screen:    {n4}")
    print(f"topic tag rows:       {n5}")
    print(f"valid conversations:  {n6}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
