#!/usr/bin/env python
"""Streaming WordCount — the unbounded variant of the flagship:
watch a directory for new text files (the reference's
``:watch-new-files``, core.clj:1207-1217), tokenize, count per
tumbling event-time window, print each micro-batch.

Self-driving demo: feeds itself three file drops and drains the
query, so it runs to completion without a real stream.

Usage::

    python examples/streaming_wordcount.py [--dir=<watch-dir>]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401  (exports worker PYTHONPATH)
from datasplash_spark.operators import dmapcat, fixed_windows
from datasplash_spark.pipeline import make_session, options_from_args
from datasplash_spark.sources import read_text_file


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="streaming-wordcount")
    conf = dict(opts.extra_conf)
    watch_dir = conf.pop("dir", None) or tempfile.mkdtemp(prefix="swc-in-")
    opts.extra_conf = conf
    spark = make_session(opts)
    os.makedirs(watch_dir, exist_ok=True)

    lines = read_text_file(spark, watch_dir, watch_new_files=True)
    assert lines.isStreaming

    toks = F.filter(
        F.split(F.trim(F.col("value")), r"[^a-zA-Z']+"), lambda t: t != ""
    )
    words = dmapcat(lines, toks).withColumn("ts", F.current_timestamp())
    # processing-time stamp here; a real source would carry event time
    # (see sources.decode_pubsub's timestamp-label) + withWatermark
    counts = words.groupBy(
        fixed_windows("ts", "10 seconds"), F.col("value").alias("word")
    ).agg(F.count("*").alias("count"))

    query = (
        counts.writeStream.outputMode("complete")
        .format("console")
        .option("truncate", "false")
        .trigger(processingTime="2 seconds")
        .start()
    )

    for i, text in enumerate(["the quick brown fox", "the lazy dog", "the end"]):
        with open(os.path.join(watch_dir, f"drop-{i}.txt"), "w") as fh:
            fh.write(text + "\n")
        time.sleep(3)

    query.processAllAvailable()
    query.stop()
    print(f"drained streaming wordcount over {watch_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
