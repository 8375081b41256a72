#!/usr/bin/env python
"""WordCount — the reference's flagship example
(/root/reference/src/clj/datasplash/examples.clj:18-54, itself a port
of the classic Dataflow WordCount), re-expressed Spark-first.

Usage::

    python examples/wordcount.py [--input=<path>] [--output=<dir>] \
        [--num-shards=N]

Defaults read the driver testdata documents table and write
word-frequency lines next to a temp dir.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401  (exports worker PYTHONPATH)
from datasplash_spark.operators import dmapcat, frequencies
from datasplash_spark.pipeline import make_session, options_from_args
from datasplash_spark.sources import write_text_file


def count_words(df, text_col="value"):
    """tokenize → frequencies (examples.clj:28-33), expression-first:
    the tokenizer is a JVM-side regex split, not a Python closure."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"[^a-zA-Z']+"),
        lambda t: t != "",
    )
    words = dmapcat(df, toks)
    return frequencies(words, "value", alias="word")


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="wordcount")
    conf = dict(opts.extra_conf)
    input_path = conf.pop("input", None)
    output = conf.pop("output", None) or os.path.join(
        tempfile.mkdtemp(), "wordcount-out"
    )
    num_shards = int(conf.pop("numShards", 0) or 0)
    opts.extra_conf = conf
    spark = make_session(opts)

    if input_path:
        lines = spark.read.text(input_path)
    else:  # default corpus: testdata documents.text
        lines = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            F.col("text").alias("value")
        )

    counts = count_words(lines)
    formatted = counts.select(
        F.concat_ws(": ", "word", F.col("count").cast("string")).alias("value")
    )
    write_text_file(formatted, output, num_shards=num_shards or None)
    n = spark.read.text(output).count()
    print(f"wrote {n} word-frequency lines to {output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
