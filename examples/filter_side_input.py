#!/usr/bin/env python
"""Filter with a side input — the reference's FilterExamples port
(/root/reference/src/clj/datasplash/examples.clj:78-122): project
columns, compute a global mean, broadcast it as a side input, filter
rows under the mean for a chosen month.

Spark-first twist: the side input *could* be a broadcast variable in
a closure (`plans.view`), but the idiomatic plan is a scalar subquery
/ cross-join of a 1-row aggregate — everything stays JVM-side. Both
forms below produce identical results; we assert that.

Usage::

    python examples/filter_side_input.py [--month=7]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import datasplash_spark  # noqa: F401
from datasplash_spark.operators import dfilter, mean_fn
from datasplash_spark.pipeline import load_table, make_session, options_from_args
from datasplash_spark.plans import view


def main(argv: list[str]) -> int:
    opts = options_from_args(argv, app_name="filter-example")
    conf = dict(opts.extra_conf)
    month = int(conf.pop("month", 1))  # testdata events all land in January
    sf_dir = conf.pop("sfDir", "/root/testdata/sf0.001")
    opts.extra_conf = conf
    spark = make_session(opts)

    # stand-in for the weather_stations BQ table: events as readings
    # load_table handles the TIMESTAMP(NANOS) parquet ts column (a
    # bare spark.read.parquet fails on it) and yields TimestampType
    ev = load_table(spark, sf_dir, "events").select(
        F.month("ts").alias("month"),
        F.col("value").alias("mean_temp"),
        "event_id",
    )

    # Layer-0 idiom: 1-row aggregate joined in (stays in the JVM)
    gmean = ev.agg(mean_fn("mean_temp").alias("g"))
    filtered = (
        ev.join(F.broadcast(gmean))
        .where((F.col("month") == month) & (F.col("mean_temp") < F.col("g")))
        .select("event_id", "mean_temp")
    )
    n_native = filtered.count()

    # Side-input form (view → broadcast scalar), reference-style
    gval = view(gmean.select("g"), "singleton").value
    filtered2 = dfilter(
        ev, (F.col("month") == month) & (F.col("mean_temp") < F.lit(gval))
    ).select("event_id", "mean_temp")
    n_view = filtered2.count()

    print(f"month={month}: {n_native} below-mean readings "
          f"(native plan) == {n_view} (side-input plan)")
    assert n_native == n_view
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
