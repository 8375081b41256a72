#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from datasplash_spark import queries as Q
from datasplash_spark.pipeline import TESTDATA_TABLES, PipelineOptions, make_session


def norm_val(v):
    import datetime
    import decimal

    from pyspark.sql import Row

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, Row):
        # struct parity: Spark Rows and DuckDB dicts must normalize
        # the same way (sorted key/value pairs), else struct-returning
        # queries can never match
        return norm_val(v.asDict(recursive=False))
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def multiset(rows):
    from collections import Counter

    return Counter(tuple(norm_val(v) for v in row) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(Q.REGISTRY)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        print(f"known: {sorted(Q.REGISTRY)}")
        return 2
    spark = make_session(PipelineOptions(app_name="oracle-check"))
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name, (fn, sql) in Q.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            orel = con.sql(sql)
            ocols = list(orel.columns)
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        # the real driver sorts columns BY NAME before hashing values:
        # names must match, and the compare must align on that order
        scols = list(sdf.columns)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: column names spark={sorted(scols)} duckdb={sorted(ocols)}")
            failures.append(name)
            continue
        sperm = [scols.index(c) for c in sorted(scols)]
        operm = [ocols.index(c) for c in sorted(ocols)]
        srows = [tuple(r[i] for i in sperm) for r in srows]
        orows = [tuple(r[i] for i in operm) for r in orows]
        sm, om = multiset(srows), multiset(orows)
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            failures.append(name)
        elif sm != om:
            diff_s = list((sm - om).items())[:3]
            diff_o = list((om - sm).items())[:3]
            print(f"FAIL {name}: value mismatch\n  spark-only: {diff_s}\n  duck-only:  {diff_o}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
