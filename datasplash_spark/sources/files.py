"""File sources/sinks: text, JSON-lines, EDN-lines.

Reference parity (/root/reference/src/clj/datasplash/core.clj):
``generate-input`` 693-714, ``read-text-file`` 1284-1304 (compression
1178-1183, ``:watch-new-files`` 1207-1217), ``read-text-files``
1306-1332, EDN read/write 1334-1394, JSON read/write 1400-1494,
``write-text-file`` 1219-1282 (``:num-shards``, compression,
``:dynamic?`` per-element destinations).

Spark-first notes:

- Compression is codec-by-extension on read (gzip/bzip2/deflate/zstd
  auto-detected) and a writer option on write — no custom plumbing.
- ``:num-shards`` → ``coalesce(n)`` before write (0/None = leave the
  natural partitioning; never force 1 at scale).
- Dynamic destinations (``:dynamic?`` + fn) → ``partitionBy(col)``:
  the destination key must be a *column*, which is the scalable form
  of the reference's per-element filename fn.
- ``:watch-new-files`` → ``spark.readStream`` file source; the
  termination strategies map to query timeouts (documented gap).
- EDN parsing is Python (no JVM EDN codec): Arrow-batched
  ``mapInPandas``, schema from a bounded driver-side sample or given
  explicitly. Parsing is the slow path by design — columnar formats
  remain the recommendation.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions import edn

#: writer-supported codecs (reader side is automatic by extension)
WRITE_CODECS = {"gzip", "bzip2", "deflate", "snappy", "lz4", "zstd", "none"}


def generate_input(
    spark: SparkSession,
    data: Iterable,
    schema: StructType | str | list[str] | None = None,
) -> DataFrame:
    """``generate-input`` (Beam ``Create``, core.clj:693-714): pcoll
    from an in-memory collection. Empty input requires an explicit
    schema — the same affordance as the reference's ``Create.empty``
    coder fix (core.clj:708-711)."""
    data = list(data)
    if not data and schema is None:
        raise ValueError("empty input needs an explicit schema")
    return spark.createDataFrame(data, schema=schema)


def read_text_file(
    spark: SparkSession,
    path: str,
    delimiter: str | None = None,
    wholetext: bool = False,
    watch_new_files: bool = False,
) -> DataFrame:
    """``read-text-file`` (core.clj:1284-1304): newline-delimited text
    → one ``value: string`` column. Compression auto-detected from the
    extension. ``watch_new_files=True`` returns a *streaming*
    DataFrame polling the directory (core.clj:1207-1217)."""
    if watch_new_files:
        reader = spark.readStream
    else:
        reader = spark.read
    if delimiter is not None:
        reader = reader.option("lineSep", delimiter)
    if wholetext:
        reader = reader.option("wholetext", "true")
    return reader.text(path)


def read_text_files(spark: SparkSession, filenames: DataFrame | list[str]) -> DataFrame:
    """``read-text-files`` (core.clj:1306-1332): filenames arrive as a
    collection (or a 1-column DataFrame). The name list is driver-side
    metadata (as in Beam's ``matchAll``) — the reads themselves are
    distributed."""
    if isinstance(filenames, DataFrame):
        col = filenames.columns[0]
        names = [r[col] for r in filenames.select(col).collect()]
    else:
        names = list(filenames)
    if not names:
        raise ValueError("no files to read")
    return spark.read.text(names)


def write_text_file(
    df: DataFrame,
    path: str,
    column: str | None = None,
    num_shards: int | None = None,
    compression: str | None = None,
    dynamic_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """``write-text-file`` (core.clj:1255-1282). ``column`` selects the
    string column to write (default: the single column). ``dynamic_by``
    = per-element destination → ``partitionBy`` (FileIO.writeDynamic
    analog)."""
    if compression is not None and compression not in WRITE_CODECS:
        raise ValueError(f"unsupported codec {compression!r}; one of {sorted(WRITE_CODECS)}")
    out = df
    if column is not None:
        keep = [column] + ([dynamic_by] if dynamic_by else [])
        out = df.select(*keep)
    if num_shards:
        out = out.coalesce(num_shards)
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if dynamic_by:
        writer = writer.partitionBy(dynamic_by)
    writer.text(path) if not dynamic_by else writer.format("text").save(path)


def rename_shards(
    path: str,
    naming_fn=None,
    prefix: str = "part",
    suffix: str = "",
) -> list[str]:
    """``filename-policy`` emulation (/root/reference/src/clj/
    datasplash/core.clj:2173-2209, FileNamePolicy.java:21-45).

    Spark owns part-file names during the job (SURVEY §7.3b), so
    custom shard naming is a post-commit rename pass over the output
    directory. ``naming_fn(shard_idx, n_shards, old_name) -> name``;
    default: ``{prefix}-{i:05d}-of-{n:05d}{suffix}``. Driver-side
    metadata work — one listing + one rename per shard. Returns the
    new file names in shard order."""
    import glob as _glob
    import os as _os

    parts = sorted(
        p
        for p in _glob.glob(_os.path.join(path, "part-*"))
        if not p.endswith(".crc")
    )
    n = len(parts)
    out = []
    for i, p in enumerate(parts):
        ext = ""
        base = _os.path.basename(p)
        for known in (".gz", ".bz2", ".zst", ".deflate", ".snappy", ".lz4"):
            if base.endswith(known):
                ext = known
                break
        if naming_fn is not None:
            new = naming_fn(i, n, base)
        else:
            new = f"{prefix}-{i:05d}-of-{n:05d}{suffix}{ext}"
        dest = _os.path.join(path, new)
        _os.rename(p, dest)
        crc = _os.path.join(_os.path.dirname(p), f".{base}.crc")
        if _os.path.exists(crc):
            _os.remove(crc)  # checksum sidecar names the old file
        out.append(dest)
    return out


def read_json_file(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    drop_empty_lines: bool = True,
    watch_new_files: bool = False,
) -> DataFrame:
    """``read-json-file`` (core.clj:1400-1470): JSON-lines. Blank lines
    → dropped (the reference returns nil per blank line and tests keep
    going — api_test.clj:196-209; PERMISSIVE mode + corrupt-record drop
    is the Spark shape)."""
    reader = spark.readStream if watch_new_files else spark.read
    reader = reader.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if drop_empty_lines and "_corrupt_record" in df.columns:
        if not df.isStreaming:
            # Spark disallows queries that reference ONLY the internal
            # corrupt-record column (column pruning reduces e.g.
            # read_json_file(p).count() to exactly that); caching the
            # parsed frame first is the documented workaround
            df = df.cache()
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def write_json_file(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = None,
    date_format: str | None = None,
    mode: str = "overwrite",
) -> None:
    """``write-json-file`` (core.clj:1477-1494)."""
    out = df.coalesce(num_shards) if num_shards else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if date_format:
        writer = writer.option("dateFormat", date_format)
    writer.json(path)


def _edn_to_jsonable(v):
    import datetime as _dt
    import uuid as _uuid

    if isinstance(v, _dt.datetime):
        # ISO string; from_json parses it back to TimestampType when
        # the schema says so
        return v.astimezone(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _uuid.UUID):
        return str(v)
    if isinstance(v, edn.Tagged):
        return {"tag": v.tag, "value": _edn_to_jsonable(v.value)}
    if isinstance(v, dict):
        return {
            (k[1:] if isinstance(k, str) and k.startswith(":") else str(k)):
                _edn_to_jsonable(x)
            for k, x in v.items()
        }
    if isinstance(v, (set, frozenset)):
        return sorted((_edn_to_jsonable(x) for x in v), key=repr)
    if isinstance(v, (list, tuple)):
        return [_edn_to_jsonable(x) for x in v]
    return v


def read_edn_file(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sample_size: int = 1000,
) -> DataFrame:
    """``read-edn-file`` (core.clj:1334-1378): EDN per line.

    Parse EDN → JSON-able (keywords stripped, sets sorted to lists)
    in an Arrow-batched ``mapInPandas``, then decode with
    ``from_json``. Schema: explicit, or inferred from a bounded
    driver-side sample (metadata-scale work only)."""
    import pandas as pd

    text = spark.read.text(path).filter(F.length(F.trim("value")) > 0)

    def to_json(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {"json": [json.dumps(_edn_to_jsonable(edn.loads(s))) for s in b["value"]]}
            )

    jdf = text.mapInPandas(to_json, schema="json string")
    if schema is None:
        sample = [r.json for r in jdf.limit(sample_size).collect()]
        schema = spark.read.json(spark.sparkContext.parallelize(sample or ["{}"])).schema
    return jdf.select(F.from_json("json", schema).alias("r")).select("r.*")


def write_edn_file(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """``write-edn-file`` (core.clj:1380-1394): one EDN map per row,
    keys as keywords (``pr-str`` analog), via Arrow batches."""
    import pandas as pd

    cols = df.columns

    def to_edn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lines = []
            for row in b.itertuples(index=False):
                d = {f":{c}": _plain(v) for c, v in zip(cols, row)}
                lines.append(edn.dumps(d))
            yield pd.DataFrame({"value": lines})

    out = df.mapInPandas(to_edn, schema="value string")
    write_text_file(out, path, num_shards=num_shards, compression=compression, mode=mode)


def write_bucketed(
    df,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    path: str | None = None,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame hash-bucketed by join/aggregation key.

    Not a reference operator — part of the 100 TB toolkit: two tables
    bucketed on the same key with the same bucket count join (and
    group) WITHOUT an Exchange; the shuffle is paid once at write
    time instead of on every downstream query. Use for fact tables
    that are repeatedly joined/grouped on one key. Pinned by a
    plan-shape test (tests/test_plans.py).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def _plain(v):
    """numpy / pandas values → Python values for the EDN writer.

    ndarray must be handled before the ``.item()`` scalar path: a
    1-element array would silently scalarize and larger arrays raise
    ValueError (numpy gives every array an ``.item``)."""
    import numpy as np

    import pandas as pd

    if isinstance(v, np.ndarray):
        return [_plain(x) for x in v.tolist()]
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v


def write_partitioned(
    df,
    path: str,
    partition_by: str | list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist hive-partitioned by low-cardinality filter columns.

    The other half of the 100 TB layout toolkit (with
    :func:`write_bucketed`): partition directories turn equality/IN
    filters on the partition columns into PartitionFilters — pruned
    BEFORE the scan, so a query touching one lang/date reads only that
    directory tree, not 100 TB. Keep partition columns low-cardinality
    (lang, date, source); high-cardinality keys belong in buckets, not
    directories (small-file explosion). Pinned by a plan test
    (PartitionFilters non-empty, pruned input size).
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.format(fmt).mode(mode).partitionBy(*cols).save(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 256,
    partition_by: str | list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files
    near ``target_mb`` each. The unglamorous half of 100 TB hygiene —
    streaming ingest and per-trigger sinks leave thousands of KB-sized
    files whose open/footer overhead dominates scans.

    Output file count derives from the directory's actual byte size
    (filesystem metadata — no data read), so the rewrite is one
    coalesce-style shuffle-free repartition when shrinking. Writes to
    a NEW path (never in place: a failed rewrite must not destroy the
    source); swap directories at the orchestration layer. Returns the
    file count written.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb << 20)))
    df = spark.read.parquet(src_path)
    writer = df.coalesce(n_files).write.mode("overwrite")
    if partition_by is not None:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = df.repartition(*cols).write.mode("overwrite").partitionBy(*cols)
    writer.parquet(dst_path)
    written = 0
    for root, _dirs, files in os.walk(dst_path):
        written += sum(1 for f in files if f.endswith(".parquet"))
    return written


def write_training_shards(
    df,
    path: str,
    seed: int,
    *id_cols: str,
    num_shards: int = 32,
    max_rows_per_file: int | None = None,
) -> None:
    """Write a training-ready shard set: deterministic global shuffle
    (``operators.global_shuffle`` — md5(seed‖id) total order via a
    range-partitioned distributed sort) persisted so that reading the
    shards back in filename order replays the exact example order.

    Each of the ``num_shards`` range partitions writes one
    ``part-<i>`` file (or several capped at ``max_rows_per_file`` —
    Spark splits within a partition in order, so the order guarantee
    survives the cap); the retained ``shuffle_key`` column is the
    resume cursor: restarting training from shard *i* / key *k* is a
    ``WHERE shuffle_key > k`` pushdown-able filter, no re-shuffle.
    A new epoch is a new ``seed`` — a fresh write, never an
    in-place mutation.

    100 TB shape: the md5 keys are uniform, so range partitions are
    balanced regardless of id skew; the only data movement is the one
    range-exchange the sort itself needs.
    """
    from ..operators import global_shuffle

    out = global_shuffle(
        df, seed, *id_cols, num_partitions=int(num_shards), keep_key=True
    )
    writer = out.write.mode("overwrite")
    if max_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_rows_per_file))
    writer.parquet(path)
