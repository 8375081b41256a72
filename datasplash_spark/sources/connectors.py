"""External-system connectors as option-mappers.

The reference wraps Beam IOs for Kafka (/root/reference/src/clj/
datasplash/kafka.clj:11-194), BigQuery (bq.clj:25-353),
Elasticsearch (es.clj:44-156) and Pub/Sub (pubsub.clj:57-121). Spark
has first-party or well-known connectors for the first three; the
functions here translate the reference's option surface into Spark
reader/writer option dicts, so the pipeline code stays declarative
and the connector jars stay optional (none are available in this
container — building the options is pure; ``.load()``/``.start()``
is where a missing connector fails, and these are exercised by unit
tests on the dicts only).

Pub/Sub has no first-party Spark source; the closest public
connector is Pub/Sub Lite (``format("pubsublite")``). The functions
below carry the reference's Pub/Sub *data model* regardless of
transport: messages are (payload bytes, attributes map), read as
``:string`` or ``:raw`` (pubsub.clj:16-48), with ``:timestamp-label``
promoting an attribute to event time (pubsub.clj:55, 82) — here a
TimestampType column + ``withWatermark``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_FORMAT = "kafka"

#: Transport-neutral Pub/Sub message shape (what Beam's
#: ``PubsubMessage`` carries, pubsub.clj:26-35).
PUBSUB_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "attributes", T.MapType(T.StringType(), T.StringType()), True
        ),
        T.StructField("message_id", T.StringType(), True),
        T.StructField("publish_time", T.TimestampType(), True),
    ]
)


def pubsub_read_options(
    subscription: str | None = None, topic: str | None = None
) -> dict[str, str]:
    """Pub/Sub Lite connector options (the public Spark connector for
    the Pub/Sub family). Reading a plain Pub/Sub topic from Spark has
    no first-party path — route it through the Kafka bridge or Lite."""
    if (subscription is None) == (topic is None):
        raise ValueError("exactly one of subscription/topic required")
    if subscription:
        return {"pubsublite.subscription": subscription}
    return {"pubsublite.topic": topic}  # write side


def decode_pubsub(
    df: DataFrame,
    type: str = "string",  # noqa: A002 - mirrors the reference's :type
    timestamp_label: str | None = None,
    payload_col: str = "payload",
    attributes_col: str = "attributes",
) -> DataFrame:
    """``read-from-pubsub`` codec surface (pubsub.clj:16-48, 57-89)
    over any transport DataFrame with payload/attributes columns
    (Kafka ``value``+``headers``, Lite, files, memory…).

    ``:string`` → one UTF-8 ``value`` column; ``:raw`` → keep
    ``{payload, attributes}``. ``timestamp_label`` promotes that
    attribute (epoch millis or ISO-8601, the Beam convention) to an
    ``event_time`` column — pair with ``with_allowed_lateness``/
    ``withWatermark`` downstream."""
    if type not in ("string", "raw"):
        raise ValueError(f"unknown pubsub codec {type!r}")
    if type == "string":
        out = df.withColumn("value", F.col(payload_col).cast("string"))
    else:
        out = df
    if timestamp_label is not None:
        attr: Column = F.col(attributes_col).getItem(timestamp_label)
        # epoch-millis digits vs ISO-8601: branch on shape, JVM-side
        out = out.withColumn(
            "event_time",
            F.when(
                attr.rlike("^[0-9]+$"),
                F.timestamp_millis(attr.cast("long")),
            ).otherwise(F.to_timestamp(attr)),
        )
    return out


def encode_pubsub(
    df: DataFrame,
    type: str = "string",  # noqa: A002
    value_col: str = "value",
    attributes: dict[str, str] | None = None,
    timestamp_label: str | None = None,
    timestamp_col: str = "event_time",
) -> DataFrame:
    """``write-to-pubsub`` codecs (pubsub.clj:91-121): produce
    ``payload`` bytes (+ ``attributes``), optionally stamping the
    event time back into the ``timestamp_label`` attribute (as epoch
    millis) the way the reference round-trips it."""
    if type not in ("string", "raw"):
        raise ValueError(f"unknown pubsub codec {type!r}")
    if type == "string":
        out = df.withColumn("payload", F.col(value_col).cast("binary"))
        amap = F.create_map(
            *[x for k, v in (attributes or {}).items() for x in (F.lit(k), F.lit(v))]
        )
    else:
        out = df.withColumn("payload", F.col("payload"))
        amap = F.coalesce(
            F.col("attributes"),
            F.create_map().cast("map<string,string>"),
        )
    if timestamp_label is not None:
        amap = F.map_concat(
            amap,
            F.create_map(
                F.lit(timestamp_label),
                F.unix_millis(F.col(timestamp_col)).cast("string"),
            ),
        )
    return out.withColumn("attributes", amap)


def kafka_read_options(
    brokers: str | Sequence[str],
    topics: str | Sequence[str] | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_records: int | None = None,
    read_committed: bool = False,
    start_read_time: int | None = None,
    topic_partitions: str | None = None,
) -> dict[str, str]:
    """``read-kafka`` option surface (kafka.clj:33-77) → Structured
    Streaming kafka source options. The Beam ``KafkaRecord`` fields
    (key/value/topic/partition/offset/timestamp/headers) are native
    columns of the Spark source — no ``:without-metadata`` needed
    (drop columns instead)."""
    if isinstance(brokers, (list, tuple)):
        brokers = ",".join(brokers)
    opts = {"kafka.bootstrap.servers": str(brokers), "startingOffsets": starting_offsets}
    if topics is not None:
        opts["subscribe"] = (
            ",".join(topics) if isinstance(topics, (list, tuple)) else str(topics)
        )
    if subscribe_pattern is not None:
        opts["subscribePattern"] = subscribe_pattern
    if max_records is not None:
        opts["maxOffsetsPerTrigger"] = str(max_records)
    if read_committed:
        opts["kafka.isolation.level"] = "read_committed"
    if start_read_time is not None:
        opts["startingTimestamp"] = str(start_read_time)
    if topic_partitions is not None:
        opts["assign"] = topic_partitions
    return opts


def read_kafka(
    spark: SparkSession, streaming: bool = True, **kwargs
) -> DataFrame:
    """Build the Kafka source (streaming or batch). Fails at
    ``.load()`` if the kafka connector jar is absent."""
    opts = kafka_read_options(**kwargs)
    reader = (spark.readStream if streaming else spark.read).format(KAFKA_FORMAT)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def decode_kafka(
    df: DataFrame,
    key_codec="string",
    value_codec="string",
    with_metadata: bool = True,
) -> DataFrame:
    """Map the Spark Kafka wire schema (key/value binary, topic,
    partition, offset, timestamp, headers) to the reference's
    ``KafkaRecord`` map shape (kafka.clj:10-26): payload / key /
    offset / partition / timestamp / topic / headers-as-map.

    ``key_codec``/``value_codec``: ``"string"`` (StringDeserializer
    analog — UTF-8 cast), ``"raw"`` (bytes as-is), or a callable
    Column → Column for custom deserializers. ``with_metadata=False``
    is ``:without-metadata`` (kafka.clj:70): just key + payload.

    Pure column expressions over the source columns — works
    identically on the real Kafka source and on any DataFrame with
    the same schema (which is how it is tested broker-less)."""
    def apply_codec(codec, col):
        if callable(codec):
            return codec(col)
        if codec == "string":
            return col.cast("string")
        if codec == "raw":
            return col
        raise ValueError(f"unknown codec {codec!r} (string | raw | callable)")

    out = df.select(
        apply_codec(key_codec, F.col("key")).alias("key"),
        apply_codec(value_codec, F.col("value")).alias("payload"),
        *(
            [
                F.col("offset"),
                F.col("partition"),
                F.col("timestamp"),
                F.col("topic"),
                F.map_from_entries(
                    F.expr(
                        "transform(headers, h -> struct(h.key AS key, h.value AS value))"
                    )
                ).alias("headers"),
            ]
            if with_metadata
            else []
        ),
    )
    return out


def kafka_write_options(
    brokers: str | Sequence[str],
    topic: str,
    exactly_once: bool = False,
) -> dict[str, str]:
    """``write-kafka`` options (kafka.clj:138-194).

    DELIVERY-SEMANTICS LIMITATION (deliberate, documented): the
    reference exposes Beam's exactly-once Kafka sink with
    ``num-shards``/``sink-group-id`` (kafka.clj:156-171, built on
    Kafka transactions coordinated by the runner). Spark's first-party
    Kafka sink is AT-LEAST-ONCE — a failed/replayed micro-batch may
    re-produce records; there is no transactional-producer analog in
    the built-in connector. ``exactly_once=True`` maps to the
    idempotent-producer config (``kafka.enable.idempotence``), which
    removes broker-side duplicates from producer RETRIES only, not
    from micro-batch replays. True effective-exactly-once requires a
    downstream consumer that dedups on a key (or an idempotent sink
    such as :func:`~datasplash_spark.streaming.sinks.
    idempotent_parquet_batch_writer` for file targets). Beam's
    num-shards/sink-group have no Spark analog (the sink is already
    partition-parallel)."""
    if isinstance(brokers, (list, tuple)):
        brokers = ",".join(brokers)
    opts = {"kafka.bootstrap.servers": str(brokers), "topic": topic}
    if exactly_once:
        opts["kafka.enable.idempotence"] = "true"
    return opts


def write_kafka(df: DataFrame, checkpoint_dir: str, **kwargs):
    """Start the Kafka sink for a streaming DataFrame (expects
    ``key``/``value`` binary or string columns, the sink contract)."""
    opts = kafka_write_options(**kwargs)
    writer = df.writeStream.format(KAFKA_FORMAT).option(
        "checkpointLocation", checkpoint_dir
    )
    for k, v in opts.items():
        writer = writer.option(k, v)
    return writer.start()


def bigquery_read_options(
    table: str | None = None,
    query: str | None = None,
    standard_sql: bool = True,
    query_location: str | None = None,
) -> dict[str, str]:
    """BigQuery read surface (bq.clj:25-50) → spark-bigquery-connector
    options (``format("bigquery")``)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query required")
    opts: dict[str, str] = {}
    if table:
        opts["table"] = table
    if query:
        opts["query"] = query
        opts["useLegacySql"] = str(not standard_sql).lower()
    if query_location:
        opts["location"] = query_location
    return opts


def bigquery_write_options(
    table: str,
    create_disposition: str = "CREATE_IF_NEEDED",
    write_disposition: str = "WRITE_APPEND",
    partition_field: str | None = None,
    clustering_fields: Sequence[str] | None = None,
) -> dict[str, str]:
    """BigQuery write surface (bq.clj:234-353): dispositions, time
    partitioning, clustering → connector options."""
    opts = {
        "table": table,
        "createDisposition": create_disposition,
        "writeDisposition": write_disposition,
    }
    if partition_field:
        opts["partitionField"] = partition_field
    if clustering_fields:
        opts["clusteredFields"] = ",".join(clustering_fields)
    return opts


def elasticsearch_read_options(
    hosts: Sequence[str],
    index: str,
    query: str | None = None,
    batch_size: int | None = None,
    scroll_keep_alive: str | None = None,
    username: str | None = None,
    password: str | None = None,
) -> dict[str, str]:
    """ES read surface (es.clj:44-93) → elasticsearch-hadoop options.

    ``batch_size`` is the scroll page size (``:batch-size``,
    es.clj:49-50 — reference default 100, max 10 000);
    ``scroll_keep_alive`` is ``:scroll-keep-alive`` (es.clj:53-54,
    default "5m"); ``username``/``password`` are the connection auth
    (es-connection-schema, es.clj:19-24). The reference's ``:key-fn``
    JSON key coercion has no option analog here because the Spark
    connector returns TYPED rows, not JSON strings — no re-parse
    step exists to coerce."""
    opts = {"es.nodes": ",".join(hosts), "es.resource": index}
    if query:
        opts["es.query"] = query
    if batch_size:
        opts["es.scroll.size"] = str(batch_size)
    if scroll_keep_alive:
        opts["es.scroll.keepalive"] = scroll_keep_alive
    if username:
        opts["es.net.http.auth.user"] = username
    if password:
        opts["es.net.http.auth.pass"] = password
    return opts


def elasticsearch_write_options(
    hosts: Sequence[str],
    index: str,
    id_field: str | None = None,
    index_pattern: str | None = None,
    max_batch_size: int | None = None,
    max_batch_bytes: int | None = None,
    retry_count: int | None = None,
    retry_wait_ms: int | None = None,
    partial_update: bool = False,
    username: str | None = None,
    password: str | None = None,
) -> dict[str, str]:
    """ES write surface (es.clj:99-156) → elasticsearch-hadoop options.

    - ``:id-fn`` doc routing (es.clj:119-121 via ExtractKeyFn.java:
      24-36, which runs a fn over the serialized doc) → ``id_field`` /
      ``es.mapping.id``: the routing value must be a COLUMN — compute
      arbitrary extraction logic with ``withColumn`` first. That is
      the scalable form: a Column expression runs JVM-side per batch
      instead of a JSON parse + fn call per document.
    - ``:index-fn`` dynamic index routing (es.clj:122-124) →
      ``index_pattern``: an ``es.resource.write`` pattern with
      ``{field}`` placeholders (e.g. ``"logs-{date}"``), the
      connector-native form of per-document index extraction. Compute
      the field with ``withColumn`` for arbitrary logic. ``:type-fn``
      follows the same pattern (types are gone from modern ES).
    - ``:use-partial-update`` (es.clj:131-133) → ``partial_update``:
      ``es.write.operation=upsert`` (requires ``id_field``).
    - ``:retry-configuration`` [max-attempts, max-duration-ms]
      (es.clj:113-118) → ``retry_count`` + ``retry_wait_ms``
      (es-hadoop retries are count+wait rather than a deadline; the
      backoff budget maps to count × wait).
    - ``:max-batch-size`` / ``:max-batch-size-bytes`` (es.clj:105-110,
      reference defaults 1000 docs / 5 MB) → bulk sizing.
    """
    opts = {"es.nodes": ",".join(hosts), "es.resource": index}
    if id_field:
        opts["es.mapping.id"] = id_field
    if index_pattern:
        opts["es.resource.write"] = index_pattern
    if max_batch_size:
        opts["es.batch.size.entries"] = str(max_batch_size)
    if max_batch_bytes:
        opts["es.batch.size.bytes"] = str(max_batch_bytes)
    if retry_count is not None:
        opts["es.batch.write.retry.count"] = str(retry_count)
    if retry_wait_ms is not None:
        opts["es.batch.write.retry.wait"] = f"{retry_wait_ms}ms"
    if partial_update:
        if not id_field:
            raise ValueError("partial_update requires id_field (es.mapping.id)")
        opts["es.write.operation"] = "upsert"
    if username:
        opts["es.net.http.auth.user"] = username
    if password:
        opts["es.net.http.auth.pass"] = password
    return opts


def es_bulk_actions(
    df: DataFrame,
    index: str | Column,
    id_col: str | Column | None = None,
    op: str = "index",
    doc_col: str | Column | None = None,
) -> DataFrame:
    """Encode rows as Elasticsearch BULK-API action pairs — the exact
    wire format a bulk indexer sends — as a single-string-column
    DataFrame (``value``), one action-metadata line + one document
    line per row:

    ``{"index":{"_index":"docs","_id":"42"}}\\n{"f":1,...}``

    This is the broker-less seam for the reference's write path
    (es.clj:119-141): ``id_col`` is the ``:id-fn`` analog and a
    Column ``index`` is the ``:index-fn`` analog — arbitrary
    per-document routing as JVM-side Column expressions instead of
    the reference's JSON-parse-per-doc ExtractKeyFn (ExtractKeyFn
    .java:24-36). ``op="update"`` wraps the document as
    ``{"doc": ..., "doc_as_upsert": true}`` — the bulk form of
    ``:use-partial-update`` (es.clj:131-133).

    ``doc_col``: optional pre-serialized JSON string column; default
    serializes all non-routing columns with ``to_json(struct(*))``.
    Feed the result to ``write_text_file`` for an on-disk bulk file
    (replayable with one ``curl -XPOST _bulk`` per shard), or to any
    HTTP sink. Pure column expressions → testable without a cluster,
    identical plan shape on one.
    """
    if op not in ("index", "create", "update"):
        raise ValueError(f"unknown bulk op {op!r} (index | create | update)")
    idx = F.lit(index) if isinstance(index, str) else index
    meta_fields = [idx.alias("_index")]
    if id_col is not None:
        idc = F.col(id_col) if isinstance(id_col, str) else id_col
        meta_fields.append(idc.cast("string").alias("_id"))
    elif op == "update":
        raise ValueError("op='update' requires id_col")
    meta = F.concat(
        F.lit('{"' + op + '":'), F.to_json(F.struct(*meta_fields)), F.lit("}")
    )
    if doc_col is not None:
        doc = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    else:
        doc = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if op == "update":
        doc = F.concat(F.lit('{"doc":'), doc, F.lit(',"doc_as_upsert":true}'))
    return df.select(F.concat(meta, F.lit("\n"), doc).alias("value"))
