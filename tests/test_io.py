"""IO round-trips: text / JSON / EDN, compression, shards, dynamic
destinations — mirroring the reference's round-trip suite
(/root/reference/test/datasplash/core_test.clj:34-75,
api_test.clj:69-277)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datasplash_spark.functions import edn
from datasplash_spark.sources import (
    generate_input,
    kafka_read_options,
    read_edn_file,
    read_json_file,
    read_text_file,
    read_text_files,
    write_edn_file,
    write_json_file,
    write_text_file,
)

from tests.helpers import contains_only


def test_generate_input(spark):
    df = generate_input(spark, [(1, "a"), (2, "b")], "id int, name string")
    contains_only(df, [(1, "a"), (2, "b")])


def test_generate_input_empty_needs_schema(spark):
    with pytest.raises(ValueError):
        generate_input(spark, [])
    assert generate_input(spark, [], "id int").count() == 0


def test_text_roundtrip(spark, tmp_path):
    out = str(tmp_path / "txt")
    df = generate_input(spark, [("hello",), ("world",)], "value string")
    write_text_file(df, out)
    got = read_text_file(spark, out)
    contains_only(got, [("hello",), ("world",)])


def test_text_compression_gzip(spark, tmp_path):
    out = str(tmp_path / "gz")
    df = generate_input(spark, [(f"line{i}",) for i in range(100)], "value string")
    write_text_file(df, out, num_shards=2, compression="gzip")
    files = glob.glob(os.path.join(out, "part-*.gz"))
    assert 1 <= len(files) <= 2  # suffix check, core_test.clj:44-51
    assert read_text_file(spark, out).count() == 100


def test_text_bad_codec(spark, tmp_path):
    df = generate_input(spark, [("x",)], "value string")
    with pytest.raises(ValueError, match="codec"):
        write_text_file(df, str(tmp_path / "bad"), compression="brotli9000")


def test_text_dynamic_destinations(spark, tmp_path):
    """:dynamic? per-element destination → partitionBy (core.clj:1246-1252)."""
    out = str(tmp_path / "dyn")
    df = generate_input(
        spark, [("a", "g1"), ("b", "g2"), ("c", "g1")], "value string, dest string"
    )
    write_text_file(df, out, column="value", dynamic_by="dest")
    assert os.path.isdir(os.path.join(out, "dest=g1"))
    g1 = read_text_file(spark, os.path.join(out, "dest=g1"))
    contains_only(g1, [("a",), ("c",)])


def test_read_text_files_list(spark, tmp_path):
    """read-text-files: filenames as a collection (core.clj:1306-1332)."""
    p1, p2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    write_text_file(generate_input(spark, [("x",)], "value string"), p1)
    write_text_file(generate_input(spark, [("y",)], "value string"), p2)
    got = read_text_files(spark, [p1, p2])
    contains_only(got, [("x",), ("y",)])
    names_df = generate_input(spark, [(p1,), (p2,)], "fname string")
    assert read_text_files(spark, names_df).count() == 2


def test_json_roundtrip_with_dates_and_blanks(spark, tmp_path):
    """JSON-lines incl. blank lines dropped (api_test.clj:196-209)."""
    out = str(tmp_path / "js")
    df = generate_input(
        spark,
        [(1, "alice", "2021-01-01"), (2, "bob", None)],
        "id int, name string, d string",
    )
    write_json_file(df, out)
    # drop in an extra shard that is only blank lines (a fresh file —
    # appending to a Spark-written part file breaks its .crc sidecar)
    with open(os.path.join(out, "part-99999.json"), "w") as f:
        f.write("\n\n")
    got = read_json_file(spark, out, schema="id int, name string, d string")
    contains_only(
        got, [(1, "alice", "2021-01-01"), (2, "bob", None)]
    )


def test_edn_codec_unit():
    """Pure codec: the reference's value shapes (nested maps, keywords,
    sets, vectors — api_test.clj fixtures)."""
    v = edn.loads('{:key :a :val 42 :xs [1 2 3] :s #{1 2} :m {:nested "q\\"uote"}}')
    assert v[":key"] == ":a"
    assert v[":val"] == 42
    assert v[":xs"] == [1, 2, 3]
    assert v[":s"] == {1, 2}
    assert v[":m"] == {":nested": 'q"uote'}
    assert edn.loads("nil") is None and edn.loads("false") is False
    assert edn.loads("[1 2.5 sym]") == [1, 2.5, "sym"]
    # round-trip
    assert edn.loads(edn.dumps(v)) == v
    with pytest.raises(edn.EdnError):
        edn.loads("{:a}")
    with pytest.raises(edn.EdnError):
        edn.loads('"unterminated')


def test_edn_roundtrip(spark, tmp_path):
    out = str(tmp_path / "edn")
    df = generate_input(
        spark, [(1, "alice", 1.5), (2, "bob", 2.5)], "id bigint, name string, score double"
    )
    write_edn_file(df, out)
    # file content is real EDN with keyword keys
    lines = sorted(
        line
        for p in glob.glob(os.path.join(out, "part-*"))
        if not p.endswith(".crc")
        for line in open(p).read().strip().splitlines()
        if line
    )
    assert lines[0].startswith("{:id 1 :name ")
    got = read_edn_file(spark, out, schema="id bigint, name string, score double")
    contains_only(got, [(1, "alice", 1.5), (2, "bob", 2.5)])


def test_edn_schema_inference(spark, tmp_path):
    out = str(tmp_path / "edn2")
    df = generate_input(spark, [(1, "x"), (2, "y")], "id bigint, name string")
    write_edn_file(df, out)
    got = read_edn_file(spark, out)  # inferred
    assert set(got.columns) == {"id", "name"}
    assert got.count() == 2


def test_kafka_options_mapping():
    """Option surface parity (kafka.clj:33-77) — pure dict check."""
    opts = kafka_read_options(
        brokers=["b1:9092", "b2:9092"],
        topics=["t1", "t2"],
        max_records=500,
        read_committed=True,
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "t1,t2"
    assert opts["maxOffsetsPerTrigger"] == "500"
    assert opts["kafka.isolation.level"] == "read_committed"


def test_pubsub_codecs_and_timestamp_label(spark):
    """Pub/Sub data model (pubsub.clj:16-48, 55-121): string/raw
    codecs round-trip; :timestamp-label promotes an attribute (epoch
    millis or ISO-8601) to event_time."""
    from datasplash_spark.sources import (
        PUBSUB_MESSAGE_SCHEMA,
        decode_pubsub,
        encode_pubsub,
        pubsub_read_options,
    )

    msgs = spark.createDataFrame(
        [
            (b"hello", {"ts": "1700000000000"}, "m1", None),
            (b"world", {"ts": "2023-11-14T22:13:20Z"}, "m2", None),
        ],
        PUBSUB_MESSAGE_SCHEMA,
    )
    dec = decode_pubsub(msgs, type="string", timestamp_label="ts").collect()
    assert [r.value for r in dec] == ["hello", "world"]
    # both attribute shapes resolve to the same instant
    assert dec[0].event_time == dec[1].event_time

    raw = decode_pubsub(msgs, type="raw")
    assert "payload" in raw.columns and "attributes" in raw.columns

    enc = encode_pubsub(
        spark.createDataFrame(
            [("hi", dec[0].event_time)], "value string, event_time timestamp"
        ),
        type="string",
        attributes={"k": "v"},
        timestamp_label="ts",
    ).collect()[0]
    assert bytes(enc.payload) == b"hi"
    assert enc.attributes == {"k": "v", "ts": "1700000000000"}

    assert pubsub_read_options(subscription="s")["pubsublite.subscription"] == "s"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pubsub_read_options()


def test_rename_shards_default_and_custom(spark, tmp_path):
    """filename-policy emulation (core.clj:2173-2209): post-commit
    rename to a custom shard naming scheme."""
    from datasplash_spark.sources import rename_shards

    out = str(tmp_path / "named")
    df = generate_input(spark, [(f"r{i}",) for i in range(20)], "value string")
    write_text_file(df, out, num_shards=3)
    renamed = rename_shards(out, suffix=".txt")
    names = sorted(os.path.basename(p) for p in renamed)
    assert names[0] == "part-00000-of-00003.txt"
    assert len(names) == 3
    # data still readable after the rename, no stale .crc complaints
    assert read_text_file(spark, out).count() == 20
    # custom naming fn incl. compressed outputs keeping their codec ext
    out2 = str(tmp_path / "named_gz")
    write_text_file(df, out2, num_shards=2, compression="gzip")
    renamed2 = rename_shards(
        out2, naming_fn=lambda i, n, old: f"events-{i}.of{n}.gz"
    )
    assert sorted(os.path.basename(p) for p in renamed2) == [
        "events-0.of2.gz",
        "events-1.of2.gz",
    ]
    assert read_text_file(spark, out2).count() == 20


def test_checkpoint_returns_input_and_writes(spark, tmp_path):
    """:checkpoint option (core.clj:517-518): side-effect dump, same df back."""
    from datasplash_spark.operators import checkpoint

    df = generate_input(spark, [(1,), (2,)], "x int")
    got = checkpoint(df, str(tmp_path / "ckpt"), fmt="json")
    assert got is df
    dumped = read_json_file(spark, str(tmp_path / "ckpt"), schema="x int")
    contains_only(dumped, [(1,), (2,)])


def test_datastore_entity_roundtrip():
    """Entity ↔ dict conversion (datastore.clj:44-176; the
    datastore_test.clj:9-21 round-trip, over the JSON wire shape)."""
    import datetime as dt

    from datasplash_spark.sources import datastore as ds

    original = {
        "__kind__": "user",
        "__key__": "u1",
        "__namespace__": "prod",
        "name": "alice",
        "age": 42,
        "score": 1.5,
        "active": True,
        "blob": b"\x00\x01",
        "tags": ["a", "b"],
        "joined": dt.datetime(2021, 1, 2, 3, 4, 5),
        "address": {"city": "paris", "zip": 75001},
        "nothing": None,
    }
    entity = ds.py_to_entity(original)
    assert entity["key"]["path"][-1] == {"kind": "user", "name": "u1"}
    assert entity["key"]["partitionId"] == {"namespaceId": "prod"}
    assert entity["properties"]["age"] == {"integerValue": "42"}
    back = ds.entity_to_py(entity)
    assert back == original
    # ancestor paths survive
    child = ds.py_to_entity(
        {"__kind__": "order", "__key__": "o9",
         "__path__": [{"kind": "user", "key": "u1"}], "total": 10.0}
    )
    assert [p["kind"] for p in child["key"]["path"]] == ["user", "order"]
    back2 = ds.entity_to_py(child)
    assert back2["__path__"] == [{"kind": "user", "key": "u1"}]
    # unsupported type names itself
    import pytest as _pytest

    with _pytest.raises(ds.DatastoreError, match="cannot convert"):
        ds.py_to_value(object())
    with _pytest.raises(ds.DatastoreError, match="not supported"):
        ds.value_to_py({"futureValue": 1})


def test_write_edn_array_columns(spark, tmp_path):
    """Array-typed columns survive the EDN writer (numpy ndarray cells
    must not scalarize or crash)."""
    out = str(tmp_path / "ednarr")
    df = generate_input(
        spark,
        [(1, [1.5, 2.5], ["a"]), (2, [3.5], [])],
        "id bigint, xs array<double>, tags array<string>",
    )
    write_edn_file(df, out)
    got = read_edn_file(spark, out, schema="id bigint, xs array<double>, tags array<string>")
    contains_only(got, [(1, [1.5, 2.5], ["a"]), (2, [3.5], [])])


def test_edn_tagged_literals_unit():
    """clojure.edn reads #inst / #uuid out of the box
    (core.clj:1334-1378 relies on it); #_ discards; unknown tags use
    readers/default or raise."""
    import datetime as dt
    import uuid

    d = edn.loads('#inst "1985-04-12T23:20:50.520Z"')
    assert d == dt.datetime(1985, 4, 12, 23, 20, 50, 520000, tzinfo=dt.timezone.utc)
    # naive and offset forms normalize to UTC
    assert edn.loads('#inst "2024-01-01T01:00:00+01:00"') == dt.datetime(
        2024, 1, 1, 0, 0, tzinfo=dt.timezone.utc
    )
    u = edn.loads('#uuid "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"')
    assert u == uuid.UUID("f81d4fae-7dec-11d0-a765-00a0c91e6bf6")
    # round-trips (Clojure's print format)
    assert edn.loads(edn.dumps(d)) == d
    assert edn.dumps(u) == '#uuid "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"'
    # nested in collections
    v = edn.loads('{:when #inst "2024-06-01T12:00:00Z" :ids [#uuid "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"]}')
    assert v[":when"].year == 2024 and v[":ids"][0] == u
    # discard
    assert edn.loads("[1 #_ 2 3]") == [1, 3]
    assert edn.loads("#_ {:a 1} 42") == 42
    # custom reader + default passthrough
    assert edn.loads("#km 5", readers={"km": lambda v: v * 1000}) == 5000
    t = edn.loads("#custom/thing [1 2]", default=edn.Tagged)
    assert t == edn.Tagged("custom/thing", [1, 2])
    assert edn.loads(edn.dumps(t), default=edn.Tagged) == t
    import pytest as _pytest

    with _pytest.raises(edn.EdnError, match="no reader"):
        edn.loads("#mystery 1")


def test_edn_io_roundtrip_with_dates(spark, tmp_path):
    """Date-bearing EDN IO, mirroring the reference's date-heavy
    JSON/EDN tests (api_test.clj:69-277): timestamps survive
    write-edn-file → read-edn-file as TimestampType."""
    import datetime as dt

    out = str(tmp_path / "edn_dates")
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 3, 1, 10, 30, 0)),
            (2, dt.datetime(2024, 3, 2, 11, 45, 30, 250000)),
        ],
        "id bigint, at timestamp",
    )
    write_edn_file(df, out)
    # the raw lines carry Clojure-style #inst literals
    raw = spark.read.text(out).filter(F.length("value") > 0).collect()
    assert all("#inst" in r.value for r in raw)
    got = read_edn_file(spark, out, schema="id bigint, at timestamp")
    back = {r.id: r.at for r in got.collect()}
    assert back[1] == dt.datetime(2024, 3, 1, 10, 30, 0)
    assert back[2] == dt.datetime(2024, 3, 2, 11, 45, 30, 250000)


def test_json_corrupt_record_count(spark, tmp_path):
    """A malformed JSON line must be dropped, and metadata-only queries
    (count) must not trip Spark's corrupt-record-column restriction."""
    p = tmp_path / "bad.json"
    p.write_text('{"a": 1}\n{not json}\n{"a": 3}\n')
    df = read_json_file(spark, str(p))
    assert df.count() == 2  # the pruning-to-_corrupt_record path
    assert sorted(r.a for r in df.collect()) == [1, 3]


def test_elasticsearch_option_mappers():
    """es.clj:44-156 surface → elasticsearch-hadoop option keys."""
    from datasplash_spark.sources import (
        elasticsearch_read_options,
        elasticsearch_write_options,
    )

    r = elasticsearch_read_options(
        ["es1:9200", "es2:9200"], "docs/_doc",
        query='{"query":{"match_all":{}}}', batch_size=500,
    )
    assert r == {
        "es.nodes": "es1:9200,es2:9200",
        "es.resource": "docs/_doc",
        "es.query": '{"query":{"match_all":{}}}',
        "es.scroll.size": "500",
    }

    w = elasticsearch_write_options(
        ["es1:9200"], "docs/_doc", id_field="doc_id",
        max_batch_size=1000, max_batch_bytes=1 << 20, retry_count=0,
    )
    assert w == {
        "es.nodes": "es1:9200",
        "es.resource": "docs/_doc",
        "es.mapping.id": "doc_id",
        "es.batch.size.entries": "1000",
        "es.batch.size.bytes": str(1 << 20),
        "es.batch.write.retry.count": "0",
    }


def test_elasticsearch_routing_auth_and_retry_options():
    """The rest of the es.clj write/read schema: auth
    (es.clj:19-24), scroll keepalive (:scroll-keep-alive, es.clj:
    53-54), dynamic index routing (:index-fn, es.clj:122-124 →
    es.resource.write pattern), partial update (:use-partial-update,
    es.clj:131-133 → upsert op), retry config (es.clj:113-118)."""
    import pytest

    from datasplash_spark.sources import (
        elasticsearch_read_options,
        elasticsearch_write_options,
    )

    r = elasticsearch_read_options(
        ["es1:9200"], "docs", scroll_keep_alive="10m",
        username="u", password="p",
    )
    assert r["es.scroll.keepalive"] == "10m"
    assert r["es.net.http.auth.user"] == "u"
    assert r["es.net.http.auth.pass"] == "p"

    w = elasticsearch_write_options(
        ["es1:9200"], "docs", id_field="doc_id",
        index_pattern="logs-{day}", partial_update=True,
        retry_count=3, retry_wait_ms=500,
    )
    assert w["es.resource.write"] == "logs-{day}"
    assert w["es.write.operation"] == "upsert"
    assert w["es.batch.write.retry.count"] == "3"
    assert w["es.batch.write.retry.wait"] == "500ms"

    # partial update is meaningless without a doc id to target
    with pytest.raises(ValueError, match="id_field"):
        elasticsearch_write_options(["es1:9200"], "docs", partial_update=True)


def test_es_bulk_actions_roundtrip(spark, tmp_path):
    """Broker-less write-path round trip (the Kafka-decode pattern):
    rows → bulk-API action pairs with id-fn/index-fn routing
    (es.clj:119-141, ExtractKeyFn.java:24-36) → local bulk file →
    parse back and verify routing + payload."""
    import json

    from pyspark.sql import functions as F

    from datasplash_spark.sources import es_bulk_actions, write_text_file

    df = spark.createDataFrame(
        [(1, "alpha", "2024-01-01"), (2, "beta", "2024-01-02")],
        "doc_id int, body string, day string",
    )
    # index-fn analog: per-document target index from a column expr
    bulk = es_bulk_actions(
        df,
        index=F.concat(F.lit("logs-"), F.col("day")),
        id_col="doc_id",
    )
    out = str(tmp_path / "bulk")
    write_text_file(bulk, out, num_shards=1)

    lines = []
    for p in sorted((tmp_path / "bulk").glob("**/part*")):
        lines += [ln for ln in p.read_text().splitlines() if ln]
    assert len(lines) == 4  # 2 docs x (action line + source line)
    actions = [json.loads(lines[i]) for i in (0, 2)]
    docs = [json.loads(lines[i]) for i in (1, 3)]
    by_id = {a["index"]["_id"]: (a, d) for a, d in zip(actions, docs)}
    assert by_id["1"][0]["index"]["_index"] == "logs-2024-01-01"
    assert by_id["2"][0]["index"]["_index"] == "logs-2024-01-02"
    assert by_id["1"][1] == {"doc_id": 1, "body": "alpha", "day": "2024-01-01"}

    # partial-update form wraps the source as a doc_as_upsert
    upd = es_bulk_actions(df, index="docs", id_col="doc_id", op="update")
    row = upd.orderBy("value").first()["value"].split("\n")
    meta, body = json.loads(row[0]), json.loads(row[1])
    assert set(meta) == {"update"} and meta["update"]["_index"] == "docs"
    assert body["doc_as_upsert"] is True and body["doc"]["body"] in ("alpha", "beta")


def test_compact_parquet_reduces_files(spark, tmp_path):
    """Many tiny files → few near-target files; data survives."""
    from datasplash_spark.sources import compact_parquet, generate_input

    src = str(tmp_path / "tiny")
    df = generate_input(spark, [(i, f"v{i}") for i in range(1000)], "k bigint, v string")
    df.repartition(50).write.parquet(src)
    import os

    n_src = sum(
        1 for _r, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_src >= 50
    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_mb=256)
    assert n == 1
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    assert {r.k for r in back.collect()} == set(range(1000))


def test_es_bulk_actions_escaping_preserves_framing(spark):
    """Bulk framing safety: the ES bulk protocol is newline-framed, so
    doc content containing newlines/quotes/backslashes/control chars
    must be JSON-escaped by the encoder — each row yields EXACTLY one
    action line + one source line, parsing back to the original."""
    import json

    from datasplash_spark.sources import es_bulk_actions

    nasty = [
        (1, 'line1\nline2\r\ntab\t"quoted" back\\slash'),
        (2, "unicode: é中文 \U0001f600"),
        (3, "ctrl:\x01\x1f end"),
        (4, ""),
    ]
    df = spark.createDataFrame(nasty, "doc_id int, body string")
    rows = es_bulk_actions(df, index="docs", id_col="doc_id").collect()
    by_id = {}
    for r in rows:
        lines = r["value"].split("\n")
        assert len(lines) == 2, f"framing broken: {r['value']!r}"
        meta, doc = json.loads(lines[0]), json.loads(lines[1])
        by_id[int(meta["index"]["_id"])] = doc
    for doc_id, body in nasty:
        assert by_id[doc_id]["body"] == body, doc_id


def test_write_training_shards_replays_order(spark, tmp_path):
    """Shards read back in filename order replay the md5 total order;
    the retained shuffle_key is a resume cursor; same seed rewrites
    byte-identically, new seed reorders."""
    import os

    from datasplash_spark.sources import write_training_shards

    df = generate_input(
        spark,
        [(i, f"doc number {i}") for i in range(300)],
        "doc_id bigint, text string",
    ).repartition(7)
    out = str(tmp_path / "shards")
    write_training_shards(df, out, 5, "doc_id", num_shards=4)

    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    assert len(parts) == 4
    keys = []
    for p in parts:
        rows = spark.read.parquet(os.path.join(out, p)).select("shuffle_key").collect()
        keys.extend(r.shuffle_key for r in rows)
    assert keys == sorted(keys) and len(keys) == 300

    # resume cursor: strictly-after filter reproduces the tail
    cut = keys[149]
    tail = (
        spark.read.parquet(out)
        .filter(F.col("shuffle_key") > cut)
        .select("shuffle_key")
        .collect()
    )
    assert sorted(r.shuffle_key for r in tail) == keys[150:]

    # new epoch = new seed -> different order, same example set
    out2 = str(tmp_path / "shards2")
    write_training_shards(df, out2, 6, "doc_id", num_shards=4)
    ids1 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    ids2 = sorted(r.doc_id for r in spark.read.parquet(out2).collect())
    assert ids1 == ids2 == list(range(300))
    k2 = [r.shuffle_key for r in spark.read.parquet(out2).collect()]
    assert sorted(k2) != keys


def test_tar_shards_webdataset_roundtrip(spark, tmp_path):
    """WebDataset tar shards (round 10): reader splits every shard
    member into (shard, key, ext, data) rows with the basename
    grouping convention; the writer lays the same structure back one
    tar per shard id (atomic rename), and a read-back roundtrips
    byte-for-byte. Samples reassemble by (shard, key)."""
    import io
    import tarfile

    from datasplash_spark.sources.archives import (
        read_tar_shards,
        write_tar_shards,
    )

    src = tmp_path / "shards"
    src.mkdir()
    want = {}
    for s in range(2):
        with tarfile.open(src / f"shard{s}.tar", "w") as tf:
            for k in range(3):
                for ext, data in (
                    ("txt", f"text {s}-{k}".encode()),
                    ("json", b'{"a":%d}' % k),
                ):
                    name = f"{s:03d}{k:03d}.{ext}"
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                    want[(f"{s:03d}{k:03d}", ext)] = data
    df = read_tar_shards(spark, str(src / "*.tar"))
    rows = df.collect()
    assert len(rows) == 12
    got = {(r.key, r.ext): bytes(r.data) for r in rows}
    assert got == want
    # sample grouping: every key has exactly its two extensions
    groups = {
        r.key: sorted(r.exts)
        for r in df.groupBy("key")
        .agg(F.sort_array(F.collect_list("ext")).alias("exts"))
        .collect()
    }
    assert all(v == ["json", "txt"] for v in groups.values())
    # write back sharded by key prefix, read back identical
    out = str(tmp_path / "out")
    res = write_tar_shards(
        df.select(
            F.substring("key", 1, 3).alias("shard_id"), "key", "ext",
            "data",
        ),
        out,
    ).collect()
    assert sorted(r.n_members for r in res) == [6, 6]
    assert all(r.path.endswith(".tar") for r in res)
    back = read_tar_shards(spark, out + "/*.tar")
    assert {
        (r.key, r.ext): bytes(r.data) for r in back.collect()
    } == want


def test_zip_shards_roundtrip(spark, tmp_path):
    """ZIP shards (round 10): the zip twins of the tar pair — same
    (shard, key, ext, data) rows, Stored AND Deflated members read,
    directory entries skipped, writer is atomic + deterministic
    (fixed timestamps) and a read-back roundtrips byte-for-byte."""
    import io
    import zipfile

    from datasplash_spark.sources.archives import (
        read_zip_shards,
        write_zip_shards,
    )

    src = tmp_path / "zips"
    src.mkdir()
    want = {}
    for s in range(2):
        comp = zipfile.ZIP_STORED if s == 0 else zipfile.ZIP_DEFLATED
        with zipfile.ZipFile(src / f"shard{s}.zip", "w", comp) as zf:
            zf.writestr("subdir/", b"")  # directory entry: skipped
            for k in range(3):
                for ext, data in (
                    ("txt", f"text {s}-{k}".encode()),
                    ("json", b'{"a":%d}' % k),
                ):
                    name = f"subdir/{s:03d}{k:03d}.{ext}"
                    zf.writestr(name, data)
                    want[(f"{s:03d}{k:03d}", ext)] = data
    df = read_zip_shards(spark, str(src / "*.zip"))
    rows = df.collect()
    assert len(rows) == 12
    assert {(r.key, r.ext): bytes(r.data) for r in rows} == want
    # write back sharded by key prefix, read back identical
    out = str(tmp_path / "out")
    res = write_zip_shards(
        df.select(
            F.substring("key", 1, 3).alias("shard_id"), "key", "ext",
            "data",
        ),
        out,
    ).collect()
    assert sorted(r.n_members for r in res) == [6, 6]
    assert all(r.path.endswith(".zip") for r in res)
    back = read_zip_shards(spark, out + "/*.zip")
    assert {
        (r.key, r.ext): bytes(r.data) for r in back.collect()
    } == want
    # determinism: rewriting yields byte-identical shard files
    import hashlib

    h1 = {
        r.shard_id: hashlib.md5(open(r.path, "rb").read()).hexdigest()
        for r in res
    }
    res2 = write_zip_shards(
        df.select(
            F.substring("key", 1, 3).alias("shard_id"), "key", "ext",
            "data",
        ),
        out,
    ).collect()
    h2 = {
        r.shard_id: hashlib.md5(open(r.path, "rb").read()).hexdigest()
        for r in res2
    }
    assert h1 == h2


def test_warc_roundtrip_and_reader(spark, tmp_path):
    """WARC (round 10): writer → parser roundtrips plain and
    per-record-gzipped layouts; framing is strictly Content-Length
    (a payload containing 'WARC/1.0' must NOT split a record);
    malformed records quarantine by name; the Spark reader types
    every record of every shard."""
    from datasplash_spark.sources.archives import (
        encode_warc,
        parse_warc_records,
        read_warc,
    )

    recs = [
        {"warc_type": "response", "target_uri": "http://ex.com/a",
         "content_type": "text/html", "payload": b"<html>hi</html>"},
        {"warc_type": "warcinfo",
         "payload": b"trap\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n"},
        {"warc_type": "response", "target_uri": "http://ex.com/b",
         "payload": bytes(range(256))},
    ]
    for gz in (False, True):
        raw = encode_warc(recs, gzip_members=gz)
        got = parse_warc_records(raw)
        assert [g["warc_type"] for g in got] == [
            "response", "warcinfo", "response",
        ]
        assert got[1]["payload"] == recs[1]["payload"]  # framing held
        assert got[2]["payload"] == bytes(range(256))
        assert got[0]["content_type"] == "text/html"
        fn = tmp_path / (f"t{gz}.warc" + (".gz" if gz else ""))
        fn.write_bytes(raw)
    with pytest.raises(ValueError, match="version line"):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_records(
            b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"
        )

    df = read_warc(spark, str(tmp_path / "*.warc*"))
    assert df.count() == 6
    resp = df.where("warc_type = 'response'")
    assert resp.count() == 4
    uris = {r.target_uri for r in resp.collect()}
    assert uris == {"http://ex.com/a", "http://ex.com/b"}


def test_tar_samples_reassembly(spark, tmp_path):
    """tar_samples: member rows pivot back into one row per sample
    with a binary column per extension (explicit value list, no
    discovery scan); missing members are null."""
    import io
    import tarfile

    from datasplash_spark.sources.archives import (
        read_tar_shards,
        tar_samples,
    )

    with tarfile.open(tmp_path / "s.tar", "w") as tf:
        for name, data in (
            ("a.txt", b"alpha"), ("a.json", b"{}"),
            ("b.txt", b"beta"),  # no json for b
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    members = read_tar_shards(spark, str(tmp_path / "*.tar"))
    samples = {
        r.key: r for r in tar_samples(members, ["txt", "json"]).collect()
    }
    assert bytes(samples["a"].txt) == b"alpha"
    assert bytes(samples["a"].json) == b"{}"
    assert bytes(samples["b"].txt) == b"beta"
    assert samples["b"].json is None
    # explicit-values pivot: no discovery aggregate in the plan
    plan = tar_samples(members, ["txt", "json"])._jdf.queryExecution().optimizedPlan().toString()
    assert "pivotfirst" in plan.lower() or "first(" in plan.lower()
