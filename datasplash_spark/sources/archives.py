"""Training-corpus archive sources: WebDataset tar shards, ZIP
shards, and WARC (round 10).

The container formats real pre-training pipelines actually read:

- **WebDataset tar shards** — the standard layout for multimodal
  datasets (a dataset is a directory of ``.tar`` shards; each sample
  is a group of members sharing a basename: ``000017.jpg``,
  ``000017.txt``, ``000017.json``). :func:`read_tar_shards` turns a
  shard glob into ``(shard, key, ext, data)`` rows —
  ``binaryFile`` scan + stdlib ``tarfile`` over Arrow batches, so
  member bytes go straight from the shard to the decode kernel on
  the same executor (bytes never shuffle). :func:`write_tar_shards`
  writes the same layout back, one tar per shard id, atomically
  (tmp + rename).
- **ZIP shards** — Kaggle-style dumps and scraped bundles.
  :func:`read_zip_shards` / :func:`write_zip_shards` are drop-in
  twins of the tar pair (same row schema, same grouping
  convention), stdlib ``zipfile``, Stored + Deflated members.
- **WARC 1.0/1.1** — Common Crawl's format. :func:`read_warc`
  parses both plain ``.warc`` and per-record-gzipped ``.warc.gz``
  (member-concatenated — stdlib ``zlib`` loop) into typed records
  ``(warc_type, target_uri, date, content_type, content_length,
  payload)``, framed by ``Content-Length`` arithmetic (never by
  payload sniffing, so binary payloads with WARC-looking bytes
  can't split records). :func:`encode_warc` writes records back
  (optionally per-record-gzipped, the Common Crawl convention) —
  the fixture half.

Scale posture: shards are the parallelism unit (the ``binaryFile``
scan reads whole files — standard 0.1–1 GB shards at 100 TB give
100k–1M splittable tasks); record/member iteration is stdlib over
in-memory bytes; everything downstream is ordinary DataFrame ops.

Reference anchor: generalizes the reference's file-based IO family
(datasplash read-text-file / compressed IO, sources/files.py here);
the shard/record layouts are public conventions (WebDataset, ISO
28500 WARC).
"""

from __future__ import annotations

import io
import os
import tarfile
import zipfile
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAR_MEMBER_SCHEMA = (
    "shard string, member string, key string, ext string, data binary"
)

WARC_RECORD_SCHEMA = (
    "shard string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length bigint, "
    "payload binary"
)


#: the (fixed) binaryFile source schema — needed explicitly for the
#: STREAMING reader (file stream sources require a user schema)
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, "
    "content binary"
)


def read_tar_shards(
    spark, path_glob: str, watch_new_files: bool = False
) -> DataFrame:
    """WebDataset-style reader: every regular member of every tar
    shard under ``path_glob`` as one row ``(shard, member, key,
    ext, data)`` where ``key`` is the member name up to the first
    dot and ``ext`` the rest — the WebDataset sample-grouping
    convention (group by ``(shard, key)`` to reassemble samples).
    Sparse/invalid tars raise inside the task (fail loudly; a
    corrupt shard is an ingest incident, not a row-level poison).
    ``watch_new_files=True`` returns a STREAMING DataFrame polling
    the directory — new shards flow through the same member split
    into any streaming sink/admitter (same contract as
    ``read_text_file(watch_new_files=True)``)."""
    import pandas as pd

    if watch_new_files:
        files = (
            spark.readStream.format("binaryFile")
            .schema(_BINARY_FILE_SCHEMA)
            .load(path_glob)
        )
    else:
        files = spark.read.format("binaryFile").load(path_glob)

    def split(batches):
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                rows.extend(split_tar_members(path, bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=["shard", "member", "key", "ext", "data"],
            )

    return files.select("path", "content").mapInPandas(
        split, schema=TAR_MEMBER_SCHEMA
    )


def split_tar_members(
    shard: str, raw: bytes
) -> "list[tuple[str, str, str, str, bytes]]":
    """The ONE copy of the WebDataset member split (round 13,
    factored out of :func:`read_tar_shards` so in-plan tar bytes —
    e.g. the AV sidecar-pairing kernel — walk the same code path as
    the binaryFile reader): every regular member of ``raw`` as
    ``(shard, member, key, ext, data)`` with ``key`` the basename up
    to the first dot and ``ext`` the rest."""
    rows = []
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r:*") as tf:
        for m in tf:
            if not m.isreg():
                continue
            f = tf.extractfile(m)
            data = f.read() if f is not None else b""
            base = m.name.rsplit("/", 1)[-1]
            dot = base.find(".")
            key = base[:dot] if dot > 0 else base
            ext = base[dot + 1 :] if dot > 0 else ""
            rows.append((shard, m.name, key, ext, data))
    return rows


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard_id",
    key_col: str = "key",
    ext_col: str = "ext",
    data_col: str = "data",
) -> DataFrame:
    """WebDataset-style writer: one ``{shard_id}.tar`` per distinct
    ``shard_col`` value, members named ``{key}.{ext}``, written
    atomically (tmp file + rename) from the executor holding the
    shard's rows. Returns ``(shard_id, path, n_members)`` — an
    action has to consume it (the write happens inside the plan,
    like every Spark sink). Rows are shuffled by ``shard_col`` so
    each tar is written exactly once; pick shard ids with ~1 GB of
    members at scale (e.g. ``hash_split`` / ``pack_sequences`` pack
    ids)."""
    import pandas as pd

    def write(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # created in the KERNEL: the write runs on the executor
        # holding the shard's rows, which on a real cluster is not
        # the driver's filesystem (review finding)
        os.makedirs(out_dir, exist_ok=True)
        sid = str(pdf[shard_col].iloc[0])
        path = os.path.join(out_dir, f"{sid}.tar")
        tmp = path + ".inprogress"
        with tarfile.open(tmp, "w") as tf:
            ordered = pdf.sort_values([key_col, ext_col])
            for _, row in ordered.iterrows():
                data = bytes(row[data_col])
                name = (
                    f"{row[key_col]}.{row[ext_col]}"
                    if row[ext_col]
                    else str(row[key_col])
                )
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard_id": [sid], "path": [path], "n_members": [len(pdf)]}
        )

    return (
        df.select(shard_col, key_col, ext_col, data_col)
        .groupBy(shard_col)
        .applyInPandas(write, schema="shard_id string, path string, n_members bigint")
    )


def read_zip_shards(
    spark, path_glob: str, watch_new_files: bool = False
) -> DataFrame:
    """ZIP-shard reader, same contract and row schema as
    :func:`read_tar_shards` (``shard, member, key, ext, data``) —
    datasets distributed as zips (Kaggle-style dumps, scraped
    bundles) ingest through the identical WebDataset grouping path.
    Stdlib ``zipfile`` over the in-memory shard (central-directory
    based, so Stored and Deflated members both read); directory
    entries are skipped; a corrupt shard raises inside the task
    (ingest incident, not row poison). ``watch_new_files=True``
    returns a STREAMING DataFrame polling the directory."""
    import pandas as pd

    if watch_new_files:
        files = (
            spark.readStream.format("binaryFile")
            .schema(_BINARY_FILE_SCHEMA)
            .load(path_glob)
        )
    else:
        files = spark.read.format("binaryFile").load(path_glob)

    def split(batches):
        for b in batches:
            shards, members, keys, exts, datas = [], [], [], [], []
            for path, content in zip(b["path"], b["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        data = zf.read(info)
                        base = info.filename.rsplit("/", 1)[-1]
                        dot = base.find(".")
                        key = base[:dot] if dot > 0 else base
                        ext = base[dot + 1 :] if dot > 0 else ""
                        shards.append(path)
                        members.append(info.filename)
                        keys.append(key)
                        exts.append(ext)
                        datas.append(data)
            yield pd.DataFrame(
                {
                    "shard": shards, "member": members, "key": keys,
                    "ext": exts, "data": datas,
                }
            )

    return files.select("path", "content").mapInPandas(
        split, schema=TAR_MEMBER_SCHEMA
    )


def write_zip_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard_id",
    key_col: str = "key",
    ext_col: str = "ext",
    data_col: str = "data",
    compression: str = "deflated",
) -> DataFrame:
    """ZIP twin of :func:`write_tar_shards`: one ``{shard_id}.zip``
    per distinct ``shard_col`` value, members named ``{key}.{ext}``,
    atomic tmp+rename, returned as ``(shard_id, path, n_members)``.
    ``compression``: "deflated" (default) or "stored" (already-
    compressed payloads — media bytes — should skip the second
    deflate)."""
    import pandas as pd

    comp = {
        "deflated": zipfile.ZIP_DEFLATED,
        "stored": zipfile.ZIP_STORED,
    }[compression]
    def write(pdf: "pd.DataFrame") -> "pd.DataFrame":
        os.makedirs(out_dir, exist_ok=True)
        sid = str(pdf[shard_col].iloc[0])
        path = os.path.join(out_dir, f"{sid}.zip")
        tmp = path + ".inprogress"
        with zipfile.ZipFile(tmp, "w", compression=comp) as zf:
            ordered = pdf.sort_values([key_col, ext_col])
            for _, row in ordered.iterrows():
                name = (
                    f"{row[key_col]}.{row[ext_col]}"
                    if row[ext_col]
                    else str(row[key_col])
                )
                # fixed timestamp: shard bytes must be deterministic
                # (replay produces identical files)
                info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = comp
                zf.writestr(info, bytes(row[data_col]))
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard_id": [sid], "path": [path], "n_members": [len(pdf)]}
        )

    return (
        df.select(shard_col, key_col, ext_col, data_col)
        .groupBy(shard_col)
        .applyInPandas(
            write, schema="shard_id string, path string, n_members bigint"
        )
    )


def tar_samples(members: DataFrame, exts: list[str]) -> DataFrame:
    """Reassemble WebDataset SAMPLES from member rows: one row per
    ``(shard, key)`` with one binary column per extension in
    ``exts`` (explicit value list — no pivot discovery scan, the
    same rule as ``pivot_table``). Missing members are null; route
    each column to its decoder from here."""
    return (
        members.groupBy("shard", "key")
        .pivot("ext", list(exts))
        .agg(F.first("data"))
    )


# ---------------------------------------------------------------------
# WARC
# ---------------------------------------------------------------------


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    per-record layout) into one plain byte stream."""
    out = bytearray()
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(raw[pos:])
        out += d.flush()
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc: bad gzip member")
        pos += consumed
    return bytes(out)


def parse_warc_records(raw: bytes) -> list[dict]:
    """Parse WARC bytes (plain, or gzip-member concatenated) into
    ``[{"warc_type", "target_uri", "warc_date", "content_type",
    "content_length", "payload"}, ...]``. Framing is strictly by the
    mandatory ``Content-Length`` header (ISO 28500) — payload bytes
    are never sniffed."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    records = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not raw[pos : pos + 5] == b"WARC/":
            raise ValueError(f"warc: expected version line at {pos}")
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("warc: unterminated record header")
        headers: dict[str, str] = {}
        lines = raw[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: missing/bad Content-Length") from None
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("warc: truncated record payload")
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": clen,
                "payload": raw[body_start : body_start + clen],
            }
        )
        pos = body_start + clen
    return records


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """WARC writer (fixture half): each record dict takes
    ``warc_type``, ``payload``, and optional ``target_uri`` /
    ``warc_date`` / ``content_type``. ``gzip_members=True`` gzips
    each record independently (the Common Crawl layout)."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = bytes(r.get("payload", b""))
        lines = [b"WARC/1.0"]
        lines.append(
            b"WARC-Type: " + str(r.get("warc_type", "resource")).encode()
        )
        if r.get("target_uri"):
            lines.append(
                b"WARC-Target-URI: " + str(r["target_uri"]).encode()
            )
        lines.append(
            b"WARC-Date: "
            + str(r.get("warc_date", "2026-01-01T00:00:00Z")).encode()
        )
        lines.append(b"WARC-Record-ID: <urn:uuid:%08d>" % i)
        if r.get("content_type"):
            lines.append(
                b"Content-Type: " + str(r["content_type"]).encode()
            )
        lines.append(b"Content-Length: %d" % len(payload))
        rec = b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def read_warc(
    spark, path_glob: str, watch_new_files: bool = False
) -> DataFrame:
    """WARC reader: every record of every (possibly ``.gz``) WARC
    file under ``path_glob`` as one typed row. Shards are the
    parallelism unit (``binaryFile`` scan); records parse where the
    shard bytes live and only the rows you select shuffle — filter
    on ``warc_type`` / ``content_type`` early so pruning happens
    before any payload decode. ``watch_new_files=True`` returns a
    STREAMING DataFrame polling the directory — continuous crawl
    ingestion, same contract as the tar/zip readers (each shard is
    read exactly once; downstream ``web_ingest_prep``-style stages
    compose per micro-batch)."""
    import pandas as pd

    if watch_new_files:
        files = (
            spark.readStream.format("binaryFile")
            .schema(_BINARY_FILE_SCHEMA)
            .load(path_glob)
        )
    else:
        files = spark.read.format("binaryFile").load(path_glob)

    def split(batches):
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                for i, rec in enumerate(
                    parse_warc_records(bytes(content))
                ):
                    rows.append(
                        (path, i, rec["warc_type"], rec["target_uri"],
                         rec["warc_date"], rec["content_type"],
                         rec["content_length"], rec["payload"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "record_idx", "warc_type", "target_uri",
                    "warc_date", "content_type", "content_length",
                    "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(
        split, schema=WARC_RECORD_SCHEMA
    )


WARC_ROUNDTRIP_SCHEMA = (
    "doc_id bigint, n_records int, total_len bigint, "
    "payload_md5 string, first_uri string, ok boolean"
)


def warc_roundtrip_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """In-kernel WARC encode→parse round-trip (the corpus gate for
    the archive family, round 11): each document becomes a mini WARC
    shard of ``1 + doc_id % 3`` records (a ``response`` then
    ``metadata`` records, payload ``rec-{i}:{text}``), written with
    :func:`encode_warc` — per-record-gzipped for even doc_ids, plain
    for odd, so both Common Crawl layouts gate — and immediately
    re-parsed with :func:`parse_warc_records` in the SAME kernel.
    Content-Length framing, the header walk, and the gzip-member
    loop are exercised corpus-wide while shard bytes never leave the
    task: only ``(doc_id, count, length, md5, uri, ok)`` rows cross.
    Any framing error shifts every subsequent record and fails the
    payload md5."""
    import hashlib

    import pandas as pd

    def run(batches):
        for b in batches:
            rows = []
            for doc_id, text in zip(b[id_col], b[text_col]):
                doc_id = int(doc_id)
                n = 1 + doc_id % 3
                payloads = [
                    ("rec-%d:%s" % (i, text)).encode() for i in range(n)
                ]
                recs = [
                    {
                        "warc_type": "response" if i == 0 else "metadata",
                        "target_uri": "https://example.com/%d/%d"
                        % (doc_id, i),
                        "content_type": "text/plain",
                        "payload": payloads[i],
                    }
                    for i in range(n)
                ]
                raw = encode_warc(recs, gzip_members=(doc_id % 2 == 0))
                parsed = parse_warc_records(raw)
                ok = (
                    len(parsed) == n
                    and all(
                        p["payload"] == payloads[i]
                        and p["content_length"] == len(payloads[i])
                        and p["target_uri"]
                        == "https://example.com/%d/%d" % (doc_id, i)
                        and p["warc_type"]
                        == ("response" if i == 0 else "metadata")
                        for i, p in enumerate(parsed)
                    )
                )
                rows.append(
                    (
                        doc_id,
                        len(parsed),
                        sum(p["content_length"] for p in parsed),
                        hashlib.md5(
                            b"".join(p["payload"] for p in parsed)
                        ).hexdigest(),
                        parsed[0]["target_uri"] if parsed else "",
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_records", "total_len", "payload_md5",
                    "first_uri", "ok",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=WARC_ROUNDTRIP_SCHEMA
    )


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard_id",
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    type_col: str | None = None,
    content_type: str = "text/html",
    gzip_members: bool = True,
) -> DataFrame:
    """WARC shard writer (round 11): one ``{shard_id}.warc.gz`` (or
    ``.warc`` when ``gzip_members=False``) per distinct ``shard_col``
    value, records ordered by ``uri_col``, written atomically
    (tmp file + rename) from the executor holding the shard's rows —
    the Common Crawl layout :func:`read_warc` reads back. Returns
    ``(shard_id, path, n_records)``; an action has to consume it.
    Rows shuffle ONCE by ``shard_col``; pick shard ids targeting
    ~0.5-1 GB per shard at scale so the read side gets well-sized
    ``binaryFile`` tasks."""
    import pandas as pd

    suffix = ".warc.gz" if gzip_members else ".warc"

    def write(pdf: "pd.DataFrame") -> "pd.DataFrame":
        os.makedirs(out_dir, exist_ok=True)
        sid = str(pdf[shard_col].iloc[0])
        path = os.path.join(out_dir, f"{sid}{suffix}")
        tmp = path + ".inprogress"
        ordered = pdf.sort_values(uri_col)
        recs = [
            {
                "warc_type": (
                    str(row[type_col]) if type_col else "response"
                ),
                "target_uri": str(row[uri_col]),
                "content_type": content_type,
                "payload": (
                    b""
                    if row[payload_col] is None
                    else row[payload_col].encode()
                    if isinstance(row[payload_col], str)
                    else bytes(row[payload_col])
                ),
            }
            for _, row in ordered.iterrows()
        ]
        with open(tmp, "wb") as fh:
            fh.write(encode_warc(recs, gzip_members=gzip_members))
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard_id": [sid], "path": [path], "n_records": [len(pdf)]}
        )

    cols = [shard_col, uri_col, payload_col] + (
        [type_col] if type_col else []
    )
    return (
        df.select(*cols)
        .groupBy(shard_col)
        .applyInPandas(
            write, schema="shard_id string, path string, n_records bigint"
        )
    )
