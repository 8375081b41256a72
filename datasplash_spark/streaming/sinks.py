"""Streaming sinks + trigger mapping.

Beam window options (/root/reference/src/clj/datasplash/core.clj:
2082-2094) configure `:trigger` / `:with-allowed-lateness` /
`:accumulate-mode` on a *window*; Spark configures triggers on the
*query* (``writeStream.trigger``) and lateness via ``withWatermark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def beam_trigger_to_spark(trigger: str | dict | None) -> dict:
    """Translate the reference's trigger vocabulary into
    ``writeStream.trigger`` kwargs.

    - ``None`` / "default"  → micro-batch ASAP (``{}``)
    - {"processing-time": "10 seconds"} → processingTime
    - "once" → availableNow (one drain then stop)
    - "continuous:1 second" → continuous (experimental)
    """
    if trigger in (None, "default"):
        return {}
    if trigger == "once":
        return {"availableNow": True}
    if isinstance(trigger, str) and trigger.startswith("continuous:"):
        return {"continuous": trigger.split(":", 1)[1]}
    if isinstance(trigger, dict) and "processing-time" in trigger:
        return {"processingTime": trigger["processing-time"]}
    raise ValueError(f"unsupported trigger {trigger!r}")


def write_stream(
    df: DataFrame,
    fmt: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    trigger: str | dict | None = None,
    path: str | None = None,
    query_name: str | None = None,
    **options,
):
    """Start a streaming sink. ``output_mode``: append (≈ discard
    panes at watermark close), update/complete (≈ accumulating
    panes) — the closest Spark rendering of the reference's
    ``:accumulate-mode`` (documented gap, SURVEY §7.3a)."""
    writer = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    kwargs = beam_trigger_to_spark(trigger)
    if kwargs:
        writer = writer.trigger(**kwargs)
    if query_name:
        writer = writer.queryName(query_name)
    if path:
        writer = writer.option("path", path)
    return writer.start()


def foreach_batch_sink(
    df: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    trigger: str | dict | None = None,
    query_name: str | None = None,
):
    """``foreachBatch`` escape hatch: run an arbitrary BATCH write per
    micro-batch — the Spark idiom for sinks with no streaming
    connector (JDBC upserts, MERGE INTO, multi-table fan-out), and the
    closest analog of the reference's custom-sink ParDo endings.

    ``batch_fn(batch_df, batch_id)`` receives a normal DataFrame.
    Exactly-once discipline is the CALLER's: Spark guarantees
    at-least-once per batch id after recovery, so the write must be
    idempotent ON ``batch_id`` — overwrite a batch-keyed partition,
    MERGE on a key, or skip already-committed ids; a blind append
    duplicates rows on replay (documented Spark semantics, not a gap
    this wrapper can close).
    """
    writer = df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    kwargs = beam_trigger_to_spark(trigger)
    if kwargs:
        writer = writer.trigger(**kwargs)
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()


def idempotent_parquet_batch_writer(path: str):
    """A ready-made ``batch_fn`` for :func:`foreach_batch_sink`:
    writes each micro-batch to ``path/_batch_id=<id>`` with
    dynamic-partition OVERWRITE, so a replayed batch id rewrites its
    own partition instead of appending duplicates — idempotence
    keyed on the batch id, the standard exactly-once-to-files recipe.
    Readers scan ``path`` and drop the ``_batch_id`` column.
    """
    from pyspark.sql import functions as F

    def write(batch_df: DataFrame, batch_id: int) -> None:
        # per-WRITE option rather than session conf: DataFrameWriter
        # options override spark.sql.sources.partitionOverwriteMode
        # for this write only, so nothing leaks into later static-
        # partition overwrites and there is no set/restore race with
        # concurrent streaming queries sharing the session.
        (
            batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return write
