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
