"""Streaming: unbounded collections, stateful DoFns, triggers.

Reference parity: unbounded pcolls come from Pub/Sub
(/root/reference/src/clj/datasplash/pubsub.clj:57-89), Kafka
(kafka.clj:103-132) and ``:watch-new-files`` text reads
(core.clj:1207-1217); per-key mutable state is ``ClojureStatefulDoFn``
(/root/reference/src/java/ClojureStatefulDoFn.java:14-42) driven by
``{:stateful? true}`` (core.clj:258-272); window triggers /
allowed-lateness / accumulation mode are core.clj:2082-2094.

Spark mapping: Structured Streaming uses the same DataFrame API
(``isStreaming`` flag); state = ``applyInPandasWithState``; triggers
map onto ``writeStream.trigger`` + output modes for the COARSE
shapes, and — round 10 — :mod:`.triggers` EMULATES Beam's pane model
directly on the keyed state store for the common trigger shapes
(AfterWatermark with early/late firings, Repeatedly-AfterCount) with
real PaneInfo metadata (pane_index, EARLY/ON_TIME/LATE timing,
is_last) and exact accumulating/discarding accumulation. What stays
approximate: processing-time triggers tie to micro-batch cadence
(SURVEY §7.3a).
"""

from .stateful import batch_stateful, dedup_stream, rolling_agg, running_agg, stateful_map_groups
from .triggers import PANED_OUTPUT_SCHEMA, paned_window_agg
from .sinks import (
    beam_trigger_to_spark,
    foreach_batch_sink,
    idempotent_parquet_batch_writer,
    write_stream,
)
from .neardup import (
    near_dedup_admitter,
    near_dedup_ingest,
    compact_store,
    quota_admitter,
    compact_postings,
    postings_admitter,
    postings_ingest,
    quota_ingest,
    semantic_admitter,
    semantic_ingest,
)

__all__ = [
    "batch_stateful",
    "dedup_stream",
    "near_dedup_admitter",
    "near_dedup_ingest",
    "compact_store",
    "quota_admitter",
    "compact_postings",
    "postings_admitter",
    "postings_ingest",
    "quota_ingest",
    "semantic_admitter",
    "semantic_ingest",
    "foreach_batch_sink",
    "idempotent_parquet_batch_writer",
    "beam_trigger_to_spark",
    "rolling_agg",
    "running_agg",
    "stateful_map_groups",
    "PANED_OUTPUT_SCHEMA",
    "paned_window_agg",
    "write_stream",
]
