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
map onto ``writeStream.trigger`` + output modes. Beam's pane-level
accumulate/discard semantics are only approximable (SURVEY §7.3a):
``update`` mode ≈ accumulating panes, ``append`` + watermark ≈
discard-on-final — documented gap.
"""

from .stateful import batch_stateful, dedup_stream, rolling_agg, running_agg, stateful_map_groups
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
    "write_stream",
]
