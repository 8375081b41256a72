"""datasplash_spark — a PySpark-native analytics/pipeline engine with
the operator surface of ngrunwald/datasplash (a Clojure wrapper over
Apache Beam), re-expressed Spark-first.

Layers (SURVEY.md §7.1):

- ``operators``   — expression-first DataFrame ops (Layer 0).
- ``objectmode``  — arbitrary-Python-value parity layer (Layer 1).
- ``sources``     — IO: text/JSON/EDN/parquet + connector option maps.
- ``functions``   — LLM-data-pipeline extensions: dedup, similarity,
                    text analysis, multimodal columns.
- ``streaming``   — Structured Streaming: windows, watermark, state.
"""

from . import operators
from .pipeline import PipelineOptions, load_tables, make_session, register_views

__version__ = "0.1.0"

__all__ = [
    "PipelineOptions",
    "load_tables",
    "make_session",
    "operators",
    "register_views",
]
