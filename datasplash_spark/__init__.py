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

import os as _os

# Python workers unpickle object-mode / EDN closures by importing this
# package; make sure they can even when the driver found it via a
# sys.path edit rather than an install (workers inherit PYTHONPATH from
# the driver environment at daemon launch).
_pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _pkg_parent not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_parent + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _pkg_parent
    )

from . import objectmode, operators, plans, sources, streaming
from .pipeline import (
    PipelineOptions,
    load_table,
    load_tables,
    make_session,
    register_views,
)

__version__ = "0.1.0"

__all__ = [
    "PipelineOptions",
    "load_table",
    "load_tables",
    "make_session",
    "objectmode",
    "operators",
    "plans",
    "register_views",
    "sources",
    "streaming",
]
