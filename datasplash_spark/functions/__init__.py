"""LLM-data-pipeline function library: text analysis, dedup,
similarity search, multimodal columns (north-star extensions beyond
the reference's operator surface — BASELINE.json)."""

from . import dedup, events, graph, similarity, text

__all__ = ["dedup", "events", "graph", "similarity", "text"]
