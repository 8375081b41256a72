"""End-to-end corpus-prep composition (round 10).

The extension operators exist to be COMPOSED: quality filter →
paragraph dedup → minhash near-dup dedup → benchmark decontamination
→ temperature mixing → sequence packing is the canonical
training-data pipeline (the C4/CCNet/Gopher → MinHashLSH → mix →
pack recipe). Each stage is individually gated by its own corpus
query; this module provides the composition as ONE function so the
cross-stage plan interactions — persist boundaries, single-signature
guarantees, shuffle reuse — are owned, tested, and measured in one
place rather than re-derived by every caller.

Scale posture (the reason this is a function and not a recipe
snippet): the paragraph-rebuilt corpus is consumed by THREE
downstream subtrees (the LSH signature pipeline, the survivor
semi-join, and the decontamination gram explode). Without a persist
boundary Spark re-executes the 2-shuffle rebuild once per consumer —
at 100 TB that triples the most expensive scan. ``persist=True``
(default) materializes the rebuilt corpus once; the plan-pin test
(``tests/test_plans.py::test_corpus_prep_full_single_rebuild``)
asserts no paragraph-window or signature arithmetic appears outside
the cached relations, so the guarantee survives refactors.

Reference anchor: composition idiom follows the reference's
composable-transform design (core.clj compose/pipeline usage);
the stages themselves are north-star extensions (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as dd
from . import text as tx
from ..operators.grouping import temperature_mix


def corpus_prep_full(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    min_tokens: int = 5,
    max_punct: float = 0.2,
    words_per_para: int = 10,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    seed: int = 42,
    decontam_k: int = 3,
    total_budget: int = 8000,
    alpha: float = 0.5,
    seq_len: int = 2048,
    text: str = "text",
    id_col: str = "doc_id",
    part: str = "source",
    persist: bool = True,
) -> DataFrame:
    """Quality filter → paragraph dedup (rebuild) → minhash near-dup
    dedup (keep min-id survivor) → decontaminate vs ``eval_df`` →
    temperature mix on ``part`` → pack into ``seq_len`` sequences.

    Returns the packing PLAN: one row per admitted document —
    ``(doc_id, part, n_tok, start_tok, pack_id, pack_offset)`` —
    exactly :func:`..text.pack_sequences`' contract, computed over
    the cleaned, deduplicated, decontaminated, mixed corpus.

    Stage shapes (each individually scaling-verified by its gated
    query; see SCALING.md):

    - quality: expression predicates inside the scan stage, cuts
      rows before any shuffle;
    - paragraph dedup: one 16-byte-digest window + one doc_id
      rebuild join (``apply_paragraph_dedup``); the rebuilt corpus
      is PERSISTED here because three consumers follow;
    - minhash: signatures computed once (``cache=True`` banded
      table), banded bucket join, connected components over pairs
      only, survivor = min-id per cluster;
    - decontamination: distinct k-gram digests, eval side
      AQE-broadcast, left-anti on contaminated ids;
    - mix: two partial-agg shuffles (stratum totals + admission
      window) — budgets derived, never collected;
    - pack: one window cumsum per ``part`` stream.
    """
    quality = docs.filter(
        (tx.token_count(text) >= int(min_tokens))
        & (tx.punct_ratio(text) < float(max_punct))
    )
    rebuilt = dd.apply_paragraph_dedup(
        quality, dd.word_paragraphs(text, words_per_para), id_col=id_col
    ).filter(F.col("n_kept") > 0)
    # re-attach the mixing stratum (the rebuild is (doc_id, text,
    # n_paras, n_kept) by contract); doc_id-keyed join, co-keyed
    # with the rebuild's own final shuffle
    rebuilt = rebuilt.join(
        docs.select(F.col(id_col).alias("doc_id"), part), "doc_id"
    )
    if persist:
        rebuilt = rebuilt.persist()
    clusters = dd.dedup_clusters(
        rebuilt, text, "doc_id", num_hashes, bands, shingle_k, seed,
        cache=persist,
    )
    survivors = rebuilt.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        ),
        "doc_id",
        "left_semi",
    )
    clean = (
        dd.decontaminate(survivors, eval_df, k=decontam_k, text=text,
                         id_col="doc_id")
        if eval_df is not None
        else survivors
    )
    mixed = temperature_mix(
        clean.withColumn("n_tok", tx.token_count(text).cast("long")),
        part,
        "n_tok",
        total_budget=int(total_budget),
        alpha=float(alpha),
        seed=seed,
        deterministic_by="doc_id",
    )
    return tx.pack_sequences(
        mixed, int(seq_len), text=text, id_col="doc_id", part=part
    )
