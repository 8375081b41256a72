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


def web_ingest_prep(
    spark,
    warc_glob: str,
    robots_df: DataFrame,
    *,
    agent: str = "*",
    min_tokens: int = 5,
    max_punct: float = 0.2,
    words_per_para: int = 10,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    seed: int = 42,
    persist: bool = True,
) -> DataFrame:
    """The INGEST half of the pipeline (round 11): WARC shards →
    HTML main-content extraction → robots.txt gate → Gopher quality
    → paragraph dedup (rebuild) → minhash near-dup dedup. The
    Common Crawl shape: :func:`corpus_prep_full` owns curation from
    a clean text corpus; this owns getting there from crawl archives.

    Returns the surviving corpus ``(doc_id, url, text, n_paras,
    n_kept)`` with ``doc_id = xxhash64(url)`` — feed it (plus an
    eval set) straight into the curation half.

    Scale shape (the reason this is one function): raw bytes NEVER
    shuffle. Records parse and HTML extracts inside the binaryFile
    scan stage (``read_warc``'s kernel feeds ``html_extract``'s
    codegen'd expressions before any Exchange); the robots decision
    is a broadcast join + array expression (URLs don't move); the
    quality gate is expression predicates; the first shuffle in the
    whole plan is paragraph dedup's 16-byte digest window. The
    plan-pin test asserts no Exchange row carries ``payload`` or
    ``html``."""
    from ..sources import archives as ar

    recs = ar.read_warc(spark, warc_glob).filter(
        (F.col("warc_type") == "response")
        & F.col("content_type").startswith("text/html")
    )
    rebuilt, caches = _web_page_rebuild(
        recs, robots_df, agent=agent, min_tokens=min_tokens,
        max_punct=max_punct, words_per_para=words_per_para,
        persist=persist,
    )
    clusters = dd.dedup_clusters(
        rebuilt, "text", "doc_id", num_hashes, bands, shingle_k, seed,
        cache=persist,
    )
    result = rebuilt.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        ),
        "doc_id",
        "left_semi",
    )
    # cache handles for the caller (review finding: a long-lived
    # session ingesting crawl batches in a loop would otherwise
    # accumulate orphaned cached relations) — release with
    # :func:`unpersist_web_ingest` once the result is consumed
    result._web_ingest_caches = caches
    return result


def _web_page_rebuild(
    recs: DataFrame,
    robots_df: DataFrame,
    *,
    agent: str,
    min_tokens: int,
    max_punct: float,
    words_per_para: int,
    persist: bool,
) -> tuple[DataFrame, tuple]:
    """Shared front half of the batch and streaming web-ingest
    paths: parsed WARC response records → HTML main-content
    extraction (in the scan stage — html never crosses an Exchange)
    → robots gate (broadcast join) → Gopher quality predicates →
    paragraph dedup (rebuild) with the url joined back. Returns
    ``(rebuilt, cache_handles)`` where rebuilt is ``(doc_id, text,
    n_paras, n_kept, url)``; release the handles with
    :func:`unpersist_web_ingest` semantics (each is a persisted
    DataFrame)."""
    from . import web as wb

    pages = recs.select(
        F.col("target_uri").alias("url"),
        F.decode("payload", "UTF-8").alias("html"),
    )
    # extraction boundary: html is consumed HERE, in the scan stage
    pages = pages.select(
        "url", wb.html_extract("html")["text"].alias("text")
    )
    gated = (
        wb.robots_filter(pages, robots_df, agent=agent)
        .filter(F.col("allowed"))
        .drop("allowed", "host")
    )
    # doc identity = xxhash64(url): 64-bit, so ~10^10 URLs expect a
    # handful of collisions (conflated docs); acceptable for dedup
    # keys — swap in a 128-bit digest if exact identity matters
    quality = gated.filter(
        tx.gopher_quality_pass(
            "text", min_tokens=int(min_tokens)
        )
        & (tx.punct_ratio("text") < float(max_punct))
    ).withColumn("doc_id", F.xxhash64("url"))
    if persist:
        # two consumers (the rebuild and the url join-back): without
        # this the WARC parse + HTML extract scan runs TWICE
        quality = quality.persist()
    rebuilt = dd.apply_paragraph_dedup(
        quality, dd.word_paragraphs("text", words_per_para),
        id_col="doc_id",
    ).filter(F.col("n_kept") > 0)
    rebuilt = rebuilt.join(
        quality.select("doc_id", "url"), "doc_id"
    )
    if persist:
        rebuilt = rebuilt.persist()
    return rebuilt, ((quality, rebuilt) if persist else ())


def web_ingest_stream(
    spark,
    warc_glob: str,
    robots_df: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    agent: str = "*",
    min_tokens: int = 5,
    max_punct: float = 0.2,
    words_per_para: int = 10,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    seed: int = 42,
    trigger: "str | dict | None" = None,
    query_name: str | None = None,
):
    """STREAMING twin of :func:`web_ingest_prep` (round 12): WARC
    shards arriving in ``warc_glob`` drain through the same
    extract → robots → quality → paragraph-dedup front per
    micro-batch, then near-dup ADMISSION against (and append to)
    the growing parquet store at ``store_path`` — the reference's
    ``:watch-new-files`` composed with the north-star continuous-
    ingestion story. Returns the started ``StreamingQuery``.

    Semantics per micro-batch (the batch function delegates to
    :func:`..streaming.neardup.near_dedup_admitter`, so the
    admission contract is IDENTICAL to the standalone streaming
    dedup sink): intra-batch minhash clustering keeps the min-id
    survivor per cluster, exact digests then LSH bucket probes drop
    docs already in the store, and the survivors land in a
    ``_batch_id=<id>`` partition with dynamic-partition overwrite —
    a replayed batch id (Spark guarantees at-least-once after
    recovery) rewrites its own partition and probes a store view
    that EXCLUDES it, so replay is byte-idempotent. The per-batch
    cache handles from the rebuild front are released via
    :func:`unpersist_web_ingest` after each admission — a
    continuous ingest accumulates zero orphaned cached relations.

    Scale shape: unchanged from the batch path — shard tasks are
    the parallelism unit, crawl payload bytes never pass an
    Exchange, the robots rules broadcast, and the store side of the
    admission reduces to digests and (doc_id, bucket) pairs.
    Readers scan ``store_path`` and drop ``_batch_id``."""
    from ..sources import archives as ar
    from ..streaming.neardup import near_dedup_admitter
    from ..streaming.sinks import foreach_batch_sink

    recs = ar.read_warc(spark, warc_glob, watch_new_files=True).filter(
        (F.col("warc_type") == "response")
        & F.col("content_type").startswith("text/html")
    )
    admit_store = near_dedup_admitter(
        store_path, text="text", id_col="doc_id",
        num_hashes=num_hashes, bands=bands, k=shingle_k, seed=seed,
    )

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        rebuilt, caches = _web_page_rebuild(
            batch_df, robots_df, agent=agent, min_tokens=min_tokens,
            max_punct=max_punct, words_per_para=words_per_para,
            persist=True,
        )
        rebuilt._web_ingest_caches = caches
        try:
            admit_store(
                rebuilt.select(
                    "doc_id", "url", "text", "n_paras", "n_kept"
                ),
                batch_id,
            )
        finally:
            unpersist_web_ingest(rebuilt)

    return foreach_batch_sink(
        recs, admit, checkpoint_dir, trigger=trigger,
        query_name=query_name,
    )


def unpersist_web_ingest(result: DataFrame) -> None:
    """Release the cached relations a :func:`web_ingest_prep` call
    pinned (no-op for ``persist=False`` results or plain
    DataFrames). Call after the result has been consumed — e.g. at
    the end of each crawl batch in a continuous-ingestion loop."""
    for df in getattr(result, "_web_ingest_caches", ()):
        df.unpersist()
