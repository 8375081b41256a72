"""Pipeline option munging — mirrors the reference's args->cli-args
tests (/root/reference/test/datasplash/core_test.clj:10-22)."""

from __future__ import annotations

import re

from datasplash_spark.pipeline import (
    args_to_conf,
    job_name_template,
    options_from_args,
)


def test_defaults():
    assert args_to_conf() == {"appName": "unknown"}


def test_kw_args_camelized():
    got = args_to_conf(job_name="foo", n=42)
    assert got == {"jobName": "foo", "n": 42, "appName": "unknown"}


def test_list_values_preserved():
    got = args_to_conf(
        job_name="foo",
        jdk_add_open_modules=["java.base/java.io=ALL-UNNAMED"],
    )
    assert got["jdkAddOpenModules"] == ["java.base/java.io=ALL-UNNAMED"]


def test_cli_strings_win_over_kwargs():
    got = args_to_conf(["--app-name=cli", "--max-retries=3"], app_name="kw")
    assert got["appName"] == "cli" and got["maxRetries"] == "3"


def test_job_name_template():
    name = job_name_template("%A-%U-%T", "MyApp!")
    assert re.fullmatch(r"[-a-z0-9]+", name)
    assert name.startswith("myapp0-")


def test_job_name_template_flows_into_conf():
    got = args_to_conf(app_name="app", job_name_template="%A-x")
    assert got["jobName"] == "app-x"
    assert "jobNameTemplate" not in got


def test_options_from_args_routing():
    opts = options_from_args(
        ["--shuffle-partitions=8"],
        app_name="myapp",
        master="local[2]",
        **{"spark.sql.adaptive.enabled": "false"},
    )
    assert opts.app_name == "myapp"
    assert opts.master == "local[2]"
    assert opts.shuffle_partitions == 8
    assert opts.extra_conf == {"spark.sql.adaptive.enabled": "false"}


def test_corpus_prep_example_runs(spark, tmp_path):
    """The shipped corpus-prep example's pipeline stages compose and
    produce sane counts on sf0.001 (rot guard for examples/)."""
    from pyspark.sql import functions as F

    from datasplash_spark.functions import dedup as dd
    from datasplash_spark.functions import text as tx
    from datasplash_spark.pipeline import load_table

    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    n0 = docs.count()
    quality = docs.filter(tx.gopher_quality_pass("text"))
    exact = quality.join(dd.dedup_exact(quality), on="doc_id", how="left_semi")
    clusters = dd.dedup_clusters(exact)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    deduped = exact.join(keep, on="doc_id", how="left_semi")
    trimmed = (
        deduped.drop("text")
        .join(
            dd.remove_repeated_spans(deduped, k=8, min_count=2).select(
                "doc_id", F.col("text_clean").alias("text"), "n_removed"
            ),
            on="doc_id",
        )
        .filter(F.col("text") != "")
    )
    chunks = tx.chunk_documents(trimmed, 64, 8)
    n3, nt, n4 = deduped.count(), trimmed.count(), chunks.count()
    assert 0 < n3 <= n0
    assert 0 < nt <= n3
    assert n4 >= nt  # every surviving doc yields >= 1 chunk
    from datasplash_spark.operators import global_shuffle

    ordered = global_shuffle(chunks, 7, "doc_id", "chunk_id", keep_key=True)
    keys = [r.shuffle_key for r in ordered.select("shuffle_key").collect()]
    assert keys == sorted(keys) and len(keys) == n4


def test_recipes_compose(spark):
    """RECIPES.md rot guard: the C4, CCNet, and DSIR compositions run
    as written (smaller parameters) on sf0.001 and produce sane
    row counts."""
    import os

    from pyspark.sql import functions as F

    from datasplash_spark import operators as ops
    from datasplash_spark.functions import dedup as dd
    from datasplash_spark.functions import text as tx
    from datasplash_spark.pipeline import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    n0 = docs.count()

    # C4-style: heuristics + span dedup + split
    clean = (
        docs.withColumn("text", tx.dedup_lines("text"))
        .filter(tx.punct_ratio("text") < 0.3)
        .filter(tx.token_count("text") >= 5)
    )
    spans = dd.remove_repeated_spans(clean, k=8, min_count=2)
    kept = (
        clean.drop("text")
        .join(spans.selectExpr("doc_id", "text_clean AS text"), "doc_id")
        .filter(F.col("text") != "")
    )
    splits = ops.hash_split(kept, {"train": 0.9, "validation": 0.1}, "doc_id")
    assert 0 < kept.count() <= n0
    assert splits.select("split").distinct().count() == 2

    # CCNet-style: LM score -> quantile tiers
    scored = tx.unigram_doc_scores(docs)
    per_tok = docs.join(scored, "doc_id").withColumn(
        "logprob_per_tok", F.col("sum_logp_nano") / F.col("n_toks") / 1e9
    )
    tiers = ops.quantile_buckets(per_tok, "logprob_per_tok", 3, bucket_name="tier")
    assert tiers.select("tier").distinct().count() == 3

    # DSIR-style: importance scores -> top-decile cut
    target = docs.filter(F.col("source") == "src1")
    raw = docs.filter(F.col("source") != "src1")
    scores = tx.dsir_scores(raw, target, n_buckets=256)
    sel = ops.filter_by_quantile(
        raw.join(scores, "doc_id"), "dsir_score", 0.9, keep="above"
    )
    n_raw, n_sel = raw.count(), sel.count()
    assert 0 < n_sel <= n_raw * 0.2 + 1

    # Model-based quality filtering: train on a tiny labeled sample
    # (top vs bottom quality_score docs), apply corpus-wide, cut at
    # the median logit
    labeled = (
        docs.withColumn("q", tx.quality_score("text"))
        .filter((F.col("q") >= 0.7) | (F.col("q") <= 0.3))
        .withColumn("label", (F.col("q") >= 0.7).cast("int"))
        .limit(60)
    )
    weights = tx.train_linear_classifier(
        labeled, n_buckets=256, epochs=5, lr=1.0
    )
    scored2 = tx.linear_doc_scores(docs, weights, n_buckets=256)
    kept_model = ops.filter_by_quantile(
        docs.join(scored2, "doc_id"), "logit", 0.5, keep="above"
    )
    assert 0 < kept_model.count() <= n0

    # Semantic-curation style (SemDeDup + In-Context Pretraining):
    # audit filter -> semantic dedup survivors -> pack within cells
    from datasplash_spark.functions import similarity as sim

    emb = load_table(spark, sf, "embeddings")
    report = tx.filter_report(
        docs, {"min_tokens": tx.token_count("text") >= 5}
    )
    clean2 = docs.join(
        report.filter("passed = 1").select("doc_id"), "doc_id"
    )
    marked = sim.semantic_dedup(emb, n_cells=8, eps=0.8)
    keep = clean2.join(
        marked.filter("keep = 1").selectExpr("vec_id AS doc_id"), "doc_id"
    )
    cells = marked.selectExpr("vec_id AS doc_id", "cell")
    packed = tx.pack_sequences(keep.join(cells, "doc_id"), 512, part="cell")
    n_keep, n_packed = keep.count(), packed.count()
    assert 0 < n_keep and n_packed == n_keep
    # packing is per-cell: offsets restart within each cell stream
    assert packed.filter("start_tok = 0").count() == packed.select(
        "part"
    ).distinct().count()


def test_filter_side_input_example_composes(spark):
    """filter_side_input example rot guard: the native 1-row-agg
    broadcast plan and the singleton-view side-input plan must agree
    on the events table (read via load_table — the TIMESTAMP(NANOS)
    path a bare parquet read cannot handle)."""
    import os

    from pyspark.sql import functions as F

    from datasplash_spark.operators import dfilter, mean_fn
    from datasplash_spark.pipeline import load_table
    from datasplash_spark.plans import view

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    ev = load_table(spark, sf, "events").select(
        F.month("ts").alias("month"),
        F.col("value").alias("mean_temp"),
        "event_id",
    )
    gmean = ev.agg(mean_fn("mean_temp").alias("g"))
    native = (
        ev.join(F.broadcast(gmean))
        .where((F.col("month") == 1) & (F.col("mean_temp") < F.col("g")))
        .count()
    )
    gval = view(gmean.select("g"), "singleton").value
    viewed = dfilter(
        ev, (F.col("month") == 1) & (F.col("mean_temp") < F.lit(gval))
    ).count()
    assert native == viewed > 0
