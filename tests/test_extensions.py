"""North-star extension functions: dedup signatures, similarity,
multimodal plumbing — unit level (the oracle corpus covers the full
cross-engine semantics at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasplash_spark.functions import dedup as dd
from datasplash_spark.functions import multimodal as mm
from datasplash_spark.functions import similarity as sim
from datasplash_spark.functions import text as tx
from datasplash_spark.sources import generate_input
from datasplash_spark import operators as ops


def test_simhash_similar_docs_close(spark):
    """Near-identical docs → small Hamming distance; unrelated → large."""
    docs = generate_input(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about spark and scale"),
        ],
        "doc_id bigint, text string",
    )
    sigs = {r.doc_id: r.simhash for r in dd.simhash_signatures(docs).collect()}
    d12 = bin(sigs[1] ^ sigs[2]).count("1")
    d13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert d12 < d13
    # Column form agrees with the aggregated form
    col_sigs = {
        r.doc_id: r.s
        for r in docs.select("doc_id", dd.simhash("text").alias("s")).collect()
    }
    assert col_sigs == sigs


def test_minhash_column_vs_aggregated(spark):
    docs = generate_input(
        spark,
        [(1, "a b c d e f g h"), (2, "x y z w v u t s")],
        "doc_id bigint, text string",
    )
    agg = {
        r.doc_id: list(r.signature)
        for r in dd.minhash_signatures(docs, num_hashes=8).collect()
    }
    col = {
        r.doc_id: list(r.s)
        for r in docs.select(
            "doc_id", dd.minhash_signature("text", num_hashes=8).alias("s")
        ).collect()
    }
    assert agg == col


def test_ngram_jaccard_bounds(spark):
    df = generate_input(
        spark,
        [("a b c d", "a b c d"), ("a b c d", "w x y z")],
        "t1 string, t2 string",
    )
    got = [r.j for r in df.select(dd.ngram_jaccard("t1", "t2", k=2).alias("j")).collect()]
    assert got[0] == 1.0 and got[1] == 0.0


def test_rolling_fingerprint_order_sensitive(spark):
    df = generate_input(
        spark, [(1, "a b c"), (2, "c b a"), (3, "a b c")], "id bigint, t string"
    )
    fps = {r.id: r.f for r in df.select("id", dd.rolling_fingerprint("t").alias("f")).collect()}
    assert fps[1] == fps[3] and fps[1] != fps[2]


def test_lsh_bucket_recall_of_exact_top1(spark):
    """The bucketed probe must find the query vector itself (cos=1)."""
    vecs = [
        (i, [float(i + 1)] + [float((i + j) % 3) + 1.0 for j in range(15)])
        for i in range(50)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    q = vecs[5][1]
    got = sim.lsh_bucketed_topk(df, q, k=3, bits=4).collect()
    assert got[0].vec_id == 5 and abs(got[0].score - 1.0) < 1e-9


def test_ivf_topk_finds_query_and_bounds_probe(spark):
    """IVF probe must contain the query vector itself (its cell is
    always probed) and only score vectors from probed cells."""
    vecs = [
        (i, [float(i + 1)] + [float((i + j) % 3) + 1.0 for j in range(15)])
        for i in range(50)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    q = vecs[7][1]
    cents = sim.ivf_centroids(df, n_cells=8)
    assert len(cents) == 8 and all(len(c) == 16 for c in cents)
    got = sim.ivf_topk(df, q, k=3, n_cells=8, nprobe=3, centroids=cents).collect()
    assert got[0].vec_id == 7 and abs(got[0].score - 1.0) < 1e-9
    # every scored vector really lives in a probed cell
    assigned = df.select(
        "vec_id", sim.ivf_cell("embedding", cents).alias("cell")
    ).collect()
    cell_of = {r.vec_id: r.cell for r in assigned}
    probed_cells = {cell_of[r.vec_id] for r in got}
    assert len(probed_cells) <= 3 and cell_of[7] in probed_cells


def test_multimodal_features_and_stub(spark):
    docs = generate_input(
        spark, [(1, "abc"), (2, ""), (3, "héllo")], "doc_id bigint, text string"
    )
    media = mm.as_media(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("raw")),
        "raw",
        media_type="text/plain",
    )
    assert dict(media.dtypes)["media"] == "binary"
    feats = {r.doc_id: (r.n_bytes, r.checksum) for r in mm.media_features(media).collect()}
    assert feats[1][0] == 3 and feats[2] == (0, 0)
    assert feats[3][0] == 6  # é is 2 UTF-8 bytes
    with pytest.raises(ValueError, match="unrecognized format"):
        mm.decode_image(b"not an image")


def test_frame_sample_plan(spark):
    df = generate_input(spark, [(1, b"x")], "doc_id bigint, raw binary")
    media = mm.as_media(df, "raw", "video/mp4")
    with_frames = media.withColumn(
        "meta", F.struct(
            F.col("meta.media_type"), F.col("meta.width"), F.col("meta.height"),
            F.col("meta.sample_rate"), F.lit(10).alias("n_frames"),
        )
    )
    frames = mm.frame_sample_plan(with_frames, every_n=3)
    assert [r.frame_idx for r in frames.orderBy("frame_idx").collect()] == [0, 3, 6, 9]


def test_lsh_pair_strategies_agree(spark, tmp_path):
    """recompute / cache / materialize are execution strategies only:
    all three must yield the identical candidate-pair set."""
    from datasplash_spark.pipeline import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(num_hashes=16, bands=4, k=3, seed=42)
    base = {tuple(r) for r in dd.lsh_candidate_pairs(docs, **kw).collect()}
    cached = dd.lsh_candidate_pairs(docs, cache=True, **kw)
    assert {tuple(r) for r in cached.collect()} == base
    mat = dd.lsh_candidate_pairs(
        docs, materialize_dir=str(tmp_path / "banded"), **kw
    )
    assert {tuple(r) for r in mat.collect()} == base


def test_connected_components_chain_and_clique(spark):
    """Chain 1-2-3-4 (diameter 3) + clique {10,11,12} + isolated pair
    (20,21): hash-min must propagate across the chain, not just one
    hop."""
    from datasplash_spark.functions.graph import connected_components

    edges = generate_input(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src bigint, dst bigint",
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # both strategies: driver-side union-find (default for small edge
    # lists) and the forced distributed loop must agree exactly
    for thr in (None, 0):
        comp = {
            r.node: r.component
            for r in connected_components(edges, driver_threshold=thr).collect()
        }
        assert comp == expected, f"driver_threshold={thr}"


def test_connected_components_max_iter_raises(spark):
    from datasplash_spark.functions.graph import connected_components

    edges = generate_input(
        spark, [(i, i + 1) for i in range(8)], "src bigint, dst bigint"
    )
    # the distributed loop must raise on non-convergence…
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=2, driver_threshold=0)
    # …while the small-graph driver path labels the same chain exactly
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(got.values()) == {0} and len(got) == 9


def test_cluster_assignments_singletons(spark):
    """Docs without any edge keep their own id as cluster_id."""
    from datasplash_spark.functions.graph import (
        cluster_assignments,
        connected_components,
    )

    docs = generate_input(
        spark,
        [(i, f"doc {i}") for i in range(6)],
        "doc_id bigint, text string",
    )
    edges = generate_input(spark, [(0, 3), (3, 5)], "src bigint, dst bigint")
    comps = connected_components(edges)
    out = {r.doc_id: r.cluster_id for r in cluster_assignments(docs, comps).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}


def test_connected_components_random_vs_union_find(spark):
    """Seeded random graphs vs a pure-Python union-find oracle."""
    import random

    from datasplash_spark.functions.graph import connected_components

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 40))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {v for e in edges for v in e}
        expected = {}
        for v in nodes:
            root = find(v)
            expected[v] = min(u for u in nodes if find(u) == root)
        df = generate_input(spark, edges, "src bigint, dst bigint")
        for thr in (None, 0):
            got = {
                r.node: r.component
                for r in connected_components(df, driver_threshold=thr).collect()
            }
            assert got == expected, f"trial {trial} driver_threshold={thr}"


def test_kmeans_refine_recovers_blob_means(spark):
    """Lloyd refinement from offset seeds recovers synthetic blob
    means to tolerance; empty-cell centroids survive unchanged."""
    import random

    from datasplash_spark.functions.similarity import kmeans_refine

    rng = random.Random(3)
    blobs = [[0.0, 10.0], [10.0, 0.0], [-10.0, -10.0]]
    rows = [
        (i, [b[0] + rng.gauss(0, 0.5), b[1] + rng.gauss(0, 0.5)])
        for i in range(300)
        for b in [blobs[i % 3]]
    ]
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    # 4th centroid is far from all data → its cell stays empty and the
    # centroid must pass through unchanged
    init = [[1.0, 8.0], [8.0, 1.0], [-8.0, -8.0], [100.0, 100.0]]
    out = kmeans_refine(df, init, iters=3)
    assert out[3] == [100.0, 100.0]
    for c, b in zip(sorted(out[:3]), sorted(blobs)):
        assert abs(c[0] - b[0]) < 0.5 and abs(c[1] - b[1]) < 0.5


def test_funnel_stage_times_ordering(spark):
    """Stages must resolve IN ORDER: a purchase before the
    signup→click chain does not count; nulls cascade."""
    from datasplash_spark.functions.events import funnel_stage_times

    rows = [
        # u1: full ordered funnel
        (1, "signup", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: purchase BEFORE click-after-signup → stage2 null
        (2, "purchase", 5), (2, "signup", 10), (2, "click", 20),
        # u3: click before signup only → stage1 null, stage2 null
        (3, "click", 5), (3, "signup", 10), (3, "purchase", 20),
        # u4: no signup → all null
        (4, "click", 1), (4, "purchase", 2),
        # u5: same-ts click as signup counts (at-or-after)
        (5, "signup", 10), (5, "click", 10), (5, "purchase", 11),
    ]
    df = generate_input(spark, rows, "user_id bigint, event_type string, ts bigint")
    got = {
        r.user_id: (r.t0, r.t1, r.t2)
        for r in funnel_stage_times(
            df, ["signup", "click", "purchase"]
        ).collect()
    }
    assert got == {
        1: (10, 20, 30),
        2: (10, 20, None),
        3: (10, None, None),
        4: (None, None, None),
        5: (10, 10, 11),
    }


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token lands in some chunk; consecutive chunks overlap by
    exactly `overlap`; short docs yield one short chunk."""
    from datasplash_spark.functions.text import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(25))
    docs = generate_input(
        spark,
        [(1, long_text), (2, "a b c"), (3, "")],
        "doc_id bigint, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=10, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text.split(" ")))
    # doc 1: step=8 → chunks at 0,8,16,24 → ceil((25-2)/8)=3 chunks
    c1 = sorted(by_doc[1])
    assert len(c1) == 3
    assert c1[0][1][:2] == ["w0", "w1"] and len(c1[0][1]) == 10
    assert c1[1][1][:2] == c1[0][1][-2:]  # overlap of 2
    covered = [t for _, toks in c1 for t in toks]
    assert set(covered) == {f"w{i}" for i in range(25)}
    assert by_doc[2] == [(0, ["a", "b", "c"])]
    assert by_doc[3] == [(0, [""])]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_normalize_text_canonicalizes(spark):
    """Reformatted variants collapse to one canonical form."""
    from datasplash_spark.functions.text import normalize_text

    df = generate_input(
        spark,
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO...\n\tworld"),
            (4, "different text"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.n for r in df.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert got[1] == got[2] == got[3] == "hello world"
    assert got[4] == "different text"


def test_connected_components_star_matches_hash_min(spark):
    """Star contraction agrees with hash-min + union-find on chains,
    cliques, pairs, and seeded random graphs (incl. a 20-node chain
    that stresses O(log n) vs O(diameter) convergence)."""
    import random

    from datasplash_spark.functions.graph import connected_components_star

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        [(i, i + 1) for i in range(20)],  # long chain
    ]
    rng = random.Random(11)
    for _ in range(2):
        n = 25
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 30))]
        cases.append([(a, b) for a, b in es if a != b])

    for edges in cases:
        if not edges:
            continue
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent.setdefault(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {v for e in edges for v in e}
        expected = {
            v: min(u for u in nodes if find(u) == find(v)) for v in nodes
        }
        df = generate_input(spark, edges, "src bigint, dst bigint")
        got = {
            r.node: r.component
            for r in connected_components_star(df).collect()
        }
        assert got == expected


def test_dedup_clusters_algorithms_agree(spark):
    """hash-min and star contraction must assign identical clusters
    on the real documents table."""
    from datasplash_spark.functions import dedup as dd
    from datasplash_spark.pipeline import load_table
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    a = {
        r.doc_id: r.cluster_id
        for r in dd.dedup_clusters(docs, algorithm="hash-min").collect()
    }
    b = {
        r.doc_id: r.cluster_id
        for r in dd.dedup_clusters(docs, algorithm="star").collect()
    }
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dd.dedup_clusters(docs, algorithm="bogus")


def test_unigram_scores_rank_rare_docs_worse(spark):
    """A doc of rare tokens must score a higher mean neg-logprob than
    a doc of corpus-common tokens; fixed-point sums are exact."""
    from datasplash_spark.functions.text import unigram_doc_scores

    common = "the quick fox " * 10
    docs = generate_input(
        spark,
        [(1, common.strip()), (2, common.strip()), (3, "zzyzx qwfp vexing")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in unigram_doc_scores(docs).collect()}
    score = {i: -rows[i].sum_logp_nano / rows[i].n_toks / 1e9 for i in rows}
    assert score[3] > score[1]
    assert abs(score[1] - score[2]) < 1e-12  # identical docs, exact ints


def test_resize_plan_and_kernel_injection(spark):
    """resize_plan computes letterbox dims from metadata; the pixel
    stage runs a test-injected kernel through real Arrow batches; the
    default kernel raises (codec absent by contract)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datasplash_spark.functions import multimodal as mm

    raw = generate_input(
        spark,
        [(1, b"abcdef"), (2, b"xy")],
        "doc_id bigint, payload binary",
    )
    media = mm.as_media(raw, "payload", "image")
    # inject known dims into meta for the plan
    media = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type"),
            F.when(F.col("doc_id") == 1, 800).otherwise(400).alias("width"),
            F.lit(600).alias("height"),
            F.col("meta.sample_rate"),
            F.col("meta.n_frames"),
        ),
    )
    plan = {r.doc_id: (r.resize.out_w, r.resize.out_h)
            for r in mm.resize_plan(media, 200, 200).collect()}
    assert plan == {1: (200, 150), 2: (133, 200)}

    resized = mm.resize_images(
        media, 4, 4, kernel=lambda raw, w, h: raw[: w]
    )
    got = {r.doc_id: bytes(r.media) for r in resized.collect()}
    assert got == {1: b"abcd", 2: b"xy"}

    with _pytest.raises(Exception):
        mm.resize_images(media, 4, 4).collect()


def test_audio_chunk_plan(spark):
    """Chunk starts step by hop; final partial window clipped."""
    from pyspark.sql import functions as F

    from datasplash_spark.functions import multimodal as mm

    raw = generate_input(spark, [(1, b"x")], "doc_id bigint, payload binary")
    media = mm.as_media(raw, "payload", "audio").withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type"),
            F.col("meta.width"),
            F.col("meta.height"),
            F.lit(100).alias("sample_rate"),   # 100 Hz
            F.lit(450).alias("n_frames"),      # 4.5 s
        ),
    )
    rows = mm.audio_chunk_plan(media, window_s=2.0, hop_s=1.0).collect()
    starts = sorted(r.start_sample for r in rows)
    assert starts == [0, 100, 200]  # last full-ish window start = 250 clipped to <= total-win
    assert all(r.window_samples == 200 for r in rows)


def test_contamination_hits_and_decontaminate(spark):
    docs = generate_input(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "alpha beta gamma something else entirely"),
        ],
        "doc_id bigint, text string",
    )
    ev = generate_input(
        spark, [(99, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    hits = {r.doc_id: r.n_shared for r in dd.contamination_hits(docs, ev, k=3).collect()}
    # doc 1 shares 'alpha beta gamma' and 'beta gamma delta'; doc 3 only the first
    assert hits == {1: 2, 3: 1}
    kept = {r.doc_id for r in dd.decontaminate(docs, ev, k=3, min_hits=2).collect()}
    assert kept == {2, 3}
    kept1 = {r.doc_id for r in dd.decontaminate(docs, ev, k=3, min_hits=1).collect()}
    assert kept1 == {2}


def test_pii_redact_and_counts(spark):
    from datasplash_spark.functions.text import pii_counts, redact_pii

    df = generate_input(
        spark,
        [(1, "mail me at bob@example.com or 10.1.2.3 tel +555-123-4567 ok")],
        "doc_id bigint, text string",
    )
    c = pii_counts("text")
    row = df.select(
        c["email"].alias("e"), c["ipv4"].alias("i"), c["phone"].alias("p"),
        redact_pii("text").alias("r"),
    ).collect()[0]
    assert (row.e, row.i, row.p) == (1, 1, 1)
    assert "bob@example.com" not in row.r
    assert "10.1.2.3" not in row.r
    assert "555-123-4567" not in row.r
    assert row.r.count("[PII]") == 3
    assert row.r.endswith(" ok")


def test_dedup_lines_keeps_first_occurrence(spark):
    from datasplash_spark.functions.text import dedup_lines

    df = generate_input(
        spark,
        [(1, "nav\nbody one\nnav\nbody two\nfooter\nfooter")],
        "doc_id bigint, text string",
    )
    out = df.select(dedup_lines("text").alias("t")).collect()[0].t
    assert out == "nav\nbody one\nbody two\nfooter"


def test_repetition_stats_counts_cross_and_intra_doc_windows(spark):
    # k=2 windows; "a b" occurs in docs 1 and 2 (cross-doc dup),
    # "x x" occurs twice inside doc 3 (intra-doc dup), everything
    # else is unique. Short doc 4 yields its single full-text window.
    docs = generate_input(
        spark,
        [
            (1, "a b c"),        # windows: "a b", "b c"
            (2, "a b d"),        # windows: "a b", "b d"
            (3, "x x x"),        # windows: "x x", "x x"
            (4, "solo"),         # shorter than k -> one window "solo"
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in dd.repetition_stats(docs, k=2).collect()
    }
    assert rows == {1: (2, 1), 2: (2, 1), 3: (2, 2), 4: (1, 0)}


def test_remove_repeated_spans_cuts_dup_windows(spark):
    # k=2: "a b" appears in docs 1 and 2 -> positions covered by a
    # dup window start s are [s, s+1]; doc 3 is all-unique and must
    # come back verbatim; doc 4 (shorter than k) duplicates doc 5's
    # full text -> both empty out.
    docs = generate_input(
        spark,
        [
            (1, "a b c"),   # dup start 1 covers tokens 1-2 -> keeps "c"
            (2, "a b d"),   # keeps "d"
            (3, "p q r"),   # untouched
            (4, "solo"),    # whole-text window dup with doc 5
            (5, "solo"),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_removed)
        for r in dd.remove_repeated_spans(docs, k=2).collect()
    }
    assert rows == {
        1: ("c", 3, 2),
        2: ("d", 3, 2),
        3: ("p q r", 3, 0),
        4: ("", 1, 1),
        5: ("", 1, 1),
    }


def test_remove_repeated_spans_overlapping_windows_merge(spark):
    # "a b c" repeated in both docs -> dup 2-gram starts 1 and 2 in
    # each; coverage [1,2] U [2,3] = tokens 1-3, tail survives.
    docs = generate_input(
        spark,
        [(1, "a b c x"), (2, "a b c y")],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in dd.remove_repeated_spans(docs, k=2).collect()
    }
    assert rows == {1: ("x", 3), 2: ("y", 3)}


def test_remove_repeated_spans_min_count(spark):
    # min_count=3: a window in only two docs survives.
    docs = generate_input(
        spark,
        [(1, "a b x"), (2, "a b y"), (3, "c d z")],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: r.n_removed
        for r in dd.remove_repeated_spans(docs, k=2, min_count=3).collect()
    }
    assert rows == {1: 0, 2: 0, 3: 0}


def test_remove_repeated_spans_keep_first(spark):
    # keep_first=True: the lexicographically-first (doc_id, start)
    # occurrence of each duplicated window survives; the rest trim.
    docs = generate_input(
        spark,
        [
            (1, "a b c"),   # canonical for "a b": keeps everything
            (2, "a b d"),   # loses "a b", keeps "d"
            (3, "x a b"),   # loses "a b" (start 2-3), keeps "x"
            (4, "solo"),    # canonical whole-text window
            (5, "solo"),    # duplicate: empties
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in dd.remove_repeated_spans(
            docs, k=2, keep_first=True
        ).collect()
    }
    assert rows == {
        1: ("a b c", 0),
        2: ("d", 2),
        3: ("x", 2),
        4: ("solo", 0),
        5: ("", 1),
    }
    # intra-doc duplicate: earliest start in the canonical doc wins
    docs2 = generate_input(
        spark,
        [(7, "a b z a b"), (9, "a b q")],
        "doc_id bigint, text string",
    )
    rows2 = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in dd.remove_repeated_spans(
            docs2, k=2, keep_first=True
        ).collect()
    }
    assert rows2 == {7: ("a b z", 2), 9: ("q", 2)}


def test_global_shuffle_total_order_and_determinism(spark):
    from datasplash_spark.operators import global_shuffle, shuffle_key

    df = generate_input(
        spark,
        [(i, f"doc {i}") for i in range(100)],
        "doc_id bigint, text string",
    ).repartition(8)
    out = global_shuffle(df, 7, "doc_id", keep_key=True)
    rows = out.select("doc_id", "shuffle_key").collect()
    keys = [r.shuffle_key for r in rows]
    # collect() preserves partition order; orderBy gives a global sort
    assert keys == sorted(keys)
    # deterministic: same seed -> same order; different seed -> differs
    again = [
        r.doc_id
        for r in global_shuffle(df, 7, "doc_id").select("doc_id").collect()
    ]
    assert again == [r.doc_id for r in rows]
    other = [
        r.doc_id
        for r in global_shuffle(df, 8, "doc_id").select("doc_id").collect()
    ]
    assert other != again
    assert sorted(other) == sorted(again) == list(range(100))
    # explicit partition pinning keeps the global order across shards
    pinned = global_shuffle(df, 7, "doc_id", num_partitions=4, keep_key=True)
    assert pinned.rdd.getNumPartitions() == 4
    pk = [r.shuffle_key for r in pinned.select("shuffle_key").collect()]
    assert pk == sorted(pk)
    # the key column matches the standalone expression
    expr = {
        r.doc_id: r.k
        for r in df.select(
            "doc_id", shuffle_key(7, "doc_id", alias="k")
        ).collect()
    }
    assert all(r.shuffle_key == expr[r.doc_id] for r in rows)
    with pytest.raises(ValueError):
        global_shuffle(df, 7)


def test_pack_sequences_intervals(spark):
    from datasplash_spark.functions.text import pack_sequences

    df = generate_input(
        spark,
        [
            (1, "a b c", "s"),       # 3 tokens -> [0, 3)
            (2, "d e", "s"),         # 2 tokens -> [3, 5)
            (3, "f g h i j k", "s"), # 6 tokens -> [5, 11)
            (4, "x y", "t"),         # separate stream -> [0, 2)
        ],
        "doc_id bigint, text string, source string",
    )
    got = {
        r.doc_id: (r.part, r.n_tok, r.start_tok, r.pack_id, r.pack_offset)
        for r in pack_sequences(df, seq_len=4).collect()
    }
    assert got == {
        1: ("s", 3, 0, 0, 0),
        2: ("s", 2, 3, 0, 3),
        3: ("s", 6, 5, 1, 1),
        4: ("t", 2, 0, 0, 0),
    }
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)


def test_char_entropy_signals(spark):
    """Uniform-junk text scores near zero; varied prose scores high;
    single-char and empty texts are well-defined."""
    from datasplash_spark.functions.text import char_entropy

    docs = generate_input(
        spark,
        [
            (1, "aaaaaaaaaaaaaaaa"),          # zero entropy
            (2, "abcdefghijklmnop"),          # 4 bits (16 distinct, uniform)
            (3, "the quick brown fox"),       # prose-ish
        ],
        "doc_id bigint, text string",
    )
    h = {
        r.doc_id: r.h
        for r in docs.select("doc_id", char_entropy("text").alias("h")).collect()
    }
    assert h[1] == 0.0
    assert abs(h[2] - 4.0) < 1e-6
    assert 0.0 < h[3] < 4.5


def test_linear_doc_scores_manual(spark):
    """Score equals the hand-computed mean bucket weight."""
    from datasplash_spark.functions.text import (
        hash_bucket,
        hash_bucket_weights,
        linear_doc_scores,
    )

    docs = generate_input(
        spark, [(1, "alpha beta beta")], "doc_id bigint, text string"
    )
    w = hash_bucket_weights(spark, 64)
    wmap = {r.bucket: r.weight for r in w.collect()}
    buckets = [
        r.b
        for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("beta",)], "t string"
        ).select(hash_bucket("t", 64).alias("b")).collect()
    ]
    expected = round(sum(wmap[b] for b in buckets) / 3, 6)
    row = linear_doc_scores(docs, w, n_buckets=64).collect()[0]
    assert row.n_toks == 3
    assert row.logit == expected


def test_remove_repeated_spans_differential_random(spark):
    """Differential check: the Spark implementation equals a direct
    pure-Python reference on random small corpora drawn from a tiny
    vocabulary (dense window collisions), across k and min_count."""
    import random

    from collections import Counter

    def py_remove(docs, k, min_count):
        toks_by = {d: t.lower().split(" ") for d, t in docs}
        cnt: Counter = Counter()
        occ = {}
        for d, toks in toks_by.items():
            m = max(len(toks) - k + 1, 1)
            occ[d] = []
            for i in range(1, m + 1):
                w = " ".join(toks[i - 1 : i - 1 + k])
                cnt[w] += 1
                occ[d].append((i, w))
        out = {}
        for d, toks in toks_by.items():
            starts = [i for i, w in occ[d] if cnt[w] >= min_count]
            kept = [
                t
                for j, t in enumerate(toks, 1)
                if not any(s <= j < s + k for s in starts)
            ]
            out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
        return out

    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    for trial, (k, mc) in enumerate([(2, 2), (3, 2), (2, 3)]):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(25)
        ]
        expected = py_remove(docs, k, mc)
        df = generate_input(spark, docs, "doc_id bigint, text string")
        got = {
            r.doc_id: (r.text_clean, r.n_tokens, r.n_removed)
            for r in dd.remove_repeated_spans(
                df, k=k, min_count=mc
            ).collect()
        }
        assert got == expected, f"trial {trial} (k={k}, min_count={mc})"


def test_temperature_mix_upsamples_tail(spark):
    """alpha<1 up-samples the small stratum relative to natural
    proportions; alpha=1 reproduces them; budgets are derived, total
    admitted weight stays within total_budget; deterministic."""
    import pytest as _pytest

    from datasplash_spark.operators import temperature_mix

    # head stratum 'big': 90 docs x 10 tokens; tail 'small': 10 x 10
    rows = [(i, "big", 10) for i in range(90)] + [
        (100 + i, "small", 10) for i in range(10)
    ]
    df = generate_input(spark, rows, "doc_id bigint, source string, n_tok long")

    def shares(alpha):
        out = temperature_mix(
            df, "source", "n_tok", total_budget=500, alpha=alpha, seed=1
        )
        agg = {
            r.source: r.s
            for r in out.groupBy("source")
            .agg(F.sum("n_tok").alias("s"))
            .collect()
        }
        return agg.get("big", 0), agg.get("small", 0)

    b1, s1 = shares(1.0)   # natural: 90/10 split of 500 -> 450/50
    b5, s5 = shares(0.5)   # sqrt: 3:1 -> 375/125
    assert b1 + s1 <= 500 and b5 + s5 <= 500
    assert s5 > s1          # tail up-sampled
    assert b5 < b1          # head down-sampled
    assert (b1, s1) == (450, 50)
    # big: floor(500*0.75)=375 -> 37 docs = 370; small: budget 125
    # exceeds the stratum's 100 tokens -> the whole stratum admits
    assert (b5, s5) == (370, 100)
    # determinism: same seed -> same admitted ids
    ids_a = sorted(
        r.doc_id
        for r in temperature_mix(
            df, "source", "n_tok", total_budget=500, alpha=0.5, seed=1
        ).collect()
    )
    ids_b = sorted(
        r.doc_id
        for r in temperature_mix(
            df, "source", "n_tok", total_budget=500, alpha=0.5, seed=1
        ).collect()
    )
    assert ids_a == ids_b
    with _pytest.raises(ValueError):
        temperature_mix(df, "source", "n_tok", 500, alpha=1.5)


def test_quota_per_key_caps_and_determinism(spark):
    from datasplash_spark.operators import quota_per_key

    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = generate_input(spark, rows, "id bigint, src string")
    out = quota_per_key(df, "src", 5, "id", seed=3)
    counts = {r.src: r.c for r in out.groupBy("src").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert counts == {"big": 5, "small": 5}
    # deterministic: same ids survive on a rerun
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(r.id for r in quota_per_key(df, "src", 5, "id", seed=3).collect())
    assert ids1 == ids2
    # a row's fate is independent of OTHER keys' rows
    big_only = quota_per_key(df.filter(F.col("src") == "big"), "src", 5, "id", seed=3)
    assert sorted(r.id for r in big_only.collect()) == [
        i for i in ids1 if i < 40
    ]


def test_source_overlap_counts_shared_shingles(spark):
    docs = generate_input(
        spark,
        [
            (1, "a b c d e", "s1"),
            (2, "a b c x y", "s2"),   # shares shingle "a b c" with s1
            (3, "p q r s t", "s3"),   # shares nothing
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r.n_shared
        for r in dd.source_overlap(docs, k=3).collect()
    }
    assert out == {("s1", "s2"): 1}


def test_knn_join_matches_per_query_bruteforce(spark):
    """knn_join's per-query result equals brute_force_topk run with
    that query's vector."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sim.knn_join(emb, queries, k=3, round_to=9)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
    for qid, expected_pairs in by_q.items():
        qvec = emb.filter(F.col("vec_id") == qid).first().embedding
        bf = sim.brute_force_topk(emb, list(qvec), k=3).collect()
        assert [(r.vec_id, round(r.score, 9)) for r in bf] == sorted(
            expected_pairs, key=lambda p: (-p[1], p[0])
        )


def test_filter_by_quantile_above_below(spark):
    from datasplash_spark.operators import filter_by_quantile

    df = generate_input(
        spark, [(i, float(i)) for i in range(1, 11)], "id bigint, v double"
    )
    above = sorted(r.id for r in filter_by_quantile(df, "v", 0.5).collect())
    below = sorted(
        r.id for r in filter_by_quantile(df, "v", 0.5, keep="below").collect()
    )
    # median of 1..10 = 5.5 (linear interpolation)
    assert above == [6, 7, 8, 9, 10]
    assert below == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        filter_by_quantile(df, "v", 0.5, keep="middle")


def test_quantile_buckets_assignment(spark):
    from datasplash_spark.operators import quantile_buckets

    df = generate_input(
        spark, [(i, float(i)) for i in range(1, 9)], "id bigint, v double"
    )
    out = {r.id: r.qbucket for r in quantile_buckets(df, "v", 4).collect()}
    # cuts at quantile_cont([.25,.5,.75]) of 1..8 = (2.75, 4.5, 6.25)
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}
    assert quantile_buckets(df, "v", 4, approx=True).count() == 8


def test_keep_best_per_cluster_picks_highest_score(spark):
    docs = generate_input(
        spark,
        [(1, 10.0), (2, 30.0), (3, 20.0), (9, 5.0)],
        "doc_id bigint, score double",
    )
    clusters = generate_input(
        spark,
        [(1, 1), (2, 1), (3, 1), (9, 9)],  # {1,2,3} one cluster; 9 singleton
        "doc_id bigint, cluster_id bigint",
    )
    out = sorted(
        r.doc_id
        for r in dd.keep_best_per_cluster(docs, clusters, "score").collect()
    )
    assert out == [2, 9]


@pytest.mark.slow  # 7 s; the star-vs-hash-min parity is
# default-gated by test_connected_components_star_matches_hash_min —
# this is the 400-diameter worst-case stress of the same split
def test_giant_component_chain_stress_hash_min_vs_star(spark):
    """The designed escalation split, pinned at stress size: a
    400-node single chain (diameter 400 — the worst case for
    label propagation, and a stand-in for the giant component a
    pathological LSH bucket can produce).

    - hash-min advances the min label O(1) hops per round: it MUST
      raise (not silently split the component) when max_iter is far
      below the diameter;
    - star contraction halves chains per alternating phase: it must
      label the whole chain within an O(log² n) round budget (12
      rounds for n=400 — fails if a regression makes it linear).
    """
    import pytest

    from datasplash_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    n = 400
    edges = generate_input(
        spark, [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=10, driver_threshold=0)

    comp = {
        r.node: r.component
        for r in connected_components_star(edges, max_iter=12).collect()
    }
    assert len(comp) == n + 1
    assert set(comp.values()) == {0}


def test_new_ops_edge_cases(spark):
    """Empty/degenerate inputs: remove_repeated_spans on an empty
    corpus and on a no-dup corpus; temperature_mix with a zero-weight
    stratum; global_shuffle on an empty frame."""
    from datasplash_spark.operators import global_shuffle, temperature_mix

    empty = generate_input(spark, [], "doc_id bigint, text string")
    assert dd.remove_repeated_spans(empty, k=3).count() == 0
    assert global_shuffle(empty, 1, "doc_id").count() == 0

    nodup = generate_input(
        spark, [(1, "p q r"), (2, "x y z")], "doc_id bigint, text string"
    )
    rows = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in dd.remove_repeated_spans(nodup, k=2).collect()
    }
    assert rows == {1: ("p q r", 0), 2: ("x y z", 0)}

    # a stratum whose total weight is 0 gets budget 0 -> nothing
    # admitted from it; other strata unaffected
    mix = generate_input(
        spark,
        [(1, "a", 10), (2, "a", 10), (3, "z", 0), (4, "z", 0)],
        "doc_id bigint, source string, n_tok long",
    )
    out = temperature_mix(mix, "source", "n_tok", total_budget=20, alpha=0.5, seed=1)
    got = sorted(r.doc_id for r in out.collect())
    assert got == [1, 2]


def test_ngram_containment_asymmetric(spark):
    """A short doc embedded in a long one: containment(short in
    long)=1 while Jaccard is well below; containment is directional;
    no-shingle edge yields 0."""
    long_t = "a b c d e f g h i j"
    short_t = "c d e f"          # contained run
    df = generate_input(
        spark,
        [(short_t, long_t), (long_t, short_t), ("q r", "x y z w")],
        "t1 string, t2 string",
    )
    rows = df.select(
        dd.ngram_containment("t1", "t2", k=2).alias("c"),
        F.round(dd.ngram_jaccard("t1", "t2", k=2), 6).alias("j"),
    ).collect()
    assert rows[0].c == 1.0 and rows[0].j < 0.5      # short in long
    assert rows[1].c < 0.5                           # long in short
    assert rows[2].c == 0.0 and rows[2].j == 0.0     # disjoint


def test_ivf_store_probe_matches_inmemory(spark, tmp_path):
    """materialize_ivf + ivf_topk_from_store must reproduce the
    in-memory ivf_topk exactly (same centroids, same probe set)."""
    vecs = [
        (i, [float(i + 1)] + [float((i + j) % 3) + 1.0 for j in range(15)])
        for i in range(60)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    store = str(tmp_path / "ivf")
    cents = sim.materialize_ivf(df, store, n_cells=8)
    q = vecs[11][1]
    mem = [
        (r.vec_id, r.score)
        for r in sim.ivf_topk(df, q, k=5, n_cells=8, nprobe=3, centroids=cents).collect()
    ]
    st = [
        (r.vec_id, r.score)
        for r in sim.ivf_topk_from_store(spark, store, q, k=5, nprobe=3).collect()
    ]
    assert st == mem and st[0][0] == 11


def test_pair_join_broadcast_parallel(spark):
    """r13: when the driver-side EXACT sizing of the replicated
    candidate side fits the session broadcast threshold, the
    intra-cell pair join broadcasts it (the quadratic scoring then
    runs in the P-way probe stage instead of one AQE-coalesced
    post-shuffle task); with broadcasting disabled the sort-merge
    shape returns — and the pair/triple results are identical either
    way (the join strategy may never change what a query computes)."""
    vecs = [
        (i, [((i * 7 + j) % 11) - 5.0 for j in range(8)])
        for i in range(120)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    cents = sim.ivf_centroids(df, 4)
    cp = sim.contrastive_pairs(df, centroids=cents, seed=7, backend="expr")
    # semantic_dedup's pair join runs eagerly inside connected
    # components, so the plan assertion uses contrastive_pairs (same
    # _pair_join_parallel decision, visible in its final plan)
    plan = cp._jdf.queryExecution().executedPlan().toString()
    assert any(
        "BroadcastHashJoin" in ln and "_ga" in ln
        for ln in plan.splitlines()
    ), "pair join should broadcast under the default threshold"
    base_cp = sorted(map(tuple, cp.collect()))
    base_sd = sorted(
        map(
            tuple,
            sim.semantic_dedup(
                df, eps=0.2, centroids=cents, pair_backend="expr"
            ).collect(),
        )
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cp2 = sim.contrastive_pairs(
            df, centroids=cents, seed=7, backend="expr"
        )
        plan2 = cp2._jdf.queryExecution().executedPlan().toString()
        assert not any(
            "BroadcastHashJoin" in ln and "_ga" in ln
            for ln in plan2.splitlines()
        ), "disabled threshold must fall back to the sort-merge shape"
        assert sorted(map(tuple, cp2.collect())) == base_cp
        assert base_sd == sorted(
            map(
                tuple,
                sim.semantic_dedup(
                    df, eps=0.2, centroids=cents, pair_backend="expr"
                ).collect(),
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_trusted_dim_paths_match_fold_paths(spark, tmp_path):
    """r13 probe optimizations must be value-identical: the
    trusted-dim flat scoring equals the fold scoring bit-for-bit
    (scores compared exactly), the quantized trusted path equals the
    probe-validated path, the memoized store schema is invalidated
    by a rewrite, and the driver-side sidecar read returns exactly
    what spark.read.text returns."""
    vecs = [
        (i, [float(i + 1)] + [((i * 5 + j) % 7) - 3.0 for j in range(15)])
        for i in range(50)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    q = vecs[7][1]
    fold = [(r.vec_id, r.score) for r in sim.brute_force_topk(df, q, 8).collect()]
    flat = [
        (r.vec_id, r.score)
        for r in sim.brute_force_topk(df, q, 8, trusted_dim=len(q)).collect()
    ]
    assert flat == fold
    codes = sim.quantize_embeddings(df)
    qc = [int(x) for x in range(-8, 8)]
    probed = [(r.vec_id, r.score) for r in sim.quantized_topk(codes, qc, 8).collect()]
    trusted = [
        (r.vec_id, r.score)
        for r in sim.quantized_topk(codes, qc, 8, trusted_dim=len(qc)).collect()
    ]
    assert trusted == probed
    # schema memo: a rewrite at the same path must not serve the old
    # schema (mtime-keyed invalidation)
    store = str(tmp_path / "ivf_rw")
    cents = sim.materialize_ivf(df, store, n_cells=4)
    assert "embedding" in sim._read_store(spark, store).columns
    import time as _time

    _time.sleep(1.1)  # fs mtime granularity
    sim.materialize_ivf(df, store, n_cells=4, centroids=cents, quantize=True)
    cols = sim._read_store(spark, store).columns
    assert "codes" in cols and "embedding" not in cols
    # sidecar fast path == the Spark-job read
    side = store + "/_ivf_centroids"
    assert sim._read_sidecar_text(spark, side) == spark.read.text(side).first()[0]


def test_lsh_store_multiprobe_recall(spark, tmp_path):
    """materialize_lsh + multi-probe: nprobe=1 equals the in-memory
    exact-bucket probe; higher nprobe can only widen the candidate
    set (recall is monotone in nprobe); the query vector itself is
    always found."""
    vecs = [
        (i, [float(i + 1)] + [float((i * 7 + j) % 5) - 2.0 for j in range(15)])
        for i in range(80)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    store = str(tmp_path / "lsh")
    sim.materialize_lsh(df, store, bits=6)
    q = vecs[13][1]
    one = [
        (r.vec_id, r.score)
        for r in sim.lsh_topk_from_store(spark, store, q, k=5, bits=6, nprobe=1).collect()
    ]
    mem = [
        (r.vec_id, r.score)
        for r in sim.lsh_bucketed_topk(df, q, k=5, bits=6).collect()
    ]
    assert one == mem and one[0][0] == 13
    exact = {r.vec_id for r in sim.brute_force_topk(df, q, k=5).collect()}
    hits = []
    for np in (1, 3, 6):
        got = {
            r.vec_id
            for r in sim.lsh_topk_from_store(
                spark, store, q, k=5, bits=6, nprobe=np
            ).collect()
        }
        hits.append(len(got & exact))
    assert hits == sorted(hits)  # recall monotone in nprobe


def test_shuffle_key_multicolumn_no_collision(spark):
    """(1,12) vs (11,2) must hash differently (separator), NULL ids
    get a stable non-null key, and temperature_mix excludes NULL-key
    strata from budgets AND output."""
    from datasplash_spark.operators import shuffle_key, temperature_mix

    df = generate_input(
        spark,
        [(1, 12), (11, 2), (None, 3)],
        "a bigint, b bigint",
    )
    keys = [
        r.k for r in df.select(shuffle_key(7, "a", "b", alias="k")).collect()
    ]
    assert len(set(keys)) == 3 and all(k is not None for k in keys)

    mix = generate_input(
        spark,
        [(1, "a", 10), (2, "a", 10), (3, None, 100), (4, None, 100)],
        "doc_id bigint, source string, n_tok long",
    )
    out = temperature_mix(mix, "source", "n_tok", total_budget=20, alpha=0.5, seed=1)
    got = sorted(r.doc_id for r in out.collect())
    # NULL stratum neither admits nor shrinks stratum 'a''s budget
    assert got == [1, 2]


def test_dsir_scores_rank_targetlike_higher(spark):
    """A raw doc written in the target's vocabulary must out-score a
    raw doc in raw-only vocabulary (the DSIR selling point); scores
    are deterministic across runs."""
    from datasplash_spark.functions.text import dsir_scores

    target = generate_input(
        spark,
        [(100 + i, "alpha beta gamma delta") for i in range(5)],
        "doc_id bigint, text string",
    )
    raw = generate_input(
        spark,
        [
            (1, "alpha beta gamma delta"),   # target-like
            (2, "zeta omega kappa sigma"),   # raw-only vocabulary
            (3, "zeta omega kappa sigma"),
        ],
        "doc_id bigint, text string",
    )
    scores = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(raw, target, n_buckets=64).collect()
    }
    assert scores[1] > scores[2]
    assert scores[2] == scores[3]  # identical docs, identical score
    again = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(raw, target, n_buckets=64).collect()
    }
    assert again == scores


def test_semantic_dedup_groups_and_survivors(spark):
    """SemDeDup: planted near-identical groups collapse to one
    component each with exactly one survivor — the member with the
    LOWEST cosine to its cell centroid (keep-the-outlier), ties to
    the lowest id — and components never span cells."""
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    vecs, vid = [], 0
    for b in base:
        for k in range(3):  # three near-copies per group
            vecs.append(
                (vid, [x + 0.02 * k * (i + 1) for i, x in enumerate(b)])
            )
            vid += 1
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    out = sim.semantic_dedup(
        df, eps=0.9, centroids=base, cache=True
    ).collect()
    assert len(out) == len(vecs)
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r.component, []).append(r)
    assert len(by_comp) == 3
    for comp, members in by_comp.items():
        assert len(members) == 3
        assert sum(r.keep for r in members) == 1
        assert len({r.cell for r in members}) == 1
        assert comp == min(r.vec_id for r in members)
        # survivor = min (centroid_cos, vec_id)
        expect = min(members, key=lambda r: (r.centroid_cos, r.vec_id))
        got = next(r for r in members if r.keep)
        assert got.vec_id == expect.vec_id

    # python cross-check of the survivor rule on raw cosines
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na * nb > 0 else 0.0

    cell_of = {r.vec_id: r.cell for r in out}
    for r in out:
        v = dict(vecs)[r.vec_id]
        c = base[cell_of[r.vec_id]]
        assert abs(r.centroid_cos - round(round(cos(v, c), 9), 6)) < 1e-9


def test_ivf_knn_join_full_probe_equals_exact(spark):
    """ivf_knn_join with nprobe = n_cells degrades to the exact
    knn_join (every cell probed ⇒ identical candidate set, identical
    ranking); with nprobe=1 each query's own vector is still its top
    hit (its cell is always probed)."""
    vecs = [
        (i, [float(i + 1)] + [float((i * j) % 5) + 1.0 for j in range(7)])
        for i in range(60)
    ]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    queries = df.filter("vec_id % 20 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    exact = {
        (r.query_id, r.vec_id, r.score)
        for r in sim.knn_join(df, queries, k=5).collect()
    }
    full = {
        (r.query_id, r.vec_id, r.score)
        for r in sim.ivf_knn_join(
            df, queries, k=5, n_cells=4, nprobe=4
        ).collect()
    }
    assert full == exact
    narrow = sim.ivf_knn_join(df, queries, k=5, n_cells=4, nprobe=1)
    rows = narrow.collect()
    tops = {
        r.query_id: r.vec_id
        for r in rows
        if r.score == max(x.score for x in rows if x.query_id == r.query_id)
    }
    for qid, vid in tops.items():
        assert vid == qid


def test_semantic_dedup_differential_random(spark):
    """Differential check: semantic_dedup equals a direct pure-Python
    reference (nearest-centroid argmax at 9 dp with lowest-cell ties,
    within-cell union-find over cos>=eps pairs, min-(centroid_cos,id)
    survivor) on random corpora with planted near-dup clumps."""
    import math
    import random

    def dotp(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def cosine(a, b):
        na, nb = math.sqrt(dotp(a, a)), math.sqrt(dotp(b, b))
        return dotp(a, b) / (na * nb) if na * nb > 0 else 0.0

    def py_semdedup(vecs, cents, eps):
        cell, ccos = {}, {}
        for vid, v in vecs:
            scores = [round(cosine(v, c), 9) for c in cents]
            best = max(range(len(cents)), key=lambda i: (scores[i], -i))
            cell[vid], ccos[vid] = best, scores[best]
        parent = {vid: vid for vid, _ in vecs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        vl = dict(vecs)
        ids = sorted(vl)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if cell[a] == cell[b] and round(
                    cosine(vl[a], vl[b]), 9
                ) >= eps:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comp = {vid: find(vid) for vid in ids}
        keep = {
            min(g, key=lambda v: (ccos[v], v))
            for root in set(comp.values())
            for g in [[v for v in ids if comp[v] == root]]
        }
        return cell, comp, keep

    rng = random.Random(11)
    for trial, eps in enumerate([0.5, 0.8, 0.95]):
        vecs = []
        vid = 0
        for _ in range(8):  # clumps of 1-4 near-identical vectors
            center = [rng.uniform(-1, 1) for _ in range(6)]
            for _ in range(rng.randint(1, 4)):
                vecs.append(
                    (vid, [x + rng.uniform(-0.05, 0.05) for x in center])
                )
                vid += 1
        cents = [v for _, v in vecs[:3]]
        exp_cell, exp_comp, exp_keep = py_semdedup(vecs, cents, eps)
        df = generate_input(
            spark, vecs, "vec_id bigint, embedding array<double>"
        )
        rows = sim.semantic_dedup(df, eps=eps, centroids=cents).collect()
        assert {r.vec_id: r.cell for r in rows} == exp_cell, f"trial {trial}"
        assert {r.vec_id: r.component for r in rows} == exp_comp, (
            f"trial {trial}"
        )
        assert {r.vec_id for r in rows if r.keep} == exp_keep, f"trial {trial}"


def test_semantic_dedup_mega_cell_salting_exact(spark):
    """VERDICT r4 item 4: a planted mega-cell (duplicate-heavy slice
    landing in ONE IVF cell) must go through the block-decomposed
    self-join (s > 1 sub-groups) and still produce bit-identical
    output to the unguarded join — the guard redistributes the
    quadratic work, never changes the pair set."""
    import random

    rng = random.Random(5)
    rows = []
    # 120 near-identical vectors -> one cell; eps low enough that the
    # pair graph inside the mega-cell is non-trivial (not one clique)
    for i in range(120):
        rows.append(
            (
                i,
                [
                    1.0 + rng.uniform(-0.3, 0.3),
                    rng.uniform(-0.3, 0.3),
                    rng.uniform(-0.1, 0.1),
                ],
            )
        )
    for i in range(120, 160):  # background spread
        rows.append((i, [rng.uniform(-1, 1) for _ in range(3)]))
    df = generate_input(
        spark, rows, "vec_id bigint, embedding array<double>"
    )
    cents = sim.ivf_centroids(df, 6)
    unguarded = sorted(
        sim.semantic_dedup(
            df, eps=0.97, centroids=cents, max_cell_rows=1 << 30
        ).collect()
    )
    # bound of 8 rows/block over a ~120-row cell -> s well above 1
    guarded = sorted(
        sim.semantic_dedup(
            df, eps=0.97, centroids=cents, max_cell_rows=8, max_salt=16
        ).collect()
    )
    assert guarded == unguarded
    assert sum(r.keep for r in guarded) < len(rows)  # dedup happened


def test_corpus_diff_statuses(spark):
    """corpus_diff labels added/removed/changed and emits nothing for
    unchanged documents."""
    from datasplash_spark.functions.dedup import corpus_diff

    old = generate_input(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        "doc_id bigint, text string",
    )
    new = generate_input(
        spark,
        [(2, "b"), (3, "C2"), (4, "d")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}

    # NULL text is a presence, not an absence: a NULL-text doc still
    # counts on its side, NULL→text is 'changed', NULL→NULL is
    # unchanged (no row)
    old2 = generate_input(
        spark,
        [(1, None), (2, None), (3, "c")],
        "doc_id bigint, text string",
    )
    new2 = generate_input(
        spark,
        [(2, "now present"), (3, "c"), (5, None)],
        "doc_id bigint, text string",
    )
    got2 = {r.doc_id: r.status for r in corpus_diff(old2, new2).collect()}
    assert got2 == {1: "removed", 2: "changed", 5: "added"}


def test_filter_report_and_counts_fail_closed(spark):
    """filter_report: failed lists are sorted, passed mirrors an
    empty list, and a NULL predicate counts as a failure
    (fail-closed); filter_counts agrees with the per-doc report."""
    from pyspark.sql import functions as F

    from datasplash_spark.functions.text import filter_counts, filter_report

    df = generate_input(
        spark,
        [(1, "good text", 5), (2, "bad", None), (3, None, 2)],
        "doc_id bigint, text string, score int",
    )
    filters = {
        "has_text": F.length("text") > 4,       # NULL text -> NULL -> fail
        "scored": F.col("score") >= 2,          # NULL score -> fail
    }
    rep = {r.doc_id: r for r in filter_report(df, filters).collect()}
    assert rep[1].failed == [] and rep[1].passed == 1
    assert rep[2].failed == ["has_text", "scored"] and rep[2].passed == 0
    assert rep[3].failed == ["has_text"] and rep[3].passed == 0

    counts = {
        r.filter: (r.n_failed, r.n_total)
        for r in filter_counts(df, filters).collect()
    }
    assert counts == {"has_text": (2, 3), "scored": (1, 3)}

    # names are display literals, never column identifiers: dots and
    # alias-colliding names must work in BOTH report and counts
    odd = {"len.min": F.length("text") > 4, "_ft": F.col("score") >= 2}
    rep_odd = {r.doc_id: r.failed for r in filter_report(df, odd).collect()}
    assert rep_odd[2] == ["_ft", "len.min"]
    counts_odd = {
        r.filter: r.n_failed for r in filter_counts(df, odd).collect()
    }
    assert counts_odd == {"len.min": 2, "_ft": 1}


def test_filter_report_and_counts_empty_filters(spark):
    """ADVICE r4: zero filters must be a trivially-all-passed report
    (typed empty array, not the ARRAY<VOID> AnalysisException) and a
    zero-row counts frame with the contract schema."""
    from datasplash_spark.functions.text import filter_counts, filter_report

    df = generate_input(
        spark, [(1, "a"), (2, "b")], "doc_id bigint, text string"
    )
    rep = filter_report(df, {}).collect()
    assert [(r.doc_id, r.failed, r.passed) for r in sorted(rep)] == [
        (1, [], 1),
        (2, [], 1),
    ]
    assert dict(filter_report(df, {}).dtypes)["failed"] == "array<string>"

    counts = filter_counts(df, {})
    assert counts.collect() == []
    assert [f.name for f in counts.schema.fields] == [
        "filter",
        "n_failed",
        "n_total",
    ]


def test_lsh_tune_matches_scurve_theory():
    """lsh_tune picks the MMDS banding whose implied threshold
    (1/b)^(1/r) brackets the target; extremes of fp_weight push
    toward all-rows / all-bands as theory predicts."""
    from datasplash_spark.functions.dedup import lsh_tune

    assert lsh_tune(16, 0.5) == (4, 4)       # implied t ≈ 0.707 closest
    assert lsh_tune(16, 0.3) == (8, 2)       # implied t ≈ 0.354
    # higher threshold → more rows per band (later, steeper S-curve)
    assert lsh_tune(16, 0.8)[1] > lsh_tune(16, 0.3)[1]
    # caring only about FPs → max rows; only about FNs → max bands
    assert lsh_tune(16, 0.5, fp_weight=1.0) == (1, 16)
    assert lsh_tune(16, 0.5, fp_weight=0.0) == (16, 1)
    b, r = lsh_tune(60, 0.7)
    assert b * r == 60
    import pytest as _pt

    with _pt.raises(ValueError):
        lsh_tune(16, 0.0)
    with _pt.raises(ValueError):
        lsh_tune(0, 0.5)


def test_pca_matches_numpy(spark):
    """Distributed covariance (Arrow partial agg) and PCA projection
    agree with numpy to float tolerance; whitened projections have
    ~unit variance per component."""
    import numpy as np

    rng = np.random.RandomState(0)
    A = rng.randn(6, 6) * np.array([3.0, 2.0, 1.0, 0.5, 0.25, 0.1])
    X = rng.randn(200, 6) @ A.T + rng.randn(6)
    df = generate_input(
        spark,
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    ).repartition(5)

    n, mean, cov = sim.embedding_mean_cov(df)
    assert n == 200
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(X.T, ddof=1), atol=1e-8)

    mean2, comps, explained = sim.pca_components(df, 3)
    vals, vecs = np.linalg.eigh(np.cov(X.T, ddof=1))
    order = np.argsort(vals)[::-1][:3]
    ref = vecs[:, order].T.copy()
    for row in ref:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    assert np.allclose(comps, ref, atol=1e-6)
    assert explained[0] >= explained[1] >= explained[2] > 0

    got = {
        r.vec_id: np.asarray(r.pca)
        for r in sim.pca_project(df, mean2, comps).select(
            "vec_id", "pca"
        ).collect()
    }
    exp = (X - mean2) @ np.asarray(comps).T
    for i in range(200):
        assert np.allclose(got[i], exp[i], atol=1e-6)

    # whitening: projected variance ≈ 1 per kept component
    eigvals = vals[order]
    white = np.stack(
        [
            np.asarray(r.pca)
            for r in sim.pca_project(
                df, mean2, comps, whiten=list(eigvals)
            ).collect()
        ]
    )
    assert np.allclose(white.var(axis=0, ddof=1), 1.0, atol=1e-6)

    with pytest.raises(ValueError):
        sim.embedding_mean_cov(df.filter("vec_id < 0"))


def test_train_linear_classifier_matches_numpy_gd(spark):
    """Distributed full-batch GD equals a pure-numpy reference on the
    same hashed featurization (to float tolerance), separates the
    training set, and its weights slot into linear_doc_scores."""
    import hashlib

    import numpy as np

    from datasplash_spark.functions.text import (
        linear_doc_scores,
        train_linear_classifier,
    )

    pos = ["good great fine solid prose here"] * 4
    neg = ["bad junk spam noise garbage words"] * 4
    docs = [(i, t, 1) for i, t in enumerate(pos)] + [
        (10 + i, t, 0) for i, t in enumerate(neg)
    ]
    df = generate_input(
        spark, docs, "doc_id bigint, text string, label int"
    ).repartition(4)
    n_buckets, epochs, lr = 64, 15, 2.0

    wdf = train_linear_classifier(
        df, n_buckets=n_buckets, epochs=epochs, lr=lr
    )
    got = {r.bucket: r.weight for r in wdf.collect()}

    # numpy reference on the identical featurization
    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets

    X = np.zeros((len(docs), n_buckets))
    y = np.zeros(len(docs))
    for row_i, (_, t, lab) in enumerate(docs):
        toks = [tk for tk in t.lower().split(" ") if tk]
        for tk in toks:
            X[row_i, bucket(tk)] += 1.0 / len(toks)
        y[row_i] = lab
    w = np.zeros(n_buckets)
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= lr * (X.T @ (p - y)) / len(docs)
    assert set(got) == set(range(n_buckets))  # DENSE weight table
    for b in range(n_buckets):
        assert abs(got[b] - w[b]) < 1e-9, b

    # the trained weights separate the training set via the shared
    # inference path (logit = mean token weight)
    scored = linear_doc_scores(df, wdf, n_buckets=n_buckets)
    logits = {
        r.doc_id: r.logit
        for r in scored.collect()
    }
    for i, (_, _, lab) in zip([d[0] for d in docs], docs):
        assert (logits[i] > 0) == (lab == 1)

    # docs whose every token hits an untrained bucket still score
    # (logit 0), and NULL labels refuse to train
    import pyspark.sql.functions as _F

    unseen = generate_input(
        spark, [(99, "zzzz qqqq wwww", 0)], "doc_id bigint, text string, label int"
    )
    s99 = linear_doc_scores(unseen, wdf, n_buckets=n_buckets).collect()
    assert len(s99) == 1 and s99[0].n_toks == 3
    with pytest.raises(ValueError, match="NULL labels"):
        train_linear_classifier(
            df.withColumn(
                "label",
                _F.when(_F.col("doc_id") == 0, None).otherwise(
                    _F.col("label")
                ),
            ),
            n_buckets=n_buckets,
            epochs=1,
        )


def test_embedding_ops_empty_inputs(spark):
    """Empty corpora degrade to empty, correctly-typed results (or a
    clear ValueError for the raw fold), never a cryptic
    AnalysisException."""
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = sim.semantic_dedup(empty, n_cells=4, eps=0.5)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cell", "component", "centroid_cos", "keep"]
    q = empty.selectExpr("vec_id AS query_id", "embedding")
    knn = sim.ivf_knn_join(empty, q, k=3, n_cells=4)
    assert knn.count() == 0
    assert knn.columns == ["query_id", "vec_id", "score"]
    with pytest.raises(ValueError, match="non-empty"):
        sim.ivf_assign("embedding", [])
    # explicit empty centroids on a NON-empty corpus is a caller bug
    # (e.g. a missing persisted quantizer loaded as []) — raise, never
    # silently drop the corpus
    nonempty = generate_input(
        spark, [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="explicit centroids"):
        sim.semantic_dedup(nonempty, centroids=[])
    with pytest.raises(ValueError, match="explicit centroids"):
        sim.ivf_knn_join(
            nonempty,
            nonempty.selectExpr("vec_id AS query_id", "embedding"),
            centroids=[],
        )


def test_bigram_pmi_matches_reference(spark):
    """bigram_pmi equals a pure-Python PMI computation on a tiny
    corpus (same division chain + nano rounding); bigrams never span
    documents; min_count prunes; empty-token filtering preserves
    adjacency of the surviving tokens."""
    import math
    from collections import Counter

    from datasplash_spark.functions.text import bigram_pmi

    rows = [
        (1, "new york is a big city"),
        (2, "new york  and  new jersey"),   # double spaces -> empties
        (3, "a big apple in new york"),
        (4, "york new"),                     # reversed: separate pair
        (5, "new york new york new york"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    got = {
        (r.term_a, r.term_b): (r.n_ab, r.pmi_nano)
        for r in bigram_pmi(df, min_count=2).collect()
    }

    toks = [t for _, s in rows for t in s.lower().split(" ") if t]
    docs = [[t for t in s.lower().split(" ") if t] for _, s in rows]
    uni = Counter(toks)
    bgs = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            bgs[(a, b)] += 1
    n_tok, n_big = sum(uni.values()), sum(bgs.values())
    exp = {}
    for (a, b), c in bgs.items():
        if c < 2:
            continue
        ratio = (c / n_big) / ((uni[a] / n_tok) * (uni[b] / n_tok))
        exp[(a, b)] = (c, round(math.log(ratio) * 1e9))
    assert got == exp
    assert ("new", "york") in got and got[("new", "york")][0] == 6
    # cross-doc adjacency never counted: doc 4 ends with 'new', doc 5
    # starts with 'new' — ('new','new') would need a doc boundary span
    assert ("new", "new") not in bgs


def test_contrastive_pairs_semantics(spark):
    """contrastive_pairs: hardest in-cell positive (max cosine, tie
    to lowest id), NULL positive for singleton cells, and the
    deterministic cross-cell negative — m1 for cells other than m1's
    own, m2 (min-md5 of OTHER cells) for m1's cell."""
    import hashlib

    # two well-separated cells: x-axis cluster + y-axis cluster, and
    # one singleton z-axis vector as its own cell
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.05, 0.0]),
        (3, [1.0, 0.4, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 1.0, 0.05]),
        (20, [0.0, 0.0, 1.0]),
    ]
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    df = generate_input(spark, vecs, "vec_id bigint, embedding array<double>")
    rows = {
        r.vec_id: r
        for r in sim.contrastive_pairs(df, centroids=cents, seed=7).collect()
    }
    assert rows[1].pos_id == 2 and rows[2].pos_id == 1  # nearest pair
    assert rows[3].pos_id == 2                          # 2 closer than 1? check below
    assert rows[10].pos_id == 11 and rows[11].pos_id == 10
    assert rows[20].pos_id is None and rows[20].pos_cos is None

    # negative: m1 = min md5('7'||id) overall; anchors in m1's cell
    # get m2 = min md5 among OTHER cells
    h = lambda i: hashlib.md5(f"7{i}".encode()).hexdigest()
    m1 = min((h(i), i) for i, _ in vecs)[1]
    cell_of = {1: 0, 2: 0, 3: 0, 10: 1, 11: 1, 20: 2}
    m2 = min((h(i), i) for i, _ in vecs if cell_of[i] != cell_of[m1])[1]
    for i, _ in vecs:
        expected = m1 if cell_of[i] != cell_of[m1] else m2
        assert rows[i].neg_id == expected, (i, rows[i].neg_id, m1, m2)
        assert cell_of[rows[i].neg_id] != cell_of[i]    # always cross-cell


def test_cohort_retention_matrix(spark):
    """cohort_retention: cohort = first activity week; per-user
    multiple events in one week count once; returning users appear in
    later periods under their original cohort."""
    from datasplash_spark.functions.events import cohort_retention

    # week starts (Mondays): 2024-01-01, 2024-01-08, 2024-01-15
    rows = [
        (1, "2024-01-02 10:00:00"),  # u1 cohort w1
        (1, "2024-01-03 11:00:00"),  # same week, counts once
        (1, "2024-01-09 10:00:00"),  # returns w2
        (2, "2024-01-02 09:00:00"),  # u2 cohort w1, never returns
        (3, "2024-01-10 09:00:00"),  # u3 cohort w2
        (3, "2024-01-16 09:00:00"),  # returns w3
    ]
    df = generate_input(
        spark, rows, "user_id bigint, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.cohort, r.period): r.n_users
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    import datetime as _dt

    def wk(day):
        return int(
            _dt.datetime(2024, 1, day, tzinfo=_dt.timezone.utc).timestamp()
        )

    w1, w2, w3 = wk(1), wk(8), wk(15)
    assert got == {
        (w1, w1): 2,   # u1, u2 start
        (w1, w2): 1,   # u1 returns
        (w2, w2): 1,   # u3 starts
        (w2, w3): 1,   # u3 returns
    }


def test_semantic_dedup_arrow_backend_equals_expr(spark):
    """pair_backend='arrow' (per-cell blocked BLAS gemm) must produce
    the identical result to the expression fold on clear-margin data
    (planted clusters far from the eps boundary), including zero-norm
    vectors (score 0, never paired) and a sub-block-size cell mix."""
    import random

    rng = random.Random(3)
    rows = []
    for _ in range(40):
        c = [rng.uniform(-1, 1) for _ in range(8)]
        for _ in range(rng.randint(1, 5)):
            rows.append(
                (len(rows), [x + rng.uniform(-0.02, 0.02) for x in c])
            )
    rows.append((len(rows), [0.0] * 8))  # zero-norm
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    cents = sim.ivf_centroids(df, 8)
    a = sorted(sim.semantic_dedup(df, eps=0.9, centroids=cents).collect())
    b = sorted(
        sim.semantic_dedup(
            df, eps=0.9, centroids=cents, pair_backend="arrow"
        ).collect()
    )
    assert a == b

    import pytest as _pt

    with _pt.raises(ValueError):
        sim.semantic_dedup(df, pair_backend="bogus")


def test_ivf_knn_join_arrow_backend_equals_expr(spark):
    """score_backend='arrow' (per-cell cogroup gemm) returns the
    identical batch-ANN result as the expression fold, including
    queries whose probed cells hold no candidates."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(80)
    ]
    corpus = generate_input(
        spark, rows, "vec_id bigint, embedding array<double>"
    )
    queries = generate_input(
        spark,
        [(100 + j, [rng.uniform(-1, 1) for _ in range(6)]) for j in range(7)],
        "query_id bigint, embedding array<double>",
    )
    kw = dict(k=4, n_cells=8, nprobe=2)
    a = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in sim.ivf_knn_join(corpus, queries, **kw).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in sim.ivf_knn_join(
            corpus, queries, score_backend="arrow", **kw
        ).collect()
    )
    assert a == b and len(a) == 7 * 4

    import pytest as _pt

    with _pt.raises(ValueError):
        sim.ivf_knn_join(corpus, queries, score_backend="bogus", **kw)


def test_round5_ops_degenerate_inputs(spark):
    """Degenerate-input pins for the round-5 surface: empty corpora
    and sub-minimal documents return empty (typed) results, never
    errors; singleton cells/keys take their defined fallbacks."""
    from pyspark.sql import functions as F

    from datasplash_spark.functions.text import bigram_pmi

    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert bigram_pmi(empty_docs).count() == 0
    one_tok = generate_input(
        spark, [(1, "hello"), (2, "")], "doc_id bigint, text string"
    )
    assert bigram_pmi(one_tok, min_count=1).count() == 0  # no adjacency

    two = generate_input(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = sorted(
        (r.vec_id, r.pos_id, r.neg_id)
        for r in sim.contrastive_pairs(two, n_cells=16).collect()
    )
    assert rows == [(1, None, 2), (2, None, 1)]  # singleton cells

    empty_vec = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    assert sim.contrastive_pairs(empty_vec).count() == 0


def test_contrastive_pairs_arrow_backend_equals_expr(spark):
    """backend='arrow' (per-cell gemm + argmax, ties to lowest id)
    returns the identical triples as the expression rank, including
    singleton-cell NULL positives and tie candidates."""
    import random

    rng = random.Random(17)
    rows = []
    for _ in range(30):
        c = [rng.uniform(-1, 1) for _ in range(6)]
        for _ in range(rng.randint(1, 4)):
            rows.append(
                (len(rows), [x + rng.uniform(-0.03, 0.03) for x in c])
            )
    # planted exact tie: two identical candidates for one anchor
    rows.append((500, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    rows.append((501, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0]))
    rows.append((502, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0]))  # same as 501
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    cents = sim.ivf_centroids(df, 8)
    a = sorted(
        map(tuple, sim.contrastive_pairs(df, centroids=cents).collect())
    )
    b = sorted(
        map(
            tuple,
            sim.contrastive_pairs(
                df, centroids=cents, backend="arrow"
            ).collect(),
        )
    )
    assert a == b

    import pytest as _pt

    with _pt.raises(ValueError):
        sim.contrastive_pairs(df, backend="bogus")


def test_bm25_batch_matches_single_query_runs(spark):
    """bm25_batch: each query's rows are bit-identical to a
    single-query bm25_scores run (shared tf/df/dl pass changes
    nothing); top_k prunes per query by (score desc, id asc)."""
    from datasplash_spark.functions.text import bm25_batch, bm25_scores

    docs = generate_input(
        spark,
        [
            (1, "spark table row"),
            (2, "spark spark window"),
            (3, "table scan row row"),
            (4, "unrelated words here"),
        ],
        "doc_id bigint, text string",
    )
    qs = {"a": ["spark", "row"], "b": ["table"]}
    batch = bm25_batch(docs, qs)
    for qid, terms in qs.items():
        single = {
            (r.doc_id, r.n_matched, r.score_nano)
            for r in bm25_scores(docs, terms).collect()
        }
        got = {
            (r.doc_id, r.n_matched, r.score_nano)
            for r in batch.filter(F.col("query_id") == qid).collect()
        }
        assert got == single, qid

    top1 = bm25_batch(docs, qs, top_k=1).collect()
    assert len(top1) == 2
    for r in top1:
        full = sorted(
            ((x.score_nano, -x.doc_id), x.doc_id)
            for x in batch.filter(F.col("query_id") == r.query_id).collect()
        )
        assert r.doc_id == full[-1][1]

    import pytest as _pt

    with _pt.raises(ValueError):
        bm25_batch(docs, {})
    with _pt.raises(ValueError):
        bm25_batch(docs, {"a": []})


def test_bucketed_cosine_pairs_backends_agree(spark):
    """bucketed_cosine_pairs: expr and arrow backends return the
    identical pair set on clear-margin data; empty input yields an
    empty typed frame; symmetric by construction (a < b)."""
    import random

    rng = random.Random(23)
    rows = []
    for _ in range(25):
        c = [rng.uniform(-1, 1) for _ in range(8)]
        for _ in range(rng.randint(1, 4)):
            rows.append(
                (len(rows), [x + rng.uniform(-0.02, 0.02) for x in c])
            )
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    a = sorted(
        (r.a, r.b)
        for r in sim.bucketed_cosine_pairs(df, eps=0.95, bits=4).collect()
    )
    b = sorted(
        (r.a, r.b)
        for r in sim.bucketed_cosine_pairs(
            df, eps=0.95, bits=4, backend="arrow"
        ).collect()
    )
    assert a == b and a  # non-trivial pair set
    assert all(x < y for x, y in a)

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert sim.bucketed_cosine_pairs(empty, eps=0.5).count() == 0


def test_arrow_backend_salted_blocks_exact(spark):
    """Round-6 scale-safe defaults: the Arrow gemm backend must go
    through the SAME mega-cell block decomposition as the expression
    fold (a mega-cell is never one Arrow straggler task) and still
    return the identical result — pairs (semantic_dedup) AND
    per-anchor argmax positives (contrastive_pairs) are invariant to
    the block split on clear-margin data."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(90):  # one near-identical mega-cluster
        rows.append(
            (i, [1.0 + rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05)])
        )
    for i in range(90, 120):
        rows.append((i, [rng.uniform(-1, 1), rng.uniform(-1, 1)]))
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    cents = sim.ivf_centroids(df, 4)

    base = sorted(
        sim.semantic_dedup(
            df, eps=0.99, centroids=cents, pair_backend="arrow",
            max_cell_rows=1 << 30,
        ).collect()
    )
    salted = sorted(
        sim.semantic_dedup(
            df, eps=0.99, centroids=cents, pair_backend="arrow",
            max_cell_rows=16, max_salt=8,
        ).collect()
    )
    assert salted == base
    assert sum(r.keep for r in salted) < len(rows)

    cp = lambda **kw: sorted(
        map(
            tuple,
            sim.contrastive_pairs(
                df, centroids=cents, backend="arrow", **kw
            ).collect(),
        )
    )
    assert cp(max_cell_rows=16, max_salt=8) == cp(max_cell_rows=1 << 30)


def test_arrow_salted_raw_pair_set_sparse_graph(spark):
    """ADVICE r6 (high): off-diagonal salt blocks pair DISJOINT
    sub-groups, so each unordered cross pair is scored exactly once —
    an ``la < lb`` mask there silently drops every cross pair whose
    A-side id is the larger one (~half). The earlier guards compared
    post-connected-components output, where a near-clique hides
    missing edges; this test pins the RAW pair set, salted vs
    unsalted, expr vs arrow, on a SPARSE pair graph where each
    dropped edge changes the result."""
    import random

    rng = random.Random(97)
    rows = []
    # 160 vectors drifting along a circle: each is similar only to a
    # handful of angular neighbours -> sparse chain-like pair graph,
    # ids interleaved across salt sub-groups in both orders.
    import math

    for i in range(160):
        t = i * 0.045 + rng.uniform(-0.004, 0.004)
        rows.append((i, [math.cos(t), math.sin(t)]))
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")

    def pairs(backend, **kw):
        return sorted(
            (r.a, r.b)
            for r in sim.bucketed_cosine_pairs(
                df, eps=0.995, bits=2, backend=backend, **kw
            ).collect()
        )

    base = pairs("expr", max_cell_rows=1 << 30)
    assert len(base) > 100  # sparse but non-trivial
    n = len({a for a, _ in base} | {b for _, b in base})
    assert len(base) < n * (n - 1) // 4  # nowhere near a clique
    assert pairs("expr", max_cell_rows=8, max_salt=16) == base
    assert pairs("arrow", max_cell_rows=1 << 30) == base
    # the regression case: arrow + salt (off-diagonal blocks active)
    assert pairs("arrow", max_cell_rows=8, max_salt=16) == base
    assert all(a < b for a, b in base)


def test_auto_backend_resolution_and_id_validation(spark):
    """backend='auto' picks expr under the cell-size threshold and
    arrow above it (results identical either way on clear margins);
    explicit arrow with a non-integral id raises a clear ValueError
    while auto silently stays on the expr fold."""
    import random

    rng = random.Random(29)
    rows = [
        (i, [1.0 + rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02)])
        for i in range(40)
    ]
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    lo = sorted(
        sim.semantic_dedup(
            df, eps=0.999, centroids=cents, arrow_cell_threshold=10 ** 6
        ).collect()
    )
    hi = sorted(
        sim.semantic_dedup(
            df, eps=0.999, centroids=cents, arrow_cell_threshold=2
        ).collect()
    )
    assert lo == hi and sum(r.keep for r in lo) < len(rows)

    sdf = df.select(
        F.concat(F.lit("id-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="integral id"):
        sim.semantic_dedup(
            sdf, centroids=cents, pair_backend="arrow"
        ).collect()
    with pytest.raises(ValueError, match="integral id"):
        sim.bucketed_cosine_pairs(
            sdf, eps=0.5, bits=2, backend="arrow"
        ).collect()
    with pytest.raises(ValueError, match="integral id"):
        sim.contrastive_pairs(sdf, centroids=cents, backend="arrow").collect()
    # auto with string ids: resolves to expr, runs fine
    assert sim.semantic_dedup(
        sdf, centroids=cents, arrow_cell_threshold=2
    ).count() == len(rows)


def test_bucketed_cosine_pairs_null_first_vector(spark):
    """A NULL vector in the first row must not break dimensionality
    inference (dim comes from the first NON-NULL vector); NULL-vector
    rows simply never pair. All-NULL input returns an empty typed
    pair set instead of raising."""
    rows = [(0, None), (1, [1.0, 0.0]), (2, [1.0, 0.001])]
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    got = sorted(
        (r.a, r.b)
        for r in sim.bucketed_cosine_pairs(df, eps=0.99, bits=2).collect()
    )
    assert got == [(1, 2)]
    allnull = generate_input(
        spark, [(0, None), (1, None)], "vec_id bigint, embedding array<double>"
    )
    assert sim.bucketed_cosine_pairs(allnull, eps=0.5).count() == 0


def _hand_png(filters=(0, 1, 2, 3, 4)):
    """Hand-construct a 4x5 RGB PNG whose five scanlines use the five
    filter types — built with struct/zlib directly (independent of
    encode_png) — plus the expected pixel array."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = len(filters), 4, 3
    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    scan = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in enumerate(filters):
        row = pixels[y].reshape(-1).astype(np.int32)
        out = []
        for i in range(w * ch):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = row[i] - a
            elif f == 2:
                v = row[i] - b
            elif f == 3:
                v = row[i] - ((a + b) >> 1)
            else:
                v = row[i] - paeth(a, b, c)
            out.append(int(v) & 0xFF)
        scan += bytes([f]) + bytes(out)
        prev = row

    def chunk(t, body):
        return (
            struct.pack(">I", len(body)) + t + body
            + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF)
        )

    raw = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    return raw, pixels


def test_decode_image_png_all_filters():
    """The zero-dependency PNG decoder reconstructs exact pixels
    through all five scanline filters (hand-built stream, not our
    encoder), and encode_png round-trips."""
    import numpy as np

    raw, pixels = _hand_png()
    d = mm.decode_image(raw)
    assert (d["width"], d["height"], d["channels"], d["mode"]) == (4, 5, 3, "RGB")
    assert np.array_equal(d["pixels"], pixels)
    # roundtrip through our own encoder
    rt = mm.decode_image(mm.encode_png(pixels))
    assert np.array_equal(rt["pixels"], pixels)
    # grayscale roundtrip
    g = pixels[:, :, 0]
    assert np.array_equal(
        mm.decode_image(mm.encode_png(g))["pixels"][:, :, 0], g
    )


def test_png_adam7_interlace():
    """Adam7 decode (round 10): the pass table matches the PNG
    spec's canonical 8×8 pass diagram; interlaced and sequential
    encodings of the same pixels decode identically across shapes
    (incl. dims smaller than one pass block) and channel counts;
    Paeth/Up filters survive per-pass unfiltering (hand-filtered
    pass); truncated interlaced IDAT quarantines; unknown interlace
    methods quarantine by name."""
    import struct
    import zlib

    import numpy as np

    from datasplash_spark.functions.multimodal import _ADAM7

    grid = np.zeros((8, 8), dtype=int)
    for p, (rs, cs, rstep, cstep) in enumerate(_ADAM7, 1):
        grid[rs::rstep, cs::cstep] = p
    assert grid.tolist() == [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]

    rng = np.random.RandomState(11)
    for shape in [(1, 1), (3, 5), (8, 8), (13, 17), (7, 1), (1, 9)]:
        for ch in (None, 3, 4):
            img = rng.randint(
                0, 256, shape + ((ch,) if ch else ())
            ).astype(np.uint8)
            il = mm.decode_image(mm.encode_png(img, interlace=True))
            seq = mm.decode_image(mm.encode_png(img))
            assert np.array_equal(il["pixels"], seq["pixels"]), (shape, ch)

    # non-zero filters inside a pass: take the filter-0 interlaced
    # stream and re-filter every scanline as Up (2) — decode must
    # invert it back to the identical pixels
    img = rng.randint(0, 256, (10, 10, 3)).astype(np.uint8)
    raw = mm.encode_png(img, interlace=True)
    i = raw.index(b"IDAT")
    ln = struct.unpack(">I", raw[i - 4 : i])[0]
    body = bytearray(zlib.decompress(raw[i + 4 : i + 4 + ln]))
    pos = 0
    for rs, cs, rstep, cstep in _ADAM7:
        pw = (10 - cs + cstep - 1) // cstep
        ph = (10 - rs + rstep - 1) // rstep
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * 3
        prev = bytes(stride)
        for _y in range(ph):
            row = bytes(body[pos + 1 : pos + 1 + stride])
            body[pos] = 2  # Up
            body[pos + 1 : pos + 1 + stride] = bytes(
                (row[j] - prev[j]) & 0xFF for j in range(stride)
            )
            prev = row
            pos += 1 + stride
    refiltered = zlib.compress(bytes(body))
    raw2 = (
        raw[: i - 4]
        + struct.pack(">I", len(refiltered))
        + b"IDAT"
        + refiltered
        + struct.pack(
            ">I", zlib.crc32(b"IDAT" + refiltered) & 0xFFFFFFFF
        )
        + raw[i + 8 + ln :]
    )
    assert np.array_equal(mm.decode_image(raw2)["pixels"], img)

    # truncated interlaced IDAT quarantines
    short = zlib.compress(zlib.decompress(raw[i + 4 : i + 4 + ln])[:-5])
    bad = (
        raw[: i - 4]
        + struct.pack(">I", len(short))
        + b"IDAT"
        + short
        + struct.pack(">I", zlib.crc32(b"IDAT" + short) & 0xFFFFFFFF)
        + raw[i + 8 + ln :]
    )
    with pytest.raises(ValueError, match="IDAT length"):
        mm.decode_image(bad)
    # unknown interlace method quarantines by name
    hdr = bytearray(mm.encode_png(img))
    j = hdr.index(b"IHDR") + 4 + 12
    hdr[j] = 2
    with pytest.raises(ValueError, match="interlace"):
        mm.decode_image(bytes(hdr))


def test_decode_image_pnm_and_errors():
    import numpy as np

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    p6 = b"P6\n# comment\n4 2\n255\n" + px.tobytes()
    d = mm.decode_image(p6)
    assert (d["width"], d["height"], d["mode"]) == (4, 2, "RGB")
    assert np.array_equal(d["pixels"], px)
    p5 = b"P5 3 2 255 " + bytes(range(6))
    d5 = mm.decode_image(p5)
    assert (d5["width"], d5["height"], d5["channels"]) == (3, 2, 1)
    # 16-bit P5: big-endian samples down-convert to the high byte
    d16 = mm.decode_image(
        b"P5 2 1 65535 " + bytes([0xAB, 0xCD, 0x01, 0x02])
    )
    assert d16["bit_depth"] == 16
    assert list(d16["pixels"].reshape(-1)) == [0xAB, 0x01]
    with pytest.raises(ValueError, match="out of spec"):
        mm.decode_image(b"P5 1 1 70000 \x00\x00")
    with pytest.raises(ValueError, match="bit depth"):
        import struct as _s
        import zlib as _z

        body = _s.pack(">IIBBBBB", 1, 1, 3, 2, 0, 0, 0)
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _s.pack(">I", len(body)) + b"IHDR" + body
            + _s.pack(">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF)
        )
        mm.decode_image(bad)


def _png_chunk(t, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + t + body
        + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF)
    )


def test_decode_image_png_palette():
    """Round-7: palette PNGs (color type 3) decode — PLTE lookup,
    tRNS -> RGBA, 8-bit and 4-bit (sub-byte) indices, filter
    coverage on the index rows. Hand-built streams."""
    import struct
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    # index rows [0,1,2] then [1,2,3]; row 2 uses the Up filter
    scan = bytes([0, 0, 1, 2]) + bytes([2, 1, 1, 1])
    raw = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"tRNS", bytes([128]))
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    d = mm.decode_image(raw)
    assert (d["mode"], d["channels"], d["bit_depth"]) == ("RGBA", 4, 8)
    exp = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
            [[0, 255, 0], [0, 0, 255], [10, 20, 30]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(d["pixels"][..., :3], exp)
    # tRNS covers index 0 only; the rest default opaque
    assert list(d["pixels"][..., 3].reshape(-1)) == [128, 255, 255, 255, 255, 255]

    # 4-bit indices: width 5 packs into ceil(5*4/8)=3 bytes, big-
    # endian bit order, pad bits ignored; no tRNS -> RGB
    scan4 = bytes([0, 0x01, 0x23, 0x10])  # indices 0,1,2,3,1
    raw4 = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 1, 4, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(scan4))
        + _png_chunk(b"IEND", b"")
    )
    d4 = mm.decode_image(raw4)
    assert (d4["mode"], d4["channels"], d4["bit_depth"]) == ("RGB", 3, 4)
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(d4["pixels"][0], lut[[0, 1, 2, 3, 1]])

    # palette stream without a PLTE chunk must raise, not crash
    rawbad = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes([0, 0, 1, 2])))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_image(rawbad)


def test_decode_image_png_16bit_and_subbyte_gray():
    """Round-7: 16-bit PNGs down-convert to the high byte (filters
    run byte-wise with bpp=6 for RGB16); 1-bit grayscale unpacks and
    scales to full range."""
    import struct
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"
    # 2x1 RGB16, Sub filter: second pixel stored as delta at offset 6
    row = bytes([1, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06] + [0xF0] * 6)
    raw = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(row))
        + _png_chunk(b"IEND", b"")
    )
    d = mm.decode_image(raw)
    assert (d["mode"], d["channels"], d["bit_depth"]) == ("RGB", 3, 16)
    assert np.array_equal(
        d["pixels"][0], np.array([[0x01, 0x03, 0x05], [0xF1, 0xF3, 0xF5]])
    )

    # 1-bit gray, 10 px wide -> 2-byte stride, alternating rows
    scan = bytes([0, 0xAA, 0x80]) + bytes([0, 0x55, 0x40])
    raw1 = (
        sig
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    d1 = mm.decode_image(raw1)
    assert (d1["mode"], d1["channels"], d1["bit_depth"]) == ("L", 1, 1)
    flat = list(d1["pixels"].reshape(-1))
    assert flat[:10] == [255, 0] * 5 and flat[10:] == [0, 255] * 5


def test_resize_nearest_and_default_kernel(spark):
    """resize_nearest downsamples by pixel-center sampling; the
    DEFAULT resize_images kernel now really decodes -> resizes ->
    re-encodes PNG through Arrow batches (round-6 unstub)."""
    import numpy as np

    raw, pixels = _hand_png()
    small = mm.resize_nearest(pixels, 2, 2)
    assert small.shape == (2, 2, 3)
    # pixel-center sampling: rows 5->2 pick y=1,3; cols 4->2 pick x=1,3
    assert np.array_equal(small, pixels[[1, 3]][:, [1, 3]])

    df = generate_input(
        spark, [(1, raw), (2, raw)], "doc_id bigint, media binary"
    )
    out = {
        r.doc_id: bytes(r.media)
        for r in mm.resize_images(df, 2, 2).collect()
    }
    d = mm.decode_image(out[1])
    assert (d["width"], d["height"]) == (2, 2)
    assert np.array_equal(d["pixels"], small)


def test_image_features_stage(spark):
    """image_features: real decoded dims per row; poison rows yield
    ok=false + err instead of failing the stage."""
    raw, _ = _hand_png()
    import numpy as np

    p6 = b"P6 4 2 255 " + bytes(range(24))
    df = generate_input(
        spark,
        [(1, raw), (2, p6), (3, b"JUNK****"), (4, None)],
        "doc_id bigint, media binary",
    )
    got = {r.doc_id: r for r in mm.image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mode, got[1].ok) == (4, 5, "RGB", True)
    assert (got[2].width, got[2].height, got[2].channels) == (4, 2, 3)
    assert got[3].ok is False and "unrecognized" in got[3].err
    assert got[4].ok is False and got[4].n_bytes == 0


def test_winnow_fingerprints_locality_guarantee(spark):
    """Winnowing property (Schleimer et al. 2003): two documents
    sharing a run of >= w+k-1 tokens MUST share at least one
    fingerprint; disjoint-vocabulary docs share none. Also pins the
    pure-Python reference construction."""
    import hashlib

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = w+k-1
    d1 = "one two " + shared + " x1 y1"
    d2 = "uno dos tres " + shared + " z9"
    d3 = "completely different words entirely here now friend"
    df = generate_input(
        spark, [(1, d1), (2, d2), (3, d3)], "doc_id bigint, text string"
    )
    got: dict[int, set] = {}
    for r in dd.winnow_fingerprints(df, k=4, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    assert got[1] & got[2]          # locality guarantee
    assert not (got[1] & got[3])    # disjoint vocab -> no sharing

    def py_winnow(text, k=4, w=4):
        toks = [t for t in text.lower().split(" ") if t]
        n = len(toks)
        grams = [
            " ".join(toks[i : i + k])
            for i in range(max(n - k + 1, 1))
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % (1 << 31)
            for g in grams
        ]
        return {
            min(hs[i : i + w]) for i in range(max(len(hs) - w + 1, 1))
        }

    for doc_id, text in ((1, d1), (2, d2), (3, d3)):
        assert got[doc_id] == py_winnow(text), doc_id


def test_bpe_pair_counts_matches_reference(spark):
    """bpe_pair_counts equals a direct pure-Python count of adjacent
    char pairs within tokens, weighted by token frequency; the argmax
    is the next BPE merge."""
    from collections import Counter

    rows = [(1, "low lower lowest low"), (2, "low newer newest")]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    expect: Counter = Counter()
    for _, t in rows:
        for tok in t.lower().split(" "):
            for i in range(len(tok) - 1):
                expect[tok[i : i + 2]] += 1
    got = {r.pair: r.n for r in tx.bpe_pair_counts(df, min_count=1).collect()}
    assert got == dict(expect)
    assert max(got, key=lambda p: (got[p], p)) in ("lo", "ow")  # 'lo'/'ow' tie at 4
    top = tx.bpe_pair_counts(df, min_count=4).collect()
    assert {r.pair for r in top} == {"lo", "ow", "we"}


def test_source_drift_semantics(spark):
    """source_drift: a source distributed like the corpus scores ~0;
    a divergent source scores strictly higher; values match a direct
    pure-Python fixed-point computation."""
    import hashlib

    rows = (
        [(i, "aa bb cc dd", "s1") for i in range(6)]
        + [(10 + i, "aa bb cc dd", "s2") for i in range(3)]
        + [(20 + i, "zz zz qq rr ss tt", "s3") for i in range(3)]
    )
    df = generate_input(
        spark, rows, "doc_id bigint, text string, source string"
    )
    got = {r.source: (r.chi2_pico, r.l1_pico) for r in tx.source_drift(df, n_buckets=16).collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 16

    from collections import Counter

    sb: dict[str, Counter] = {}
    for _, t, s in rows:
        for tok in t.lower().split(" "):
            sb.setdefault(s, Counter())[bucket(tok)] += 1
    corpus: Counter = Counter()
    for c in sb.values():
        corpus += c
    n = sum(corpus.values())
    for s, cnt in sb.items():
        ns = sum(cnt.values())
        chi = l1 = 0
        for b, cb in corpus.items():
            ps = cnt.get(b, 0) / ns
            pc = cb / n
            d = ps - pc
            chi += round(d * d / pc * 1e12)
            l1 += round(abs(d) * 1e12)
        assert got[s] == (chi, l1), s
    # s1/s2 share the corpus-dominant distribution; s3 diverges
    assert got["s3"][0] > got["s1"][0]
    assert got["s3"][1] > got["s1"][1]


def test_bpe_learn_and_apply_match_reference(spark):
    """bpe_learn reproduces the reference Python BPE (count desc,
    pair asc tie-break; leftmost-greedy merges), and bpe_apply
    segments exactly as the reference applier — including chained
    multi-char merges."""
    corpus = ["low lower lowest", "new newer newest", "low low newer"]
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = generate_input(spark, rows, "doc_id bigint, text string")

    from collections import Counter

    vocab = Counter()
    for t in corpus:
        vocab.update(x for x in t.split(" ") if x)
    syms = {tok: list(tok) for tok in vocab}

    def learn(n):
        out = []
        for _ in range(n):
            pc = Counter()
            for tok, c in vocab.items():
                s = syms[tok]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += c
            if not pc:
                break
            (a, b), cnt = sorted(
                pc.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
            if cnt < 2:
                break
            out.append((a, b))
            for tok in syms:
                s, new = syms[tok], []
                for x in s:
                    if new and new[-1] == a and x == b:
                        new[-1] = a + b
                    else:
                        new.append(x)
                syms[tok] = new
        return out

    expect_merges = learn(6)
    got_merges = tx.bpe_learn(df, n_merges=6, min_count=2)
    assert got_merges == expect_merges

    def apply_ref(text, merges):
        out = []
        for tok in text.lower().split(" "):
            if not tok:
                continue
            s = list(tok)
            for a, b in merges:
                new = []
                for x in s:
                    if new and new[-1] == a and x == b:
                        new[-1] = a + b
                    else:
                        new.append(x)
                s = new
            out.extend(s)
        return out

    seg = {
        r.doc_id: list(r.subwords)
        for r in tx.bpe_apply(df, got_merges).collect()
    }
    for i, t in rows:
        assert seg[i] == apply_ref(t, got_merges), i
    # leftmost-greedy pin: merge (a,a) on 'aaa' -> ['aa', 'a']
    tri = generate_input(spark, [(1, "aaa")], "doc_id bigint, text string")
    got = tx.bpe_apply(tri, [("a", "a")]).collect()[0].subwords
    assert list(got) == ["aa", "a"]


def test_pagerank_integer_fixed_point(spark):
    """pagerank matches a pure-Python integer fixed-point reference
    on an asymmetric graph (hub ranks above leaves), and is
    partition-count invariant (order-independent integer sums)."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (5, 1)]
    df = generate_input(spark, edges, "a bigint, b bigint")
    from datasplash_spark.functions.graph import pagerank

    got = {
        r.node: r.score_nano for r in pagerank(df, iterations=5).collect()
    }

    import math

    e = set()
    for a, b in edges:
        e.add((a, b))
        e.add((b, a))
    nodes = sorted({x for p in e for x in p})
    deg = {n: sum(1 for s, _ in e if s == n) for n in nodes}
    score = {n: 10 ** 9 for n in nodes}
    for _ in range(5):
        inn = {n: 0 for n in nodes}
        for s, d in e:
            inn[d] += math.floor(
                math.floor(score[s] / deg[s]) * 85 / 100
            )
        score = {n: 150_000_000 + inn[n] for n in nodes}
    assert got == score
    # hub 1 outranks leaf 4
    assert got[1] > got[4]
    repart = {
        r.node: r.score_nano
        for r in pagerank(df.repartition(7), iterations=5).collect()
    }
    assert repart == got


def test_event_path_ngrams_order_and_guard(spark):
    """Paths follow (ts, event_id) order; users with < n events
    contribute nothing; counts aggregate across users."""
    rows = [
        (1, 100, 10, "view"),
        (2, 100, 20, "cart"),
        (3, 100, 30, "buy"),
        (4, 200, 10, "view"),
        (5, 200, 20, "cart"),
        (6, 200, 30, "buy"),
        (7, 300, 10, "view"),  # only one event
        (8, 400, 10, "cart"),
        (9, 400, 10, "view"),  # same ts: event_id 8 < 9 -> cart first
        (10, 400, 20, "buy"),
    ]
    df = generate_input(
        spark,
        [(e, u, float(t), ty) for e, u, t, ty in rows],
        "event_id bigint, user_id bigint, tsec double, event_type string",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("tsec").alias("ts"),
        "event_type",
    )
    from datasplash_spark.functions.events import event_path_ngrams

    got = {
        r.path: r.walks
        for r in event_path_ngrams(df, n=3, min_count=1).collect()
    }
    assert got == {"view>cart>buy": 2, "cart>view>buy": 1}


def test_quantize_embeddings_and_topk(spark):
    """int8 quantization: codes bounded to [-127,127], scale
    reconstructs within quantization error; quantized top-k ranks
    clear-margin neighbors identically to exact cosine; zero vectors
    quantize to all-zero codes with scale 0."""
    import math
    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(8)]) for i in range(40)
    ]
    rows.append((40, [0.0] * 8))
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    qt = {r.vec_id: r for r in sim.quantize_embeddings(df).collect()}
    for i, v in rows:
        codes = list(qt[i].codes)
        assert max(abs(c) for c in codes) <= 127
        if any(v):
            s = max(abs(x) for x in v) / 127.0
            for c, x in zip(codes, v):
                assert abs(c * s - x) <= s / 2 + 1e-12
        else:
            assert codes == [0] * 8 and qt[i].scale == 0.0

    # exact top-5 (excluding the zero vector) vs quantized top-5
    q = rows[0][1]

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    exact = sorted(
        ((cos(v, q), i) for i, v in rows), key=lambda t: (-t[0], t[1])
    )[:5]
    got = sim.quantized_topk(
        sim.quantize_embeddings(df), list(qt[0].codes), k=5
    ).collect()
    assert [r.vec_id for r in got] == [i for _, i in exact]
    # ADVICE r6: a dimension-mismatched query must raise, not
    # NULL-pad the dot and silently sort last
    with pytest.raises(ValueError, match="code dimension"):
        sim.quantized_topk(sim.quantize_embeddings(df), [1, 2, 3], k=5)


def test_edit_distance_verify(spark):
    """edit_distance_verify keeps candidate pairs within the ratio
    and reports exact Levenshtein distances."""
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumped"),   # dist 2, ratio 2/26
        (3, "a completely different doc"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    pairs = generate_input(spark, [(1, 2), (1, 3)], "a bigint, b bigint")
    got = {
        (r.a, r.b): (r.dist, r.dist_ratio)
        for r in sim.edit_distance_verify(df, pairs, 0.2).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)][0] == 2
    loose = sim.edit_distance_verify(df, pairs, 1.0).collect()
    assert len(loose) == 2
    # length prefilter exactness (round 7): a pair sitting exactly ON
    # the bound where dist == length gap must survive (the prefilter
    # rounds identically to the final ratio), and a pair whose
    # length gap alone exceeds the bound is dropped without DP —
    # same result set as the unfiltered form
    edge = generate_input(
        spark,
        [(10, "aaaaaaaaaa"), (11, "aaaaaaaa"), (12, "aa")],
        "doc_id bigint, text string",
    )
    ep = generate_input(spark, [(10, 11), (10, 12)], "a bigint, b bigint")
    kept = {
        (r.a, r.b): r.dist
        for r in sim.edit_distance_verify(edge, ep, 0.2).collect()
    }
    # (10,11): gap 2/10 = 0.2 == bound, dist 2 -> kept
    # (10,12): gap 8/10 = 0.8 > bound -> prefiltered
    assert kept == {(10, 11): 2}


def test_mad_outliers(spark):
    """MAD outlier filter: a planted extreme value is flagged/removed;
    a constant column flags nothing (MAD=0 guard); matches the direct
    modified-z computation."""
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 12.5, 500.0]
    df = generate_input(
        spark, [(i, v) for i, v in enumerate(vals)], "id bigint, x double"
    )
    flagged = {
        r.id: r.out
        for r in ops.mad_outliers(df, "x", flag_name="out").collect()
    }
    assert flagged[7] == 1 and sum(flagged.values()) == 1
    kept = ops.mad_outliers(df, "x").count()
    assert kept == 7
    const = generate_input(
        spark, [(i, 5.0) for i in range(6)], "id bigint, x double"
    )
    assert ops.mad_outliers(const, "x").count() == 6


def test_round6_ops_empty_input(spark):
    """Empty-corpus hardening for the round-6 operators: every op
    returns an empty, correctly-typed result instead of raising."""
    docs = spark.createDataFrame([], "doc_id bigint, text string, source string")
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    edges = spark.createDataFrame([], "a bigint, b bigint")
    ev = spark.createDataFrame(
        [], "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    from datasplash_spark.functions.events import event_path_ngrams
    from datasplash_spark.functions.graph import pagerank

    assert dd.winnow_fingerprints(docs).count() == 0
    assert tx.bpe_pair_counts(docs).count() == 0
    assert tx.bpe_learn(docs, n_merges=3) == []
    assert tx.bpe_apply(docs, [("a", "b")]).count() == 0
    assert tx.source_drift(docs).count() == 0
    assert tx.bigram_doc_scores(docs).count() == 0
    assert tx.bigram_counts(docs).count() == 0
    assert dd.content_manifest(docs, F.lit(0)).count() == 0
    assert pagerank(edges).count() == 0
    assert event_path_ngrams(ev).count() == 0
    assert sim.quantize_embeddings(emb).count() == 0
    assert sim.quantized_topk(
        sim.quantize_embeddings(emb), [1, 2], k=3
    ).count() == 0
    assert ops.mad_outliers(docs, "doc_id").count() == 0
    assert sim.edit_distance_verify(docs, edges, 0.5).count() == 0


def test_quantized_ivf_store_probe(spark, tmp_path):
    """materialize_ivf(quantize=True): the store holds int8 codes +
    scale (no float vectors), probes auto-detect the layout, prune
    partitions, and rank clear-margin neighbors identically to the
    float store."""
    import random

    rng = random.Random(31)
    rows = []
    for c in range(4):
        base = [0.0] * 8
        base[c * 2] = 1.0
        for i in range(12):
            rows.append(
                (c * 100 + i,
                 [x + rng.uniform(-0.05, 0.05) for x in base])
            )
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    fstore = str(tmp_path / "fivf")
    qstore = str(tmp_path / "qivf")
    cents = sim.materialize_ivf(df, fstore, n_cells=4)
    sim.materialize_ivf(df, qstore, n_cells=4, centroids=cents, quantize=True)

    cols = spark.read.parquet(qstore).columns
    assert "codes" in cols and "embedding" not in cols

    qv = rows[0][1]
    fl = [r.vec_id for r in sim.ivf_topk_from_store(
        spark, fstore, qv, k=5, nprobe=2, centroids=cents).collect()]
    qz = [r.vec_id for r in sim.ivf_topk_from_store(
        spark, qstore, qv, k=5, nprobe=2, centroids=cents).collect()]
    assert fl == qz

    # partition pruning survives the quantized layout
    probe = sim.ivf_topk_from_store(
        spark, qstore, qv, k=5, nprobe=2, centroids=cents
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    part = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part and "cell" in part[0], plan


def test_remove_boilerplate_lines_corpus_frequency(spark):
    # "nav" appears in 3 docs (>= min_docs=3) -> removed everywhere;
    # "rare" appears in 2 docs -> kept; empty lines are structural
    # and survive even though they'd trivially cross the threshold.
    rows = [
        (1, "nav\nalpha\n\nrare"),
        (2, "nav\nbeta\n\nrare"),
        (3, "nav\ngamma\n"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in dd.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert out[1].clean_text == "alpha\n\nrare"
    assert out[1].n_lines_in == 4 and out[1].n_lines_out == 3
    assert out[2].clean_text == "beta\n\nrare"
    assert out[3].clean_text == "gamma\n"
    assert out[3].n_lines_in == 3 and out[3].n_lines_out == 2


def test_remove_boilerplate_lines_strategies_agree(spark):
    rows = [
        (i, f"common header\nbody {i % 4}\nunique {i}\n") for i in range(12)
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    a = sorted(
        dd.remove_boilerplate_lines(df, min_docs=3, strategy="join").collect()
    )
    b = sorted(
        dd.remove_boilerplate_lines(
            df, min_docs=3, strategy="broadcast"
        ).collect()
    )
    assert a == b
    # "common header" (12 docs) and "body {0..3}" (3 docs each) gone:
    assert a[5].clean_text == "unique 5\n"


def test_remove_boilerplate_lines_validation(spark):
    df = generate_input(spark, [(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="min_docs"):
        dd.remove_boilerplate_lines(df, min_docs=1)
    with pytest.raises(ValueError, match="strategy"):
        dd.remove_boilerplate_lines(df, strategy="nope")


def test_subword_stats_manual(spark):
    # merges [(a,b)]: "ab"->[ab] (1), "cd"->[c,d] (2), "a"->[a] (1)
    df = generate_input(
        spark,
        [(1, "ab cd a"), (2, "")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r for r in tx.subword_stats(df, [("a", "b")]).collect()
    }
    assert out[1].n_tok == 3 and out[1].n_sub == 4
    assert out[1].n_single == 2
    assert out[1].fertility_micro == 4 * 1_000_000 // 3
    assert out[2].n_tok == 0 and out[2].n_sub == 0
    assert out[2].fertility_micro == 0


def test_conversation_stats_diagnostics(spark):
    from datasplash_spark.functions import chat as ch

    rows = [
        # clean exchange
        (1, '[{"role":"user","content":"hi"},'
            '{"role":"assistant","content":"hello"}]'),
        # leading system turn: still valid
        (2, '[{"role":"system","content":"s"},'
            '{"role":"user","content":"q"},'
            '{"role":"assistant","content":"a"}]'),
        # system in the middle: sys_ok false
        (3, '[{"role":"user","content":"q"},'
            '{"role":"system","content":"s"},'
            '{"role":"assistant","content":"a"}]'),
        # double user: alt_ok false
        (4, '[{"role":"user","content":"q"},'
            '{"role":"user","content":"q2"},'
            '{"role":"assistant","content":"a"}]'),
        # empty content: no_empty false
        (5, '[{"role":"user","content":""},'
            '{"role":"assistant","content":"a"}]'),
        # ends on user: ends_assistant false
        (6, '[{"role":"user","content":"q"},'
            '{"role":"assistant","content":"a"},'
            '{"role":"user","content":"q2"}]'),
        # unknown role: alt_ok false
        (7, '[{"role":"tool","content":"x"},'
            '{"role":"assistant","content":"a"}]'),
        # malformed JSON: everything false/zero
        (8, '[{"role":"user"'),
    ]
    df = generate_input(spark, rows, "doc_id bigint, conv_json string")
    out = {r.doc_id: r for r in ch.conversation_stats(df).collect()}
    assert out[1].valid and out[1].n_turns == 2
    assert out[1].content_chars == len("hi") + len("hello")
    assert out[2].valid and out[2].n_system == 1
    assert not out[3].sys_ok and not out[3].valid
    assert not out[4].alt_ok and out[4].no_empty
    assert not out[5].no_empty and out[5].alt_ok
    assert not out[6].ends_assistant and out[6].alt_ok
    assert not out[7].alt_ok
    assert not out[8].parse_ok and out[8].n_turns == 0
    assert not out[8].valid and out[8].content_chars == 0


def test_flatten_turns_order_and_malformed(spark):
    from datasplash_spark.functions import chat as ch

    rows = [
        (1, '[{"role":"user","content":"q"},'
            '{"role":"assistant","content":"a"}]'),
        (2, "not json"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, conv_json string")
    out = sorted(
        ch.flatten_turns(df).collect(), key=lambda r: (r.doc_id, r.turn_idx)
    )
    assert [(r.doc_id, r.turn_idx, r.role, r.content) for r in out] == [
        (1, 0, "user", "q"),
        (1, 1, "assistant", "a"),
    ]


def test_normalize_url_canonicalization(spark):
    from datasplash_spark.functions import web as wb

    rows = [
        (1, "HTTPS://WWW.Ex.COM/A/b?utm_source=x&z=9&a=1#frag"),
        (2, "https://www.ex.com/A/b?a=1&z=9"),
        (3, "http://ex.com/plain"),
        (4, "https://ex.com/p?fbclid=abc"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, url string")
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", wb.normalize_url("url").alias("n")
        ).collect()
    }
    # tracking stripped, fragment dropped, params sorted, host lowered:
    assert out[1] == "https://www.ex.com/A/b?a=1&z=9"
    assert out[1] == out[2]  # param order never splits a dup group
    assert out[3] == "http://ex.com/plain"
    assert out[4] == "https://ex.com/p"  # all params were tracking


def test_url_filter_reasons(spark):
    from datasplash_spark.functions import web as wb

    rows = [
        (1, "https://good.com/article"),
        (2, "https://SPAM.com/article"),
        (3, "https://good.com/casino/win"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, url string")
    out = {
        r.doc_id: (r.keep, r.drop_reason)
        for r in wb.url_filter(
            df, blocked_hosts=["spam.com"], blocked_path_terms=["casino"]
        ).collect()
    }
    assert out[1] == (True, None)
    assert out[2] == (False, "host")  # host match is case-insensitive
    assert out[3] == (False, "path")


def test_bm25_from_store_matches_inline(spark, tmp_path):
    # the store probe must be numerically IDENTICAL to bm25_scores
    # (same expressions, same nano rounding) while scanning only the
    # query terms' buckets
    rows = [
        (i, f"alpha beta gamma doc{i} " + ("alpha " * (i % 4)))
        for i in range(30)
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    path = str(tmp_path / "postings")
    stats = tx.materialize_postings(df, path, n_buckets=8)
    assert stats["n_docs"] == 30 and stats["n_buckets"] == 8
    terms = ["alpha", "doc3", "missing"]
    inline = {
        (r.doc_id, r.n_matched, r.score_nano)
        for r in tx.bm25_scores(df, terms).collect()
    }
    stored = {
        (r.doc_id, r.n_matched, r.score_nano)
        for r in tx.bm25_from_store(spark, path, terms).collect()
    }
    assert inline == stored and len(inline) == 30


def test_bm25_store_probe_prunes_partitions(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    df = generate_input(
        spark,
        [(i, f"w{i} shared") for i in range(20)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "postings")
    tx.materialize_postings(df, path, n_buckets=16)
    probe = tx.bm25_from_store(spark, path, ["shared"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain(True)
    plan = buf.getvalue()
    part = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part and "term_bucket" in part[0], plan
    with pytest.raises(ValueError, match="non-empty"):
        tx.bm25_from_store(spark, path, [])


def test_conversation_stats_empty_and_system_only(spark):
    # body-empty shapes must not trip ANSI element_at on the empty
    # array: [] parses fine (0 turns), system-only has no trainable
    # target — both invalid but non-throwing
    from datasplash_spark.functions import chat as ch

    rows = [
        (1, "[]"),
        (2, '[{"role":"system","content":"s"}]'),
    ]
    df = generate_input(spark, rows, "doc_id bigint, conv_json string")
    out = {r.doc_id: r for r in ch.conversation_stats(df).collect()}
    assert out[1].parse_ok and out[1].n_turns == 0
    assert not out[1].ends_assistant and not out[1].valid
    assert out[2].parse_ok and out[2].n_system == 1 and out[2].sys_ok
    assert not out[2].ends_assistant and not out[2].valid


def test_remove_boilerplate_paragraph_granularity(spark):
    # sep="\n\n" switches the unit to paragraphs (C4's dedup unit):
    # the shared footer paragraph vanishes, multi-line paragraphs
    # survive intact
    rows = [
        (1, "intro one\nline two\n\nshared footer"),
        (2, "different body\n\nshared footer"),
        (3, "third doc\n\nshared footer"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in dd.remove_boilerplate_lines(
            df, min_docs=3, sep="\n\n"
        ).collect()
    }
    assert out[1].clean_text == "intro one\nline two"
    assert out[1].n_lines_in == 2 and out[1].n_lines_out == 1
    assert out[2].clean_text == "different body"
    with pytest.raises(ValueError, match="sep"):
        dd.remove_boilerplate_lines(df, sep="")


def test_topic_tags_distinct_term_counts(spark):
    df = generate_input(
        spark,
        [
            (1, "cats cats dogs fish"),
            (2, "stocks bonds"),
            (3, "nothing relevant"),
        ],
        "doc_id bigint, text string",
    )
    topics = {"pets": ["cats", "dogs", "hamster"], "finance": ["stocks"]}
    out = {
        (r.doc_id, r.topic): r.n_terms_hit
        for r in tx.topic_tags(df, topics).collect()
    }
    # distinct terms, not occurrences: "cats cats" counts once
    assert out == {(1, "pets"): 2, (2, "finance"): 1}
    with pytest.raises(ValueError, match="topics"):
        tx.topic_tags(df, {})


def test_compression_ratio_differential_and_signal(spark):
    import zlib

    rows = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "q7#kP!v9@xZ&m2§wL5^rT8*bN1%hJ4"),
        (3, ""),
        (4, None),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in tx.compression_ratio(df).collect()}
    # differential: exact zlib parity, not just monotonicity
    for doc_id, s in rows:
        b = (s or "").encode("utf-8")
        assert out[doc_id].raw_len == len(b)
        assert out[doc_id].comp_len == len(zlib.compress(b, 6))
    # repetition compresses far below gibberish
    assert out[1].ratio_micro < out[2].ratio_micro
    assert out[3].ratio_micro == 0 and out[4].ratio_micro == 0
    with pytest.raises(ValueError, match="level"):
        tx.compression_ratio(df, level=11)


def test_bm25_batch_from_store_matches_inline(spark, tmp_path):
    rows = [
        (i, f"alpha beta gamma doc{i} " + ("beta " * (i % 3)))
        for i in range(25)
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    path = str(tmp_path / "postings")
    tx.materialize_postings(df, path, n_buckets=8)
    qs = {"q1": ["alpha", "doc2"], "q2": ["beta"]}
    inline = {
        (r.query_id, r.doc_id, r.n_matched, r.score_nano)
        for r in tx.bm25_batch(df, qs, top_k=5).collect()
    }
    stored = {
        (r.query_id, r.doc_id, r.n_matched, r.score_nano)
        for r in tx.bm25_batch_from_store(
            spark, path, qs, top_k=5
        ).collect()
    }
    assert inline == stored and len(inline) == 10


def test_url_filter_host_suffixes(spark):
    from datasplash_spark.functions import web as wb

    rows = [
        (1, "https://spam.com/x"),
        (2, "https://a.b.SPAM.com/x"),
        (3, "https://notspam.com/x"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, url string")
    out = {
        r.doc_id: r.keep
        for r in wb.url_filter(
            df, blocked_host_suffixes=["spam.com"]
        ).collect()
    }
    assert out == {1: False, 2: False, 3: True}


def test_embedding_audit_flags(spark):
    rows = [
        (1, [1.0, 2.0]),
        (2, [0.0, 0.0]),
        (3, [float("nan"), 1.0]),
        (4, None),
        (5, [float("inf"), 1.0]),
    ]
    df = generate_input(spark, rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r for r in sim.embedding_audit(df).collect()}
    assert out[1].dim == 2 and not (
        out[1].is_zero or out[1].is_null
    ) and out[1].n_nan == 0
    assert out[2].is_zero and out[2].n_nan == 0
    assert out[3].n_nan == 1 and not out[3].is_zero
    assert out[4].is_null and out[4].dim == 0
    assert out[5].n_inf == 1


def test_chunk_by_sentences_greedy_packing(spark):
    rows = [
        # 3+3+3 tokens, budget 6: [s1 s2][s3]
        (1, "one two three. four five six. seven eight nine."),
        # oversized sentence gets its own chunk, then packing resumes
        (2, "a b c d e f g h. x y."),
        (3, ""),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = sorted(
        tx.chunk_by_sentences(df, 6).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_text, r.n_tok)
        )
    assert by_doc[1] == [
        (0, "one two three. four five six.", 6),
        (1, "seven eight nine.", 3),
    ]
    assert by_doc[2] == [
        (0, "a b c d e f g h.", 8),   # oversized, never cut
        (1, "x y.", 2),
    ]
    assert by_doc[3] == [(0, "", 0)]
    with pytest.raises(ValueError, match="max_tokens"):
        tx.chunk_by_sentences(df, 0)


def test_fk_audit_counts(spark):
    child = generate_input(
        spark,
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 20)],
        "id bigint, fk bigint",
    )
    parent = generate_input(spark, [(10,), (20,), (30,)], "pk bigint")
    r = ops.fk_audit(child, parent, "fk", "pk").collect()[0]
    assert (r.n_child, r.n_null_key, r.n_orphan, r.n_matched) == (5, 1, 1, 3)


def test_chunk_by_sentences_differential_random(spark):
    """Differential check: the Spark greedy fold equals a direct
    pure-Python greedy packer on random corpora across budgets."""
    import random

    def py_chunks(text, budget):
        import re

        sents = re.sub(r"([.!?]) ", lambda m: m.group(1) + "\x1e", text).split(
            "\x1e"
        )
        cnts = [len([t for t in s.split(" ") if t]) for s in sents]
        chunk, acc, ids = 0, 0, []
        for c in cnts:
            if acc + c > budget and acc > 0:
                chunk, acc = chunk + 1, c
            else:
                acc += c
            ids.append(chunk)
        out = []
        for cid in range(ids[-1] + 1):
            mem = [s for s, i in zip(sents, ids) if i == cid]
            tok = sum(c for c, i in zip(cnts, ids) if i == cid)
            out.append((cid, " ".join(mem), tok))
        return out

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for budget in (2, 4, 7):
        rows = []
        for d in range(12):
            n_sents = rng.randint(1, 6)
            sents = [
                " ".join(rng.choices(vocab, k=rng.randint(0, 5)))
                for _ in range(n_sents)
            ]
            rows.append((d, ". ".join(sents) + rng.choice(["", ".", "!"])))
        df = generate_input(spark, rows, "doc_id bigint, text string")
        got = {}
        for r in tx.chunk_by_sentences(df, budget).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_text, r.n_tok)
            )
        for d, text in rows:
            assert sorted(got[d]) == py_chunks(text, budget), (
                budget,
                d,
                text,
            )


def test_remove_boilerplate_differential_random(spark):
    """Differential check: Spark corpus-frequency removal equals a
    pure-Python reference on random corpora from a tiny line
    vocabulary (dense cross-doc collisions)."""
    import random

    def py_clean(docs, min_docs):
        from collections import Counter

        lines_by = {d: t.split("\n") for d, t in docs}
        freq = Counter()
        for lines in lines_by.values():
            for ln in {x for x in lines if x != ""}:
                freq[ln] += 1
        bad = {ln for ln, n in freq.items() if n >= min_docs}
        return {
            d: "\n".join(x for x in lines if x == "" or x not in bad)
            for d, lines in lines_by.items()
        }

    rng = random.Random(11)
    vocab = ["head", "body", "foot", "", "promo"]
    for min_docs in (2, 3):
        rows = [
            (
                d,
                "\n".join(
                    rng.choice(vocab) + (str(d) if rng.random() < 0.3 else "")
                    for _ in range(rng.randint(1, 6))
                ),
            )
            for d in range(10)
        ]
        df = generate_input(spark, rows, "doc_id bigint, text string")
        expect = py_clean(rows, min_docs)
        got = {
            r.doc_id: r.clean_text
            for r in dd.remove_boilerplate_lines(
                df, min_docs=min_docs
            ).collect()
        }
        assert got == expect, (min_docs, rows)


def test_normalize_url_malformed_passthrough(spark):
    # scheme-less inputs must NOT collapse to an empty canonical
    # form (that would merge every malformed URL into one dup group)
    from datasplash_spark.functions import web as wb

    rows = [(1, "example.com/p"), (2, "not a url"), (3, "")]
    df = generate_input(spark, rows, "doc_id bigint, url string")
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", wb.normalize_url("url").alias("n")
        ).collect()
    }
    assert out == {1: "example.com/p", 2: "not a url", 3: ""}


def test_append_postings_matches_union_inline(spark, tmp_path):
    # after an append, store probes must stay bit-identical to the
    # inline scorer over the UNION corpus (mergeable sidecar stats,
    # df re-derived from posting lists)
    a = [(i, f"alpha beta doc{i} " + "alpha " * (i % 3)) for i in range(15)]
    b = [
        (100 + i, f"alpha gamma doc{100 + i} " + "beta " * (i % 4))
        for i in range(10)
    ]
    dfa = generate_input(spark, a, "doc_id bigint, text string")
    dfb = generate_input(spark, b, "doc_id bigint, text string")
    path = str(tmp_path / "postings")
    s0 = tx.materialize_postings(dfa, path, n_buckets=8)
    s1 = tx.append_postings(dfb, path)
    assert s1["n_docs"] == 25 and s1["n_docs"] == s0["n_docs"] + 10
    terms = ["alpha", "beta", "doc102"]
    inline = {
        (r.doc_id, r.n_matched, r.score_nano)
        for r in tx.bm25_scores(dfa.union(dfb), terms).collect()
    }
    stored = {
        (r.doc_id, r.n_matched, r.score_nano)
        for r in tx.bm25_from_store(spark, path, terms).collect()
    }
    assert inline == stored and len(inline) == 25


def test_store_listing_memo_identity_and_append_invalidation(
    spark, tmp_path
):
    """r14 probe optimization: ``_read_store`` memoizes the resolved
    base relation (file listing + schema — METADATA only, never rows)
    per content-derived store key, so the serving loop's repeated
    probes skip the per-call recursive file listing. An in-place
    append into an EXISTING partition directory must invalidate the
    memo (each top-level entry's mtime is part of the key) so probes
    never serve a listing that misses appended part files."""
    vecs = [(i, [float(i + 1), 1.0, 0.5, -1.0]) for i in range(20)]
    df = generate_input(
        spark, vecs, "vec_id bigint, embedding array<double>"
    )
    store = str(tmp_path / "ivf_memo")
    sim.materialize_ivf(df, store, n_cells=2)
    d1 = sim._read_store(spark, store)
    # memo hit: the SAME resolved relation (no re-listing)
    assert sim._read_store(spark, store) is d1
    n1 = d1.count()
    import time as _time

    _time.sleep(1.1)  # fs mtime granularity floor
    extra = generate_input(
        spark,
        [(100 + i, [float(i + 1), 1.0, 0.5, -1.0]) for i in range(5)],
        "vec_id bigint, embedding array<double>",
    )
    sim.append_ivf(extra, store, skip_existing_ids=False)
    d2 = sim._read_store(spark, store)
    assert d2 is not d1  # key changed -> fresh listing
    assert d2.count() == n1 + 5  # appended rows visible


def test_append_ivf_matches_full_build(spark, tmp_path):
    # appended vectors must be probe-visible with the SAME results as
    # a store built from the union (same centroids pin the layout)
    import random

    rng = random.Random(3)
    mk = lambda i: (i, [rng.uniform(-1, 1) for _ in range(8)])
    a = [mk(i) for i in range(40)]
    b = [mk(100 + i) for i in range(20)]
    dfa = generate_input(spark, a, "vec_id bigint, embedding array<double>")
    dfb = generate_input(spark, b, "vec_id bigint, embedding array<double>")
    p1 = str(tmp_path / "ivf_inc")
    p2 = str(tmp_path / "ivf_full")
    cents = sim.materialize_ivf(dfa, p1, n_cells=4)
    sim.append_ivf(dfb, p1)
    sim.materialize_ivf(dfa.union(dfb), p2, n_cells=4, centroids=cents)
    q = a[0][1]
    r1 = [
        (r.vec_id, r.score)
        for r in sim.ivf_topk_from_store(
            spark, p1, q, k=5, nprobe=4, centroids=cents
        ).collect()
    ]
    r2 = [
        (r.vec_id, r.score)
        for r in sim.ivf_topk_from_store(
            spark, p2, q, k=5, nprobe=4, centroids=cents
        ).collect()
    ]
    assert r1 == r2 and len(r1) == 5
    assert any(v >= 100 for v, _ in r1 + r2) or True  # sanity only


def test_append_lsh_matches_full_build(spark, tmp_path):
    import random

    rng = random.Random(5)
    mk = lambda i: (i, [rng.uniform(-1, 1) for _ in range(8)])
    a = [mk(i) for i in range(30)]
    b = [mk(100 + i) for i in range(15)]
    dfa = generate_input(spark, a, "vec_id bigint, embedding array<double>")
    dfb = generate_input(spark, b, "vec_id bigint, embedding array<double>")
    p1 = str(tmp_path / "lsh_inc")
    p2 = str(tmp_path / "lsh_full")
    sim.materialize_lsh(dfa, p1, bits=4)
    sim.append_lsh(dfb, p1, bits=4)
    sim.materialize_lsh(dfa.union(dfb), p2, bits=4)
    q = a[1][1]
    r1 = [
        (r.vec_id, r.score)
        for r in sim.lsh_topk_from_store(
            spark, p1, q, k=5, bits=4, nprobe=3
        ).collect()
    ]
    r2 = [
        (r.vec_id, r.score)
        for r in sim.lsh_topk_from_store(
            spark, p2, q, k=5, bits=4, nprobe=3
        ).collect()
    ]
    assert r1 == r2 and len(r1) == 5


def test_bm25_hard_negatives_excludes_positive(spark):
    rows = [
        (1, "alpha alpha alpha"),   # strongest alpha doc
        (2, "alpha alpha beta"),
        (3, "alpha beta beta"),
        (4, "gamma delta"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = sorted(
        tx.bm25_hard_negatives(
            df, {"q": (["alpha"], 1)}, n_negatives=2
        ).collect(),
        key=lambda r: r.neg_rank,
    )
    # doc 1 is the top alpha hit but is the positive -> excluded;
    # negatives are the next-best alpha docs in score order
    assert [r.neg_doc_id for r in out] == [2, 3]
    assert all(r.pos_doc_id == 1 for r in out)
    assert out[0].score_nano > out[1].score_nano
    with pytest.raises(ValueError, match="n_negatives"):
        tx.bm25_hard_negatives(df, {"q": (["alpha"], 1)}, n_negatives=0)


def test_length_batches_padding_accounting(spark):
    rows = [(i, "w " * (i + 1)) for i in range(7)]  # 2,3,...,8 tokens
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in tx.length_batches(df, 3).collect()}
    # ordered by n_tok: docs 0,1,2 -> batch 0; 3,4,5 -> batch 1;
    # ragged last batch keeps doc 6
    assert [out[i].batch_id for i in range(7)] == [0, 0, 0, 1, 1, 1, 2]
    assert out[0].batch_max_tok == out[2].n_tok
    assert out[0].waste_tok == out[2].n_tok - out[0].n_tok
    assert out[6].waste_tok == 0
    with pytest.raises(ValueError, match="batch_size"):
        tx.length_batches(df, 0)


def test_unicode_normalize_differential(spark):
    import unicodedata

    rows = [
        (1, "ＦＵＬＬｗｉｄｔｈ　ｔｅｘｔ"),       # fullwidth + ideographic space
        (2, "ﬁne ﬂow"),                        # ligatures
        (3, "café"),                     # combining acute
        (4, "plain ascii"),
        (5, None),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in tx.unicode_normalize(df).collect()}
    for i, s in rows:
        expect = unicodedata.normalize("NFKC", s or "")
        assert out[i].text_norm == expect
        assert out[i].changed == ((s or "") != expect)
    assert out[1].text_norm == "FULLwidth text"
    assert out[2].text_norm == "fine flow"
    assert out[3].text_norm == "café"
    folded = {
        r.doc_id: r.text_norm
        for r in tx.unicode_normalize(df, casefold=True).collect()
    }
    assert folded[1] == "fullwidth text"
    with pytest.raises(ValueError, match="form"):
        tx.unicode_normalize(df, form="NFX")


def test_round6_continuation_ops_empty_input(spark):
    """Every new op must plan and execute on an EMPTY input without
    throwing (the behavior a pipeline hits on an empty partition of
    a date-partitioned corpus)."""
    from datasplash_spark.functions import chat as ch
    from datasplash_spark.functions import web as wb

    docs = generate_input(spark, [], "doc_id bigint, text string")
    conv = generate_input(spark, [], "doc_id bigint, conv_json string")
    urls = generate_input(spark, [], "doc_id bigint, url string, text string")
    vecs = generate_input(spark, [], "vec_id bigint, embedding array<double>")
    assert dd.remove_boilerplate_lines(docs).count() == 0
    assert dd.remove_boilerplate_lines(docs, strategy="broadcast").count() == 0
    assert tx.subword_stats(docs, [("a", "b")]).count() == 0
    assert ch.conversation_stats(conv).count() == 0
    assert ch.flatten_turns(conv).count() == 0
    assert wb.host_stats(urls).count() == 0
    assert wb.url_filter(urls, blocked_hosts=["x.com"]).count() == 0
    assert tx.topic_tags(docs, {"t": ["x"]}).count() == 0
    assert sim.embedding_audit(vecs).count() == 0
    assert tx.chunk_by_sentences(docs, 8).count() == 0
    assert tx.length_batches(docs, 4).count() == 0
    assert tx.compression_ratio(docs).count() == 0
    assert tx.unicode_normalize(docs).count() == 0
    parent = generate_input(spark, [], "pk bigint")
    r = ops.fk_audit(docs, parent, "doc_id", "pk").collect()[0]
    assert (r.n_child, r.n_orphan, r.n_matched) == (0, 0, 0)
    assert tx.bm25_hard_negatives(
        docs, {"q": (["alpha"], 1)}
    ).count() == 0


def test_normalize_url_idempotent_random(spark):
    """Idempotence: normalize(normalize(u)) == normalize(u) for a
    random zoo of URL-ish strings (well-formed, tracking-laden,
    fragment-bearing, and malformed) — the property a dedup key
    MUST have, or re-running a pipeline re-keys the corpus."""
    import random

    from datasplash_spark.functions import web as wb

    rng = random.Random(13)
    parts = lambda: "".join(
        rng.choices("abXY09.-_/?&=#%", k=rng.randint(0, 12))
    )
    urls = []
    for i in range(120):
        shape = rng.randrange(4)
        if shape == 0:
            urls.append(
                f"HTTPS://Host{rng.randrange(5)}.COM/p/{i}"
                f"?utm_source=x&b={i}&a=1#frag"
            )
        elif shape == 1:
            urls.append(f"http://h{i}.org" + parts())
        elif shape == 2:
            urls.append(parts())          # malformed
        else:
            urls.append(f"ftp://f.example/{parts()}")
    df = generate_input(
        spark, list(enumerate(urls)), "doc_id bigint, url string"
    )
    once = df.select(
        "doc_id", wb.normalize_url("url").alias("u")
    )
    twice = once.select(
        "doc_id", wb.normalize_url("u").alias("u2"), "u"
    ).collect()
    for r in twice:
        assert r.u2 == r.u, (r.u, r.u2)


def test_token_budget_batches_nfd_walk(spark):
    # one shard; lengths 8,5,4,3,2 (desc), capacity 9:
    # [8],[5+4],[3+2] — oversized-alone not hit here; verify with
    # capacity 4 that the length-8 doc gets its own over-budget batch
    rows = [
        (1, "s", "w " * 8),
        (2, "s", "w " * 5),
        (3, "s", "w " * 4),
        (4, "s", "w " * 3),
        (5, "s", "w " * 2),
    ]
    df = generate_input(
        spark, rows, "doc_id bigint, source string, text string"
    )
    out = {
        r.doc_id: (r.batch_id, r.batch_tok)
        for r in tx.token_budget_batches(df, 9).collect()
    }
    # token_count = split size: "w " * n -> n+1 tokens (trailing "").
    # Lengths desc: 9,6,5,4,3 at capacity 9 walk as:
    # [9] [6] [5+4] [3]
    assert out[1] == (0, 9)
    assert out[2] == (1, 6)
    assert out[3] == (2, 9) and out[4] == (2, 9)
    assert out[5] == (3, 3)
    out_small = {
        r.doc_id: r.batch_id
        for r in tx.token_budget_batches(df, 4).collect()
    }
    assert out_small[1] == 0  # oversized doc alone, never split
    with pytest.raises(ValueError, match="capacity"):
        tx.token_budget_batches(df, 0)


def test_pseudonymize_pii_stable_tokens(spark):
    rows = [
        (1, "mail a@b.com and again a@b.com plus c@d.org"),
        (2, "other doc a@b.com at 10.0.0.1"),
        (3, "clean"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in tx.pseudonymize_pii(df).collect()}
    t1, t2 = out[1].text_pseudo, out[2].text_pseudo
    # same entity -> same token, within and across docs
    tok = t1.split()[1]
    assert t1.count(tok) == 2 and tok in t2
    assert out[1].n_replaced == 3 and out[2].n_replaced == 2
    assert out[3].text_pseudo == "clean" and out[3].n_replaced == 0
    # different salt -> unlinkable pseudonym space
    salted = {
        r.doc_id: r.text_pseudo
        for r in tx.pseudonymize_pii(df, salt="v2").collect()
    }
    assert salted[1] != t1 and salted[1].split()[1] != tok


def test_neighbor_lists_topk_symmetric(spark):
    pairs = generate_input(
        spark,
        [(1, 2, 0.9), (1, 3, 0.8), (2, 3, 0.7), (1, 4, 0.6)],
        "a bigint, b bigint, score double",
    )
    out = {}
    for r in sim.neighbor_lists(pairs, k=2).collect():
        out.setdefault(r.node, []).append((r.rank, r.neighbor, r.score))
    for v in out.values():
        v.sort()
    assert out[1] == [(1, 2, 0.9), (2, 3, 0.8)]   # k=2 drops node 4
    assert out[2] == [(1, 1, 0.9), (2, 3, 0.7)]   # symmetrized
    assert out[4] == [(1, 1, 0.6)]
    with pytest.raises(ValueError, match="k must"):
        sim.neighbor_lists(pairs, k=0)


def test_sft_token_stats_loss_masking(spark):
    from datasplash_spark.functions import chat as ch

    rows = [
        (1, '[{"role":"user","content":"a b c"},'
            '{"role":"assistant","content":"d e"}]'),
        (2, "broken"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, conv_json string")
    out = {r.doc_id: r for r in ch.sft_token_stats(df).collect()}
    assert out[1].n_tok_total == 5 and out[1].n_tok_loss == 2
    assert out[1].loss_frac_micro == 2 * 1_000_000 // 5
    assert out[2].n_tok_total == 0 and out[2].loss_frac_micro == 0
    # ADVICE r6: whitespace tokens = NON-EMPTY pieces — empty content
    # is 0 tokens (not 1) and runs of spaces add no phantom tokens
    edge = generate_input(
        spark,
        [
            (3, '[{"role":"user","content":""},'
                '{"role":"assistant","content":"a  b   c"}]'),
        ],
        "doc_id bigint, conv_json string",
    )
    e3 = ch.sft_token_stats(edge).collect()[0]
    assert e3.n_tok_total == 3 and e3.n_tok_loss == 3
    assert e3.n_turns == 2


def test_batching_ops_null_text(spark):
    # NULL text = 0 tokens; neither batching op may emit NULL counts
    # or crash the pandas walk
    df = generate_input(
        spark,
        [(1, "s", None), (2, "s", "a b")],
        "doc_id bigint, source string, text string",
    )
    lb = {r.doc_id: r for r in tx.length_batches(df, 2).collect()}
    assert lb[1].n_tok == 0 and lb[1].waste_tok == lb[1].batch_max_tok
    bb = {r.doc_id: r for r in tx.token_budget_batches(df, 4).collect()}
    assert bb[1].n_tok == 0 and bb[2].n_tok == 2


def test_canary_roundtrip_and_leak_detection(spark):
    docs = generate_input(
        spark,
        [(i, f"doc body {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    marked = dd.insert_canaries(docs, every=4, seed=7)
    planted = marked.where("canary is not null")
    n_planted = planted.count()
    assert 0 < n_planted < 40
    # deterministic: same seed reproduces the set exactly
    again = dd.insert_canaries(docs, every=4, seed=7)
    assert sorted(
        r.canary for r in again.where("canary is not null").collect()
    ) == sorted(r.canary for r in planted.collect())
    # detection through a shuffle + truncation: all found once
    released = marked.select(
        "doc_id",
        F.concat(F.lit("prefix "), F.col("text"), F.lit(" suffix")).alias(
            "text"
        ),
    )
    rep = dd.detect_canaries(released, planted)
    assert rep.count() == n_planted
    assert rep.where("NOT found").count() == 0
    assert rep.where("n_docs != 1").count() == 0
    # drop one canary-carrying doc -> reported missing
    victim = planted.limit(1).collect()[0].doc_id
    lost = dd.detect_canaries(
        released.where(F.col("doc_id") != victim), planted
    )
    assert lost.where("NOT found").count() == 1
    # leak: duplicate a canary into another doc -> n_docs == 2
    leak_text = planted.limit(1).collect()[0].canary
    leaked = released.union(
        spark.createDataFrame(
            [(999, "stray " + leak_text)], "doc_id bigint, text string"
        )
    )
    rep2 = dd.detect_canaries(leaked, planted)
    assert rep2.where("n_docs = 2").count() == 1
    # in-doc span repeat: the SAME doc carrying its canary twice is
    # ONE carrier, not a phantom cross-document leak (ADVICE r6 —
    # n_docs counts distinct carrying documents)
    repeated = released.select(
        "doc_id",
        F.when(
            F.col("doc_id") == victim,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    rep3 = dd.detect_canaries(repeated, planted)
    assert rep3.where("n_docs != 1").count() == 0
    with pytest.raises(ValueError, match="every"):
        dd.insert_canaries(docs, every=0)


def test_explain_pair_signals(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content entirely here now"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    near = dd.explain_pair(df, 1, 2).collect()[0]
    far = dd.explain_pair(df, 1, 3).collect()[0]
    assert near.n_shared_shingles > 0 and near.jaccard > far.jaccard
    assert near.lsh_bands_colliding >= far.lsh_bands_colliding
    assert near.simhash_hamming < far.simhash_hamming
    assert near.edit_distance == 3  # dog -> cat
    assert 0 < near.edit_ratio < far.edit_ratio
    assert far.n_shared_shingles == 0


def test_rrf_fuse_integer_points(spark):
    """rrf_fuse: deterministic (score desc, id asc) ranks, integer
    1e9 div (k+rank) points, per-doc list count; <2 lists rejected."""
    a = generate_input(
        spark, [(1, 9.0), (2, 5.0), (3, 5.0)], "doc_id bigint, score double"
    )
    b = generate_input(
        spark, [(2, 100), (4, 50)], "doc_id bigint, score bigint"
    )
    got = {
        r.doc_id: (r.n_lists, r.rrf_nano)
        for r in sim.rrf_fuse([a, b], k=60).collect()
    }
    # list a ranks: 1->1, 2->2 (5.0 tie broken by id), 3->3
    # list b ranks: 2->1, 4->2
    p = lambda rnk: 1_000_000_000 // (60 + rnk)
    assert got[1] == (1, p(1))
    assert got[2] == (2, p(2) + p(1))
    assert got[3] == (1, p(3))
    assert got[4] == (1, p(2))
    with pytest.raises(ValueError, match="two"):
        sim.rrf_fuse([a])


def test_rrf_fuse_bounds_unbounded_lists(spark):
    """rrf_fuse max_list_rows guard (VERDICT r7 item 4): a list
    bigger than the bound fails the job at execution (in-plan
    raise_error tripwire — zero extra jobs, the window physically
    capped at max+1 rows) instead of silently serializing a corpus
    on one task; a conforming list fuses identically with the guard
    on, off, or absent."""
    big = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("score")
    )
    small = generate_input(
        spark, [(1, 2.0), (2, 1.0)], "doc_id bigint, score double"
    )
    # .collect() forces rrf_nano; (a bare .count() prunes the points
    # column AND the rank window with it — no window, no hazard, no
    # tripwire: the guard is exactly hazard-proportional)
    with pytest.raises(Exception, match="max_list_rows"):
        sim.rrf_fuse([big, small], max_list_rows=10).collect()
    # bound respected -> normal fuse, identical with guard on/off
    guarded = sim.rrf_fuse([big, small], max_list_rows=50)
    unguarded = sim.rrf_fuse([big, small], max_list_rows=None)
    assert guarded.count() == 50 and unguarded.count() == 50
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )
    with pytest.raises(ValueError, match=">= 1"):
        sim.rrf_fuse([big, small], max_list_rows=0)


def test_script_profile_partitions_chars(spark):
    """script_profile: disjoint class counts partition n_chars
    exactly (latin+digit+space+cjk+cyrillic+arabic+other == total),
    per-class counts match hand counts, NULL text is all zeros."""
    rows = [
        (1, "Hello 世界 мир 123"),
        (2, "abc"),
        (3, None),
        (4, "مرحبا بالعالم"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    got = {r.doc_id: r.asDict() for r in tx.script_profile(df).collect()}
    for d in got.values():
        parts = (
            d["n_latin"] + d["n_digit"] + d["n_space"] + d["n_cjk"]
            + d["n_cyrillic"] + d["n_arabic"] + d["n_other"]
        )
        assert parts == d["n_chars"], d
    assert got[1]["n_cjk"] == 2 and got[1]["n_cyrillic"] == 3
    assert got[1]["n_digit"] == 3 and got[1]["n_latin"] == 5
    assert got[2]["n_latin"] == 3 and got[2]["nonlatin_micro"] == 0
    assert got[3]["n_chars"] == 0 and got[3]["nonlatin_micro"] == 0
    assert got[4]["n_arabic"] == 12 and got[4]["n_space"] == 1
    # doc 1 non-space = 13, non-latin letters = 13 - 5 - 3 = 5
    assert got[1]["nonlatin_micro"] == 5 * 1_000_000 // 13


def test_ngram_novelty_min_owner(spark):
    """ngram_novelty: the lowest doc_id owns each gram; a full copy
    scores 0; a half-copy scores its new half; 0-gram docs score 0."""
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),          # exact copy -> 0 novel
        (3, "a b c x y z"),        # shares 'a b c' only
        (4, ""),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_micro)
        for r in tx.ngram_novelty(df, k=3).collect()
    }
    assert got[1] == (3, 3, 1_000_000)
    assert got[2] == (3, 0, 0)
    # doc 3 grams: 'a b c','b c x','c x y','x y z' -> 3 novel of 4
    assert got[3] == (4, 3, 750_000)
    assert got[4][2] == 0


def test_cdc_chunks_properties(spark):
    """cdc_chunks: chunks tile the token stream exactly (contiguous,
    sum == token count); a prefix insertion leaves every chunk AFTER
    the first boundary digest-identical (the content-defined
    property fixed-size chunking lacks); short docs are one chunk."""
    words = " ".join(f"w{i % 97}x{i % 31}" for i in range(400))
    rows = [(1, words), (2, "tiny doc here"), (3, "prefixtok " + words)]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    out = dd.cdc_chunks(df, divisor=8, k=4)
    rowsby = {}
    for r in out.collect():
        rowsby.setdefault(r.doc_id, []).append(r)
    for did, chunks in rowsby.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        pos = 1
        for c in chunks:
            assert c.start_tok == pos, (did, c)
            pos += c.n_toks
        n_toks = len([t for t in {1: words, 2: "tiny doc here", 3: "prefixtok " + words}[did].split(" ") if t])
        assert pos - 1 == n_toks, did
    assert len(rowsby[2]) == 1 and rowsby[2][0].n_toks == 3
    d1 = [c.chunk_digest for c in rowsby[1]]
    d3 = [c.chunk_digest for c in rowsby[3]]
    assert len(d1) > 2, "fixture too short to exercise boundaries"
    # all of doc 1's chunks except its first survive the prefix edit
    assert set(d1[1:]) <= set(d3)


def test_zipf_slopes_fit(spark):
    """zipf_slopes: a synthetic Zipfian slice fits slope ~ -1; a
    near-singleton slice returns NULL slope (no line); counts are
    exact."""
    words = []
    for i in range(1, 60):
        words += [f"term{i:03d}"] * max(1, round(600 / i))
    rows = [(1, " ".join(words), "zipfy"), (2, "solo", "tiny")]
    df = generate_input(
        spark, rows, "doc_id bigint, text string, source string"
    )
    got = {r.key: r for r in tx.zipf_slopes(df, key="source").collect()}
    z = got["zipfy"]
    assert z.n_terms == 59 and z.n_tokens == len(words)
    assert -1.25 < z.zipf_slope < -0.8, z.zipf_slope
    assert got["tiny"].zipf_slope is None


def test_wav_roundtrip_and_decode():
    """Zero-dependency WAV codec: encode/decode round-trips int16
    mono and stereo exactly; 8-bit PCM and word-aligned odd chunks
    decode; truncated / non-PCM streams raise."""
    import struct

    import numpy as np

    mono = (np.arange(-500, 500, 7)).astype(np.int16)
    d = mm.decode_wav(mm.encode_wav(mono, 8000))
    assert (d["sample_rate"], d["n_channels"], d["bit_depth"]) == (8000, 1, 16)
    assert np.array_equal(d["samples"][:, 0], mono)
    st = np.stack([mono, mono[::-1]], axis=1)
    d2 = mm.decode_wav(mm.encode_wav(st, 44100))
    assert d2["n_channels"] == 2 and np.array_equal(d2["samples"], st)
    # hand-built 8-bit mono fixture
    payload = bytes([0, 128, 255, 64])
    raw = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    d8 = mm.decode_wav(raw)
    assert d8["bit_depth"] == 8 and list(d8["samples"][:, 0]) == [0, 128, 255, 64]
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"nope")
    # format 3 with a non-float bit depth is a malformed float stream
    with pytest.raises(ValueError, match="float bit depth"):
        bad = raw.replace(
            struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8),
            struct.pack("<IHHIIHH", 16, 3, 1, 16000, 16000, 1, 8),
        )
        mm.decode_wav(bad)
    # genuinely compressed codecs (ADPCM = format 2) stay rejected
    with pytest.raises(ValueError, match="compressed format 2"):
        bad = raw.replace(
            struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8),
            struct.pack("<IHHIIHH", 16, 2, 1, 16000, 16000, 1, 8),
        )
        mm.decode_wav(bad)


def test_wav_float_decode():
    """IEEE-float WAV (format 3, VERDICT r7 item 6): 32-bit mono and
    stereo round-trip through the int16 conversion (clip ± round),
    64-bit decodes, out-of-range samples clip instead of wrapping,
    and the source codec/precision are reported."""
    import struct

    import numpy as np

    v = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 0.25], dtype=np.float32)
    d = mm.decode_wav(mm.encode_wav_float(v, 22050))
    assert (d["sample_rate"], d["n_channels"]) == (22050, 1)
    assert (d["audio_format"], d["bit_depth"]) == (3, 32)
    want = np.round(np.clip(v, -1, 1) * 32767).astype(np.int16)
    assert np.array_equal(d["samples"][:, 0], want)
    # stereo
    st = np.stack([v, -v], axis=1)
    d2 = mm.decode_wav(mm.encode_wav_float(st, 8000))
    assert d2["n_channels"] == 2 and d2["n_samples"] == len(v)
    assert np.array_equal(
        d2["samples"],
        np.round(np.clip(st, -1, 1) * 32767).astype(np.int16),
    )
    # clipping: ±2.0 lands exactly on ±32767, no int16 wraparound
    dc = mm.decode_wav(
        mm.encode_wav_float(np.array([2.0, -2.0], dtype=np.float32))
    )
    assert list(dc["samples"][:, 0]) == [32767, -32767]
    # hand-built float64 fixture (format 3, bits 64)
    f64 = np.array([0.5, -0.25], dtype="<f8").tobytes()
    raw64 = (
        b"RIFF" + struct.pack("<I", 36 + len(f64)) + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 3, 1, 48000, 48000 * 8, 8, 64)
        + b"data" + struct.pack("<I", len(f64)) + f64
    )
    d64 = mm.decode_wav(raw64)
    assert (d64["audio_format"], d64["bit_depth"]) == (3, 64)
    assert list(d64["samples"][:, 0]) == [16384, -8192]


def test_mp4_metadata(spark):
    """ISO BMFF metadata extraction (round 10 — the routing stage a
    video corpus runs before any codec kernel): skeleton writer →
    parser roundtrips movie duration, brands, per-track handler /
    codec fourcc / dims / channels / sample rate / sample counts;
    64-bit largesize boxes walk; truncation and missing-ftyp/moov
    quarantine; sniff routes 'mp4'; the Spark feature surface emits
    typed rows with per-doc quarantine."""
    import struct

    from datasplash_spark.functions import mp4 as M

    raw = M.encode_mp4_skeleton(
        [
            {"handler": "vide", "codec": "avc1", "width": 1920,
             "height": 1080, "n_samples": 300},
            {"handler": "soun", "codec": "mp4a", "channels": 2,
             "sample_rate": 48000},
        ],
        timescale=600,
        duration_s=12.5,
    )
    d = M.parse_mp4(raw)
    assert d["brand"] == "isom" and d["duration_s"] == 12.5
    v, a = d["tracks"]
    assert (v["handler"], v["codec"]) == ("vide", "avc1")
    assert (v["width"], v["height"], v["n_samples"]) == (1920, 1080, 300)
    assert (a["handler"], a["codec"]) == ("soun", "mp4a")
    assert (a["channels"], a["sample_rate"]) == (2, 48000)
    # 64-bit largesize boxes
    (sz,) = struct.unpack(">I", raw[:4])
    body = raw[8:sz]
    large = (
        struct.pack(">I", 1) + b"ftyp"
        + struct.pack(">Q", 16 + len(body)) + body
    )
    assert M.parse_mp4(large + raw[sz:])["brand"] == "isom"
    with pytest.raises(ValueError, match="moov"):
        M.parse_mp4(raw[:30])
    with pytest.raises(ValueError, match="ftyp"):
        M.parse_mp4(b"\x00\x00\x00\x10mdat" + b"\x00" * 8)
    with pytest.raises(ValueError, match="box size"):
        M.parse_mp4(b"\x00\x00\x00\x03ftypisom\x00\x00\x00\x00")

    rows = [
        (1, bytearray(raw)),
        (2, bytearray(b"\x00\x00\x00\x10ftypmp42\x00\x00\x00\x00")),
        (3, bytearray(b"junk")),
    ]
    df = generate_input(spark, rows, "doc_id bigint, media binary")
    t = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", mm.sniff_media_type("media").alias("t")
        ).collect()
    }
    assert t == {1: "mp4", 2: "mp4", 3: "unknown"}
    got = {r.doc_id: r for r in M.mp4_metadata_features(df).collect()}
    assert got[1].ok and got[1].video_codec == "avc1"
    assert got[1].width == 1920 and got[1].sample_rate == 48000
    assert got[1].duration_s == 12.5 and got[1].n_tracks == 2
    assert not got[2].ok and "moov" in got[2].err
    assert not got[3].ok


def test_flac_codec(spark):
    """FLAC codec (round 10 — the speech-corpus container):
    lossless roundtrips across block sizes / frame counts / bit
    depths / all four stereo decorrelation modes / constant-verbatim
    -fixed subframes; CRC-8 and CRC-16 match the published check
    values and tampering quarantines at both levels; sniff routes
    'flac'; audio_features produces IDENTICAL stats for the same
    signal in WAV and FLAC containers (the container-invariance the
    gated mixed-corpus oracle relies on)."""
    import numpy as np

    from datasplash_spark.functions import flac as FL
    from datasplash_spark.functions.flac import _crc8, _crc16

    # published check values: CRC-8 poly 0x07 and CRC-16/BUYPASS
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8

    rng = np.random.RandomState(9)
    for n in (0, 1, 5, 100, 5000):
        sig = (
            (rng.randn(n) * 3000).clip(-32768, 32767).astype(np.int64)
        )
        d = FL.decode_flac(FL.encode_flac(sig, block_size=1024))
        assert d["n_samples"] == n
        assert np.array_equal(d["samples"][:, 0], sig), n
    sig2 = np.stack(
        [
            (np.sin(np.linspace(0, 30, 4000)) * 20000).astype(np.int64),
            (np.cos(np.linspace(0, 30, 4000)) * 15000).astype(np.int64),
        ],
        axis=1,
    )
    for mode in ("independent", "left-side", "right-side", "mid-side"):
        d = FL.decode_flac(
            FL.encode_flac(sig2, channel_mode=mode, block_size=1000)
        )
        assert np.array_equal(d["samples"], sig2), mode
    for bits in (8, 16, 24):
        lim = 1 << (bits - 1)
        s = rng.randint(-lim, lim, 700).astype(np.int64)
        d = FL.decode_flac(FL.encode_flac(s, bits=bits, block_size=256))
        assert d["bit_depth"] == bits
        assert np.array_equal(d["samples"][:, 0], s), bits
    const = np.full(500, -123, dtype=np.int64)
    assert np.array_equal(
        FL.decode_flac(FL.encode_flac(const))["samples"][:, 0], const
    )
    verb = rng.randint(-32768, 32767, 300).astype(np.int64)
    assert np.array_equal(
        FL.decode_flac(FL.encode_flac(verb, strategy="verbatim"))[
            "samples"
        ][:, 0],
        verb,
    )
    # CRC quarantines: frame CRC-16 and header CRC-8
    sig3 = (np.sin(np.linspace(0, 9, 500)) * 10000).astype(np.int64)
    raw = bytearray(FL.encode_flac(sig3))
    raw[-1] ^= 0x01
    with pytest.raises(ValueError, match="frame CRC"):
        FL.decode_flac(bytes(raw))
    raw2 = bytearray(FL.encode_flac(sig3))
    i = bytes(raw2).index(b"\xff\xf8", 4)
    raw2[i + 7] ^= 0xFF  # the CRC-8 byte itself
    with pytest.raises(ValueError, match="header CRC"):
        FL.decode_flac(bytes(raw2))
    with pytest.raises(ValueError, match="magic"):
        FL.decode_flac(b"not flac")

    # Spark path: identical stats across containers + sniff routing
    rows = [
        (1, bytearray(FL.encode_flac(sig3))),
        (2, bytearray(mm.encode_wav(sig3.astype(np.int16)))),
    ]
    df = generate_input(spark, rows, "doc_id bigint, media binary")
    got = {r.doc_id: r for r in mm.audio_features(df).collect()}
    assert got[1].ok and got[2].ok
    for f in ("sum_sq", "peak", "zero_crossings", "n_samples",
              "bit_depth", "sample_rate"):
        assert getattr(got[1], f) == getattr(got[2], f), f
    t = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", mm.sniff_media_type("media").alias("t")
        ).collect()
    }
    assert t == {1: "flac", 2: "wav"}


def test_wav_g711_decode():
    """G.711 µ-law/A-law WAV decode (round 10 — the telephony
    formats): expansion tables match the CCITT reference anchors and
    sign symmetry; compress→expand quantization error is bounded by
    half the top-segment step; re-encoding a decoded signal is exact
    (the tables are true inverses); stereo interleave preserved;
    non-8-bit G.711 quarantines by name; the features path carries
    format 6/7 rows next to PCM."""
    import numpy as np

    from datasplash_spark.functions.multimodal import (
        _alaw_table,
        _ulaw_table,
        decode_wav,
        encode_wav_g711,
    )

    ut, at = _ulaw_table(), _alaw_table()
    assert ut[0x00] == -32124 and ut[0x80] == 32124
    assert ut[0xFF] == 0 and ut[0x7F] == 0
    assert at[0xD5] == 8 and at[0x55] == -8
    assert (at.max(), at.min()) == (32256, -32256)
    assert np.array_equal(ut[:128], -ut[128:])
    assert np.array_equal(at[128:], -at[:128])

    sig = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    for law, code in (("ulaw", 7), ("alaw", 6)):
        d = decode_wav(encode_wav_g711(sig, law=law))
        assert d["audio_format"] == code and d["bit_depth"] == 8
        err = np.abs(d["samples"][:, 0].astype(np.int64) - sig)
        assert err.max() <= 1024, (law, err.max())
        d2 = decode_wav(encode_wav_g711(d["samples"][:, 0], law=law))
        assert np.array_equal(d2["samples"], d["samples"])
    # stereo: channel interleave preserved
    st = np.stack([sig[:100], -sig[:100]], axis=1).astype(np.int16)
    d = decode_wav(encode_wav_g711(st, law="ulaw"))
    assert d["n_channels"] == 2 and d["n_samples"] == 100
    assert np.array_equal(d["samples"][:, 0], -d["samples"][:, 1])
    # malformed: G.711 must be 8-bit
    bad = bytearray(encode_wav_g711(sig))
    bad[34] = 16  # bits field inside fmt chunk
    with pytest.raises(ValueError, match="G.711"):
        decode_wav(bytes(bad))


def test_audio_features_mixed_pcm_float_corpus(spark):
    """audio_features over a MIXED corpus — PCM-16, float32, and a
    poison row in one frame — extracts per-codec features without
    the float rows poisoning the stage (the r7 quarantine contract
    extended to format 3)."""
    import numpy as np

    pcm = mm.encode_wav(np.array([100, -200, 300], dtype=np.int16), 8000)
    flt = mm.encode_wav_float(
        np.array([0.5, -0.5, 0.5], dtype=np.float32), 16000
    )
    df = generate_input(
        spark,
        [
            (1, bytearray(pcm)),
            (2, bytearray(flt)),
            (3, bytearray(b"junk")),
        ],
        "doc_id bigint, media binary",
    )
    got = {r.doc_id: r for r in mm.audio_features(df).collect()}
    assert got[1].ok and got[1].bit_depth == 16 and got[1].peak == 300
    assert got[2].ok and got[2].bit_depth == 32
    assert got[2].peak == 16384 and got[2].zero_crossings == 2
    assert got[2].sum_sq == 3 * 16384 * 16384
    assert got[3].ok is False and "RIFF" in got[3].err


def test_audio_features_pipeline(spark):
    """synthesize → decode → features matches a direct numpy replay
    of the sample formula; poison rows quarantine with ok=false."""
    import numpy as np

    rows = [(1, "hello world"), (2, ""), (3, "aAzZ09")]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    wavs = mm.synthesize_wav_from_text(df)
    got = {r.doc_id: r for r in mm.audio_features(wavs).collect()}

    def replay(t):
        codes = np.array([ord(c) for c in t], dtype=np.int64)
        v = (codes * 2654435761) % 65536 - 32768
        peak = int(np.abs(v).max()) if len(v) else 0
        zc = int(((v[1:] * v[:-1]) < 0).sum()) if len(v) > 1 else 0
        return len(v), peak, int((v * v).sum()), zc

    for did, t in rows:
        n, peak, ss, zc = replay(t)
        r = got[did]
        assert (r.n_samples, r.peak, r.sum_sq, r.zero_crossings) == (
            n, peak, ss, zc,
        ), (did, r)
        assert r.ok and r.sample_rate == 16000 and r.bit_depth == 16
    poison = generate_input(
        spark,
        [(9, bytearray(b"not a wav at all"))],
        "doc_id bigint, media binary",
    )
    p = mm.audio_features(poison).collect()[0]
    assert p.ok is False and "RIFF" in p.err


def test_curriculum_order_stages_and_key(spark):
    """curriculum_order: per-key quantile stages, easy-first sort
    key with deterministic within-stage shuffle; a seed change moves
    nothing across stages."""
    rows = [(i, (i % 10 + 1) * 10, "s" + str(i % 2)) for i in range(40)]
    df = generate_input(spark, rows, "doc_id bigint, diff int, src string")
    out = ops.curriculum_order(
        df, "diff", n_stages=4, seed=1, key="src"
    ).collect()
    assert len(out) == 40
    by_key = sorted(out, key=lambda r: r.curriculum_key)
    stages = [r.stage for r in by_key]
    assert stages == sorted(stages), "key order must be stage-major"
    assert set(stages) == {1, 2, 3, 4}
    # difficulty is monotone across stages
    for lo in range(1, 4):
        hi_min = min(r.diff for r in out if r.stage == lo + 1)
        lo_max = max(r.diff for r in out if r.stage == lo)
        assert lo_max <= hi_min
    out2 = ops.curriculum_order(df, "diff", n_stages=4, seed=2, key="src")
    s1 = {r.doc_id: r.stage for r in out}
    s2 = {r.doc_id: r.stage for r in out2.collect()}
    assert s1 == s2, "seed must only reshuffle within stages"
    with pytest.raises(ValueError, match="n_stages"):
        ops.curriculum_order(df, "diff", n_stages=0)


# ---------------------------------------------------------------------
# JPEG baseline codec (round 8, VERDICT r7 item 2)
# ---------------------------------------------------------------------


def test_jpeg_roundtrip_gray_and_rgb():
    """encode→decode round-trips smooth gradients within tight JPEG
    error bounds, exact dims on non-multiple-of-8 images, flat color
    is lossless, and the stream is a real JFIF (SOI/APP0 magic)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    h, w = 13, 21
    gray = ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 5) % 256).astype(
        np.uint8
    )
    raw = J.encode_jpeg_baseline(gray, quality=90)
    assert raw[:3] == b"\xff\xd8\xff" and raw[6:10] == b"JFIF"
    d = J.decode_jpeg(raw)
    assert (d["width"], d["height"], d["channels"], d["mode"]) == (
        w, h, 1, "L",
    )
    err = np.abs(d["pixels"][:, :, 0].astype(int) - gray.astype(int))
    assert err.mean() < 2 and err.max() <= 10, (err.mean(), err.max())

    yy, xx = np.mgrid[0:24, 0:17]
    rgb = np.stack(
        [(yy * 9) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], axis=2
    ).astype(np.uint8)
    d2 = J.decode_jpeg(J.encode_jpeg_baseline(rgb, quality=92))
    assert (d2["width"], d2["height"], d2["channels"], d2["mode"]) == (
        17, 24, 3, "RGB",
    )
    err2 = np.abs(d2["pixels"].astype(int) - rgb.astype(int))
    assert err2.mean() < 2 and err2.max() <= 12, (err2.mean(), err2.max())

    flat = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    d3 = J.decode_jpeg(J.encode_jpeg_baseline(flat, quality=85))
    assert np.array_equal(d3["pixels"], flat)


def test_jpeg_subsampled_and_restart_markers():
    """4:2:0 streams decode through the replication upsampler within
    chroma-smooth error bounds; DRI/RSTn streams decode bit-identically
    to their marker-free twin (predictor reset + realign correct)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    yy, xx = np.mgrid[0:37, 0:29]
    img = np.stack(
        [
            (yy * 3 + xx * 2) % 200 + 20,
            (yy * 2 + 60) % 180 + 30,
            (xx * 2 + 80) % 150 + 40,
        ],
        axis=2,
    ).astype(np.uint8)
    raw = J.encode_jpeg_baseline(img, quality=90, subsample=True)
    d = J.decode_jpeg(raw)
    assert (d["width"], d["height"]) == (29, 37)
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() <= 16, (err.mean(), err.max())

    base = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=88))["pixels"]
    for ri in (1, 3, 7):
        got = J.decode_jpeg(
            J.encode_jpeg_baseline(img, quality=88, restart_interval=ri)
        )["pixels"]
        assert np.array_equal(base, got), f"restart_interval={ri}"
    # 4:2:0 with restarts too (multi-block MCUs + predictor resets)
    sub_base = J.decode_jpeg(
        J.encode_jpeg_baseline(img, quality=88, subsample=True)
    )["pixels"]
    sub_rst = J.decode_jpeg(
        J.encode_jpeg_baseline(
            img, quality=88, subsample=True, restart_interval=2
        )
    )["pixels"]
    assert np.array_equal(sub_base, sub_rst)


def test_jpeg_rejects_unsupported_and_truncated():
    """Arithmetic-coded (SOF9) raises naming the feature; a baseline
    stream relabeled SOF2 is structurally invalid as progressive
    (interleaved full-band scan) and raises rather than mis-decoding;
    truncated entropy data raises; all quarantine through
    image_features instead of failing the stage; decode_image
    dispatches on the JPEG magic."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
    raw = J.encode_jpeg_baseline(img, quality=85)
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(raw.replace(b"\xff\xc0", b"\xff\xc9", 1))
    # flip SOF0 (FFC0) to SOF2 (FFC2): the baseline SOS (ss=0,
    # se=63) is not a legal progressive DC scan band
    with pytest.raises(ValueError, match="invalid progressive DC"):
        J.decode_jpeg(raw.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(raw[: len(raw) - 8])
    # decode_image magic dispatch == direct decode
    d = mm.decode_image(raw)
    assert d["mode"] == "L" and d["width"] == 8 and d["bit_depth"] == 8
    assert np.array_equal(d["pixels"], J.decode_jpeg(raw)["pixels"])


def _mini_jpeg(ac_symbols: list, entropy: bytes) -> bytes:
    """Hand-assembled minimal 8×8 grayscale baseline JPEG with a
    CUSTOM AC Huffman table (two 1-bit codes: '0'→ac_symbols[0],
    '1'→ac_symbols[1]) and a 1-code DC table ('0'→size 0), so tests
    can emit AC symbols the standard tables cannot express."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + b"\x01" * 64)
    sof = seg(0xC0, b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00")
    dc_counts = bytes([1] + [0] * 15)
    dht_dc = seg(0xC4, b"\x00" + dc_counts + b"\x00")
    ac_counts = bytes([2] + [0] * 15)
    dht_ac = seg(0xC4, b"\x10" + ac_counts + bytes(ac_symbols))
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + entropy + b"\xff\xd9"
    )


def test_pdf_text_roundtrip_and_contracts():
    """PDF text extraction (round 9 — the document modality): writer
    → extractor roundtrips across compression, escapes, unicode
    (UTF-16BE), multi-page; the extractor's lenient object scan
    survives incremental-update-style duplicate objects; TJ kerning
    arrays and hex strings decode; quarantine contracts for
    non-PDF, encrypted, and unsupported-filter
    files."""
    import zlib

    from datasplash_spark.functions import pdf as P

    pages = [
        "hello world\nsecond line",
        "page two (with) \\ parens\nand\ttabs",
        "",
    ]
    for comp in (True, False):
        d = P.extract_pdf_text(P.encode_pdf_text(pages, compress=comp))
        assert d["n_pages"] == 3 and d["pages"] == pages, (comp, d)
        assert d["text"] == "\f".join(pages)
    uni = ["café 中文", "emoji \U0001F600 ok"]
    assert P.extract_pdf_text(P.encode_pdf_text(uni))["pages"] == uni

    # hand-built content stream: TJ with kerning (gap → space), hex
    # string, quote operator, T*
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Hel) -40 (lo) -400 (world)] TJ T* "
        b"<574F57> Tj "
        b"(next) ' ET"
    )
    raw = P.encode_pdf_text(["placeholder"], compress=False)
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    i = raw.index(b"stream")
    j = raw.index(b"endstream") + len(b"endstream")
    raw2 = raw[: raw.rindex(b"5 0 obj\n") + 8] + body + raw[j:]
    d = P.extract_pdf_text(raw2)
    # -40 ≤ kern threshold → no space; -400 → space; T* and ' break lines
    assert d["pages"] == ["Hello world\nWOW\nnext"], d["pages"]

    # incremental update: appending a NEW object 5 wins (later def)
    upd = P.encode_pdf_text(["old text"], compress=False)
    newc = b"BT /F1 12 Tf (new text) Tj ET"
    patch = b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
        len(newc), newc,
    )
    assert P.extract_pdf_text(upd + patch)["pages"] == ["new text"]

    with pytest.raises(ValueError, match="PDF header"):
        P.extract_pdf_text(b"not a pdf")
    enc = P.encode_pdf_text(["x"]).replace(
        b"/Root", b"/Encrypt 99 0 R /Root"
    )
    with pytest.raises(ValueError, match="encrypted"):
        P.extract_pdf_text(enc)
    # ... but a document whose TEXT merely mentions /Encrypt is fine
    # (round 10: detection moved from a raw-bytes scan to the
    # trailer / xref-stream dictionaries)
    ok = P.extract_pdf_text(
        P.encode_pdf_text(["about the /Encrypt key"], compress=False)
    )
    assert ok["pages"] == ["about the /Encrypt key"]
    # genuinely unknown filters still quarantine by name
    unk = P.encode_pdf_text(["x"], compress=True).replace(
        b"/FlateDecode", b"/JBIG2Decode"
    )
    with pytest.raises(ValueError, match="unsupported"):
        P.extract_pdf_text(unk)
    # corrupt Flate body quarantines, doesn't crash obscurely
    good = P.encode_pdf_text(["abc"], compress=True)
    k = good.index(b"stream\n", good.index(b"/FlateDecode")) + 7
    bad = good[:k] + bytes([good[k] ^ 0xFF]) + good[k + 1 :]
    with pytest.raises(ValueError, match="Flate"):
        P.extract_pdf_text(bad)
    # zlib sanity: the fixture's stream really is Flate
    assert zlib.decompress(
        good[k : good.index(b"\nendstream", k)]
    ).startswith(b"BT")


def test_pdf_scan_and_tm_regressions():
    """Round-10 scanner/heuristic hardening: (a) literal ``N 0 obj``
    bytes INSIDE a stream body must not spawn a phantom object that
    clobbers the real object N (the recovery scanner skips stream
    extents); (b) ``Tm`` breaks a line only when it moves DOWN the
    page — upward or same-line repositioning (kerned / positioned
    spans) must not insert spurious newlines."""
    from datasplash_spark.functions import pdf as P

    # (a) page text that lexes as a dict-valued object definition;
    # pre-fix it redefined object 4 (the page node) and broke the
    # page tree with ok=true-shaped garbage
    trap = "4 0 obj << /Type /Garbage >> endobj trap"
    d = P.extract_pdf_text(P.encode_pdf_text([trap], compress=False))
    assert d["pages"] == [trap]
    # same trap inside a Flate body (raw bytes after compression are
    # arbitrary; the plaintext path above is the deterministic one)
    d = P.extract_pdf_text(P.encode_pdf_text([trap], compress=True))
    assert d["pages"] == [trap]

    # (b) Tm sequence: first Tm never breaks, same-ty and upward
    # repositioning never break, downward breaks once
    content = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 720 Tm (a) Tj "
        b"1 0 0 1 200 720 Tm (b) Tj "
        b"1 0 0 1 300 750 Tm (c) Tj "
        b"1 0 0 1 72 700 Tm (d) Tj ET"
    )
    raw = P.encode_pdf_text(["placeholder"], compress=False)
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (
        len(content), content,
    )
    j = raw.index(b"endstream") + len(b"endstream")
    raw2 = raw[: raw.rindex(b"5 0 obj\n") + 8] + body + raw[j:]
    assert P.extract_pdf_text(raw2)["pages"] == ["abc\nd"]


def test_pdf_objstm_xref_and_filters():
    """PDF 1.5+ reader path (round 10): compressed object streams
    inflate and merge with offset-wins incremental-update semantics;
    xref-stream files extract; every filter the spec's text path
    uses decodes (LZW incl. the ISO 32000 worked example, ASCIIHex,
    ASCII85, RunLength, Flate) with DecodeParms predictors."""
    import zlib

    from datasplash_spark.functions import pdf as P

    pages = ["hello objstm\nline two", "page (2) \\ done", "", "café 中文"]
    for comp in (True, False):
        for filt in ("flate", "lzw"):
            raw = P.encode_pdf_text(
                pages, compress=comp, layout="objstm", filter_name=filt
            )
            assert raw[:8] == b"%PDF-1.5"
            d = P.extract_pdf_text(raw)
            assert d["n_pages"] == 4 and d["pages"] == pages, (comp, filt)

    # incremental update ACROSS layouts: a classic top-level object
    # appended AFTER an objstm file must beat the packed definition
    base = P.encode_pdf_text(["old text"], layout="objstm")
    newc = b"BT /F1 12 Tf (new text) Tj ET"
    # object 5 is the content stream in the 1-page objstm numbering
    patch = b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
        len(newc), newc,
    )
    assert P.extract_pdf_text(base + patch)["pages"] == ["new text"]
    # ...and an ObjStm appended after a classic file wins the other
    # way: pack a replacement PAGE dict pointing at a new stream
    cls = P.encode_pdf_text(["classic text"], compress=False)
    newc2 = b"BT /F1 12 Tf (swapped) Tj ET"
    inner = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 8 0 R >>"
    )
    header = b"4 0 "
    stm = zlib.compress(header + inner)
    objstm_obj = (
        b"7 0 obj\n<< /Length %d /Filter /FlateDecode /Type /ObjStm "
        b"/N 1 /First %d >>\nstream\n" % (len(stm), len(header))
        + stm + b"\nendstream\nendobj\n"
    )
    content_obj = (
        b"8 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(newc2), newc2)
    )
    assert P.extract_pdf_text(cls + objstm_obj + content_obj)["pages"] == [
        "swapped"
    ]

    # LZW: the ISO 32000 7.4.4 worked example, both directions
    assert P._lzw_decode(bytes.fromhex("800b6050220c0c8501")) == b"-----A---B"
    assert P._lzw_encode(b"-----A---B") == bytes.fromhex("800b6050220c0c8501")
    # width-boundary roundtrips (9→10→11→12 bits + table-full clear)
    blob = bytes((i * 131 + (i >> 3)) % 256 for i in range(90000))
    assert P._lzw_decode(P._lzw_encode(blob)) == blob
    # EarlyChange=0 pairing
    assert P._lzw_decode(P._lzw_encode(blob[:4000], 0), 0) == blob[:4000]

    # per-filter content-stream decode through the document path:
    # splice a filtered stream into object 5 of a classic file
    content = b"BT /F1 12 Tf (filtered) Tj ET"
    cases = {
        b"/ASCIIHexDecode": content.hex().encode() + b">",
        b"/ASCII85Decode": __import__("base64").a85encode(content) + b"~>",
        b"/RunLengthDecode": bytes([len(content) - 1]) + content + b"\x80",
        b"/LZWDecode": P._lzw_encode(content),
    }
    for fname, data in cases.items():
        raw = P.encode_pdf_text(["placeholder"], compress=False)
        body = (
            b"<< /Length %d /Filter %s >>\nstream\n" % (len(data), fname)
            + data + b"\nendstream"
        )
        j = raw.index(b"endstream") + len(b"endstream")
        raw2 = raw[: raw.rindex(b"5 0 obj\n") + 8] + body + raw[j:]
        assert P.extract_pdf_text(raw2)["pages"] == ["filtered"], fname

    # predictors: PNG Sub/Up/Average/Paeth + TIFF undo correctness
    rows = [bytes([(i * 37 + r * 11) % 256 for i in range(6)]) for r in range(4)]
    flat = b"".join(rows)
    for pnum, name in ((10, "None"), (12, "Up")):
        enc = bytearray()
        prev = bytes(6)
        for r in rows:
            if pnum == 12:
                enc.append(2)
                enc += bytes((r[j] - prev[j]) & 0xFF for j in range(6))
            else:
                enc.append(0)
                enc += r
            prev = r
        got = P._predictor_undo(
            bytes(enc), {"Predictor": pnum, "Columns": 6}
        )
        assert got == flat, name
    tif = bytearray(flat)
    for r in range(4):
        for j in range(5, 0, -1):
            tif[r * 6 + j] = (tif[r * 6 + j] - tif[r * 6 + j - 1]) & 0xFF
    assert P._predictor_undo(
        bytes(tif), {"Predictor": 2, "Columns": 6}
    ) == flat


def test_pdf_corpus_path(spark):
    """The Spark surface: synthesize_pdf_from_text emits real
    multi-page PDFs per doc; pdf_text_features extracts typed rows
    with per-doc quarantine; reassembling the page round-robin
    recovers every word of the source text; sniff_media_type routes
    'pdf'."""
    from datasplash_spark.functions import pdf as P

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, ""),
        (3, "one two three four five six seven eight nine"),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    media = P.synthesize_pdf_from_text(df)
    got = {r.doc_id: r for r in media.collect()}
    for did, t in rows:
        assert got[did].n_pages == 1 + len(t) % 3, did
    assert {
        r.doc_id: r.kind
        for r in media.select(
            "doc_id", mm.sniff_media_type("media").alias("kind")
        ).collect()
    } == {1: "pdf", 2: "pdf", 3: "pdf"}

    feats = {r.doc_id: r for r in P.pdf_text_features(media).collect()}
    for did, t in rows:
        r = feats[did]
        assert r.ok and r.n_pages == 1 + len(t) % 3, (did, r)
        # round-robin reassembly recovers the original word sequence
        pages = [p.split(" ") for p in r.text.split("\f")]
        n = len(pages)
        words = []
        for i in range(max(len(p) for p in pages)):
            for p in pages:
                if i < len(p):
                    words.append(p[i])
        assert [w for w in words if w] == [w for w in t.split(" ") if w], did

    poison = df.limit(1).select(
        "doc_id", F.lit(bytearray(b"%PDF-1.4 broken")).alias("media")
    )
    pr = P.pdf_text_features(poison).collect()[0]
    assert pr.ok is False and pr.err


def test_gif_bmp_roundtrip_and_contracts():
    """GIF + BMP codecs (round 9 — closes the detected-but-
    undecodable gap behind sniff_media_type): lossless roundtrips
    across shapes, interlace, palettes, top-down/bottom-up rows;
    LZW dictionary growth + reset on a full table; GCE transparency
    → RGBA; animated files decode frame ONE and report n_frames;
    truncation and unsupported-feature quarantine contracts."""
    import struct

    import numpy as np

    from datasplash_spark.functions import gifbmp as gb

    rng = np.random.RandomState(11)
    # BMP: 24-bit color, 8-bit gray palette, both row orders, padding
    for shape in [(8, 8, 3), (13, 23, 3), (7, 9)]:
        for td in (False, True):
            img = rng.randint(0, 256, shape).astype(np.uint8)
            d = gb.decode_bmp(gb.encode_bmp(img, top_down=td))
            exp = img if img.ndim == 3 else img[:, :, None]
            assert np.array_equal(d["pixels"], exp), (shape, td)
            assert (d["width"], d["height"]) == (shape[1], shape[0])
    # GIF: palette roundtrips, interlace, 256 colors, dict reset
    for shape in [(8, 8), (13, 23), (31, 17)]:
        base = (rng.randint(0, 6, shape) * 40).astype(np.uint8)
        for il in (False, True):
            d = gb.decode_gif(gb.encode_gif(base, interlace=il))
            assert d["mode"] == "RGB" and d["n_frames"] == 1
            assert np.array_equal(d["pixels"][:, :, 0], base), (shape, il)
    full = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(
        gb.decode_gif(gb.encode_gif(full))["pixels"][:, :, 0], full
    )
    big = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    assert np.array_equal(
        gb.decode_gif(gb.encode_gif(big))["pixels"][:, :, 0], big
    )
    # animated: duplicate the image block → frame 1 decoded, count 2
    one = gb.encode_gif((rng.randint(0, 4, (9, 11)) * 80).astype(np.uint8))
    img_start = one.index(b"\x2c", 13)
    anim = one[:-1] + one[img_start:-1] + b"\x3b"
    d = gb.decode_gif(anim)
    assert d["n_frames"] == 2
    assert np.array_equal(
        d["pixels"], gb.decode_gif(one)["pixels"]
    )
    # transparency: inject a GCE marking index 0 transparent
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    trans = one[:img_start] + gce + one[img_start:]
    d = gb.decode_gif(trans)
    assert d["mode"] == "RGBA" and d["channels"] == 4
    grid0 = gb.decode_gif(one)["pixels"][:, :, 0] == 0
    assert np.array_equal(d["pixels"][:, :, 3] == 0, grid0)
    # truncated INSIDE the GCE (size byte present, payload cut):
    # ValueError per the quarantine contract, never IndexError
    for cut in range(1, 5):
        with pytest.raises(ValueError, match="truncated"):
            gb.decode_gif(one[:img_start] + gce[: 2 + cut])
    # quarantine contracts
    with pytest.raises(ValueError, match="truncated"):
        gb.decode_gif(one[: len(one) // 2])
    bmp = gb.encode_bmp(rng.randint(0, 256, (10, 10, 3)).astype(np.uint8))
    with pytest.raises(ValueError, match="truncated pixel data"):
        gb.decode_bmp(bmp[:-20])
    rle4 = bytearray(bmp)
    rle4[30:34] = struct.pack("<I", 2)  # BI_RLE4: still unsupported
    with pytest.raises(ValueError, match="compression"):
        gb.decode_bmp(bytes(rle4))
    rle8on24 = bytearray(bmp)
    rle8on24[30:34] = struct.pack("<I", 1)  # RLE8 on a 24-bit image
    with pytest.raises(ValueError, match="8-bit"):
        gb.decode_bmp(bytes(rle8on24))
    # BI_RLE8 proper (round 10): lossless roundtrip across run-heavy,
    # absolute-heavy, and mixed rows; truncation quarantines
    for img8 in (
        np.repeat(rng.randint(0, 4, (6, 3)), 4, axis=1).astype(np.uint8) * 60,
        (np.arange(35).reshape(5, 7) % 256).astype(np.uint8),
        rng.randint(0, 256, (16, 13)).astype(np.uint8),
    ):
        d8 = gb.decode_bmp(gb.encode_bmp_rle8(img8))
        assert d8["mode"] == "L"
        assert np.array_equal(d8["pixels"][:, :, 0], img8)
    with pytest.raises(ValueError, match="RLE8|truncated"):
        gb.decode_bmp(gb.encode_bmp_rle8(img8)[:-30])
    # decode_image dispatch + cross-format parity vs PNG
    img = rng.randint(0, 256, (12, 20, 3)).astype(np.uint8)
    via_bmp = mm.decode_image(gb.encode_bmp(img))
    via_png = mm.decode_image(mm.encode_png(img))
    assert np.array_equal(via_bmp["pixels"], via_png["pixels"])
    gray = (rng.randint(0, 5, (12, 20)) * 50).astype(np.uint8)
    via_gif = mm.decode_image(gb.encode_gif(gray))
    assert np.array_equal(
        via_gif["pixels"][:, :, 0],
        mm.decode_image(mm.encode_png(gray))["pixels"][:, :, 0],
    )


def test_tiff_codec_and_corpus_path(spark):
    """TIFF baseline codec (round 10 — completes the still-image
    container family): lossless roundtrips across gray/RGB/RGBA,
    both byte orders, single/multi strip, compressions
    none/LZW/PackBits, and the horizontal-differencing predictor;
    WhiteIsZero inverts; multi-page chains report n_pages; unsupported
    features quarantine by name; sniff routes 'tiff' and the corpus
    synthesizer + image_features carry it end-to-end."""
    import struct

    import numpy as np

    from datasplash_spark.functions import tiff as T

    rng = np.random.RandomState(5)
    for shape, ch in [((6, 9), None), ((13, 7), 3), ((8, 8), 4)]:
        img = rng.randint(
            0, 256, shape + ((ch,) if ch else ())
        ).astype(np.uint8)
        for comp in ("none", "lzw", "packbits"):
            for be in (False, True):
                raw = T.encode_tiff(
                    img, compression=comp, big_endian=be, rows_per_strip=4
                )
                d = mm.decode_image(raw)
                exp = img if ch else img[:, :, None]
                assert np.array_equal(d["pixels"], exp), (shape, comp, be)
    # predictor-2 LZW (the scanned-document default)
    img = rng.randint(0, 256, (10, 12, 3)).astype(np.uint8)
    d = mm.decode_image(T.encode_tiff(img, compression="lzw", predictor=True))
    assert np.array_equal(d["pixels"], img)
    # WhiteIsZero: photometric 0 inverts
    g = rng.randint(0, 256, (4, 4)).astype(np.uint8)
    raw = bytearray(T.encode_tiff(g))
    i = raw.index(struct.pack("<HHI", 262, 3, 1))
    raw[i + 8] = 0
    assert np.array_equal(
        T.decode_tiff(bytes(raw))["pixels"][:, :, 0], 255 - g
    )
    # multi-page: the scanned-document shape — first page decodes,
    # n_pages reports the chain length
    one = T.encode_tiff(g)
    assert T.decode_tiff(one)["n_pages"] == 1
    g2 = rng.randint(0, 256, (6, 5)).astype(np.uint8)
    multi = T.encode_tiff_multipage([g, g2, g], compression="packbits")
    d = T.decode_tiff(multi)
    assert d["n_pages"] == 3
    assert np.array_equal(d["pixels"][:, :, 0], g)  # first page
    # quarantine contracts
    with pytest.raises(ValueError, match="magic"):
        T.decode_tiff(b"II\x2b\x00" + b"\x00" * 8)  # BigTIFF
    with pytest.raises(ValueError, match="truncated"):
        T.decode_tiff(one[:40])
    bad = bytearray(one)
    j = bad.index(struct.pack("<HHI", 259, 3, 1))
    bad[j + 8] = 6  # JPEG-in-TIFF
    with pytest.raises(ValueError, match="compression 6"):
        T.decode_tiff(bytes(bad))
    # sniff + features corpus path
    rows = [
        (1, bytearray(T.encode_tiff(g, compression="lzw"))),
        (2, bytearray(T.encode_tiff(g, big_endian=True))),
    ]
    df = generate_input(spark, rows, "doc_id bigint, media binary")
    assert {
        r.t for r in df.select(
            mm.sniff_media_type("media").alias("t")
        ).collect()
    } == {"tiff"}
    feats = {r.doc_id: r for r in mm.image_features(df).collect()}
    for did in (1, 2):
        assert feats[did].ok and (feats[did].width, feats[did].height) == (4, 4)
        assert feats[did].mode == "L"


def test_gif_animation_compositing():
    """decode_gif_frames (round 10): full-frame animations roundtrip
    losslessly frame by frame; sub-rectangle frames composite at
    their offsets; per-frame transparency leaves the canvas
    untouched; disposal 2 clears the frame rect, disposal 3 restores
    the pre-frame canvas; every_n sampling keeps indices 0, n, 2n;
    n_frames agrees with decode_gif; frames outside the logical
    screen quarantine."""
    import numpy as np

    from datasplash_spark.functions import gifbmp as gb

    # full-frame animation: each composite equals its frame exactly
    fr = [
        ((np.arange(64).reshape(8, 8) * 3 + 7 * f) % 256).astype(np.uint8)
        for f in range(5)
    ]
    raw = gb.encode_gif_animation(fr)
    outs = gb.decode_gif_frames(raw)
    assert [o["frame_idx"] for o in outs] == [0, 1, 2, 3, 4]
    assert outs[0]["n_frames"] == 5 == gb.decode_gif(raw)["n_frames"]
    for f, o in zip(fr, outs):
        assert (o["width"], o["height"]) == (8, 8)
        assert np.array_equal(o["pixels"][:, :, 0], f)
        assert (o["pixels"][:, :, 3] == 255).all()
    assert [o["frame_idx"] for o in gb.decode_gif_frames(raw, 2)] == [0, 2, 4]

    # offsets + transparency + disposal 2
    base = np.full((6, 6, 3), 10, dtype=np.uint8)
    patch = np.zeros((2, 2, 4), dtype=np.uint8)
    patch[:, :, :3] = 200
    patch[:, :, 3] = 255
    patch[0, 0, 3] = 0  # one transparent pixel
    raw2 = gb.encode_gif_animation(
        [base, patch, patch],
        offsets=[(0, 0), (2, 2), (4, 4)],
        disposals=[1, 2, 1],
    )
    p1, p2 = (o["pixels"] for o in gb.decode_gif_frames(raw2)[1:])
    assert p1[2, 2, 0] == 10  # transparent pixel shows the base
    assert p1[3, 3, 0] == 200 and p1[2, 3, 0] == 200
    assert p2[2, 2, 3] == 0 and p2[3, 3, 3] == 0  # disposal-2 clear
    assert p2[0, 0, 0] == 10 and p2[5, 5, 0] == 200

    # disposal 3: restore-to-previous
    f0 = np.full((4, 4, 3), 50, dtype=np.uint8)
    f1 = np.full((2, 2, 3), 99, dtype=np.uint8)
    f2 = np.full((1, 1, 3), 77, dtype=np.uint8)
    o3 = gb.decode_gif_frames(
        gb.encode_gif_animation(
            [f0, f1, f2], offsets=[(0, 0), (1, 1), (0, 0)],
            disposals=[1, 3, 1],
        )
    )
    assert o3[1]["pixels"][1, 1, 0] == 99
    assert o3[2]["pixels"][1, 1, 0] == 50  # f1 undone by disposal 3
    assert o3[2]["pixels"][0, 0, 0] == 77

    # frame exceeding the logical screen: strict quarantine
    hdr = gb.encode_gif_animation([f0])
    # shrink the declared screen to 2x2 (bytes 6-9 little-endian)
    bad = hdr[:6] + b"\x02\x00\x02\x00" + hdr[10:]
    with pytest.raises(ValueError, match="logical screen"):
        gb.decode_gif_frames(bad)


def test_video_frame_features_routes_gif(spark):
    """video_frame_features sniffs the container per row: a mixed
    media column of MJPEG streams and animated GIFs decodes both
    paths in one pass, GIF rows carrying exact (lossless) px_sum and
    canvas dims, MJPEG rows their decoded-JPEG px_sum; poison rows
    quarantine per stream."""
    import numpy as np

    from datasplash_spark.functions import gifbmp as gb
    from datasplash_spark.functions import jpeg as J

    img = (np.arange(64).reshape(8, 8) * 3).astype(np.uint8)
    gif = gb.encode_gif_animation([img, (img + 5) % 256])
    mj = J.encode_jpeg_baseline(img) + J.encode_jpeg_baseline(img)
    rows = [
        (1, bytearray(gif)),
        (2, bytearray(mj)),
        (3, bytearray(b"GIF89a\x02")),  # truncated gif
    ]
    df = generate_input(spark, rows, "doc_id bigint, media binary")
    got = {
        (r.doc_id, r.frame_idx): r
        for r in mm.video_frame_features(df, every_n=1).collect()
    }
    g0 = got[(1, 0)]
    assert g0.n_frames == 2 and g0.mode == "RGBA" and g0.ok
    want0 = int(img.astype(np.int64).sum()) * 3 + 64 * 255
    assert g0.px_sum == want0
    g1 = got[(1, 1)]
    assert g1.px_sum == int(((img.astype(np.int64) + 5) % 256).sum()) * 3 + 64 * 255
    m0 = got[(2, 0)]
    assert m0.ok and m0.n_frames == 2 and m0.px_sum is not None
    bad = got[(3, -1)]
    assert not bad.ok and "gif" in bad.err


def test_gif_bmp_through_image_features(spark):
    """The corpus path: GIF and BMP media rows decode through
    image_features next to PNG/JPEG, dims + ok per row; sniffing
    routes them; aHash works on the palette-expanded pixels (a GIF
    and a PNG of the SAME pixels hash identically)."""
    import numpy as np

    from datasplash_spark.functions import gifbmp as gb

    rng = np.random.RandomState(23)
    rgb = rng.randint(0, 256, (12, 20, 3)).astype(np.uint8)
    pal = (rng.randint(0, 7, (12, 20)) * 36).astype(np.uint8)
    df = generate_input(
        spark,
        [
            (1, bytearray(gb.encode_bmp(rgb))),
            (2, bytearray(gb.encode_gif(pal, interlace=True))),
            (3, bytearray(mm.encode_png(pal))),
            (4, bytearray(b"BMnot really a bmp")),
        ],
        "doc_id bigint, media binary",
    )
    got = {r.doc_id: r for r in mm.image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mode, got[1].ok) == (
        20, 12, "RGB", True,
    )
    assert (got[2].width, got[2].height, got[2].ok) == (20, 12, True)
    assert got[4].ok is False
    sniff = {
        r.doc_id: r.kind
        for r in df.select(
            "doc_id", mm.sniff_media_type("media").alias("kind")
        ).collect()
    }
    assert sniff[1] == "bmp" and sniff[2] == "gif" and sniff[3] == "png"
    hashes = {
        r.doc_id: r.ahash for r in mm.image_ahash(df).collect() if r.ahash
    }
    assert hashes[2] == hashes[3]  # same pixels, GIF vs PNG

    # synthetic-corpus path: 'gif' and 'bmp' are LOSSLESS grayscale,
    # so their decode must match pngL of the same text exactly
    texts = [(1, "alpha beta"), (2, ""), (3, "z" * 33)]
    tdf = generate_input(spark, texts, "doc_id bigint, text string")
    ref = {
        r.doc_id: (r.px_sum, r.ahash)
        for r in mm.image_ahash(
            mm.synthesize_image_from_text(tdf, fmt="pngL")
        ).collect()
    }
    for fmt in ("gif", "bmp"):
        got = {
            r.doc_id: (r.px_sum, r.ahash)
            for r in mm.image_ahash(
                mm.synthesize_image_from_text(tdf, fmt=fmt)
            ).collect()
        }
        assert got == ref, fmt


def test_jpeg_progressive_roundtrip_bit_identical():
    """Progressive (SOF2) decode — round 9: for every pixel corpus,
    quality, and sampling layout, decoding the progressive encoding
    is BIT-IDENTICAL to decoding the baseline encoding of the same
    pixels (both paths share the DCT/quant front half, so any
    mismatch is an entropy-coding bug). Covers both scan scripts —
    successive approximation (all four scan kinds: DC/AC first at
    Al=1 plus DC/AC refinement) and pure spectral selection — and
    restart intervals (per-segment DC-predictor/EOB-run resets)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    rng = np.random.RandomState(42)
    cases = [
        (np.full((8, 8), 128, np.uint8), False),
        ((np.arange(64).reshape(8, 8) * 3.9).astype(np.uint8), False),
        (rng.randint(0, 256, (17, 24)).astype(np.uint8), False),
        (rng.randint(0, 256, (16, 16, 3)).astype(np.uint8), False),
        (rng.randint(0, 256, (13, 23, 3)).astype(np.uint8), True),
        ((np.eye(40) * 255).astype(np.uint8), False),
    ]
    for img, sub in cases:
        for q in (30, 85, 95):
            want = J.decode_jpeg(
                J.encode_jpeg_baseline(img, quality=q, subsample=sub)
            )["pixels"]
            for succ in (True, False):
                prog = J.encode_jpeg_progressive(
                    img, quality=q, subsample=sub, successive=succ
                )
                assert prog[3] == 0xE0 and b"\xff\xc2" in prog
                got = J.decode_jpeg(prog)
                assert np.array_equal(got["pixels"], want), (
                    img.shape, sub, q, succ,
                )
    # restart markers inside progressive scans
    img = rng.randint(0, 256, (13, 23, 3)).astype(np.uint8)
    want = J.decode_jpeg(
        J.encode_jpeg_baseline(img, quality=80, subsample=True)
    )["pixels"]
    for ri in (1, 3):
        for succ in (True, False):
            got = J.decode_jpeg(
                J.encode_jpeg_progressive(
                    img, quality=80, subsample=True,
                    successive=succ, restart_interval=ri,
                )
            )["pixels"]
            assert np.array_equal(got, want), (ri, succ)


def test_jpeg_progressive_truncation_and_corpus(spark):
    """Progressive streams quarantine on truncation like baseline
    (missing refinement scans mid-file → truncated-segment error;
    chopped entropy → truncated-entropy error), and the synthetic
    corpus path decodes 'jpegP' media through image_features with
    pixel values matching the 'jpeg' encoding of the same text."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    img = np.arange(0, 192, 3, dtype=np.uint8).reshape(8, 8)
    prog = J.encode_jpeg_progressive(img, quality=85)
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(prog[: len(prog) // 2])

    # a progressive file cut after its FIRST scan still renders (the
    # libjpeg partial-render posture): append EOI after scan 1
    first_sos = prog.index(b"\xff\xda")
    second_sos = prog.index(b"\xff\xda", first_sos + 2)
    partial = prog[:second_sos] + b"\xff\xd9"
    d = J.decode_jpeg(partial)
    assert (d["width"], d["height"]) == (8, 8)  # DC-only preview

    texts = [(1, "alpha beta gamma"), (2, ""), (3, "x" * 40)]
    tdf = generate_input(spark, texts, "doc_id bigint, text string")
    for fmt in ("jpeg", "jpegP"):
        media = mm.synthesize_image_from_text(tdf, fmt=fmt)
        rows = {r.doc_id: r for r in mm.image_features(media).collect()}
        assert all(r.ok for r in rows.values()), (fmt, rows)
    # pixel-level parity between the two encodings of the same text
    jb = {
        r.doc_id: bytes(r.media)
        for r in mm.synthesize_image_from_text(tdf, fmt="jpeg").collect()
    }
    jp = {
        r.doc_id: bytes(r.media)
        for r in mm.synthesize_image_from_text(tdf, fmt="jpegP").collect()
    }
    for did in jb:
        assert np.array_equal(
            J.decode_jpeg(jb[did])["pixels"],
            J.decode_jpeg(jp[did])["pixels"],
        ), did


def test_jpeg_progressive_long_eob_run_decodes():
    """The progressive AC decoder handles EOB runs covering MULTIPLE
    blocks (symbols 0x10..0xE0 with extra bits) — our encoder caps
    runs at one block (standard Annex-K tables lack the run symbols)
    so this path needs a hand-assembled fixture: a 16×8 grayscale
    SOF2 stream whose single AC scan opens with run symbol 0x10 +
    extra bit 0 → EOB run of 2 = both blocks, all-zero band."""
    import struct

    import numpy as np

    from datasplash_spark.functions import jpeg as J

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + b"\x01" * 64)
    sof = seg(0xC2, b"\x08" + struct.pack(">HH", 8, 16) + b"\x01\x01\x11\x00")
    dht_dc = seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    # AC codes: '0' -> 0x10 (EOB run, r=1), '1' -> 0x00 (EOB run of 1)
    dht_ac = seg(0xC4, b"\x10" + bytes([2] + [0] * 15) + bytes([0x10, 0x00]))
    sos_dc = seg(0xDA, b"\x01\x01\x00\x00\x00\x00")
    ent_dc = bytes([0b00111111])  # two size-0 DC diffs, pad 1s
    sos_ac = seg(0xDA, b"\x01\x01\x00\x01\x3f\x00")
    ent_ac = bytes([0b00111111])  # symbol '0' (run=2) + extra bit 0, pad
    raw = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac
        + sos_dc + ent_dc + sos_ac + ent_ac + b"\xff\xd9"
    )
    d = J.decode_jpeg(raw)
    assert (d["width"], d["height"], d["mode"]) == (16, 8, "L")
    assert np.all(d["pixels"] == 128)  # DC 0 + empty band everywhere


def test_jpeg_strict_ac_symbol_and_multiscan_contracts():
    """Corrupt-stream strictness (ADVICE r8): a size-0 AC symbol
    other than EOB/ZRL raises instead of masquerading as EOB; a ZRL
    that pushes the coefficient index past 63 raises; and baseline
    NON-INTERLEAVED (multi-scan) files — fewer scan components than
    frame components per SOS — decode bit-identically to the
    interleaved encoding instead of quarantining (round 9: the scan
    accumulation store closed the last structural baseline gap)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    # '0'→0x30 (run 3, size 0 — illegal), '1'→EOB; bits: DC '0',
    # AC '0' → must raise, not EOB-and-decode-garbage
    bad_sym = _mini_jpeg([0x30, 0x00], bytes([0b00111111]))
    with pytest.raises(ValueError, match="invalid AC symbol"):
        J.decode_jpeg(bad_sym)

    # '0'→ZRL, '1'→EOB; bits: DC '0' then 4 ZRLs → k = 1+64 > 63
    zrl_over = _mini_jpeg([0xF0, 0x00], bytes([0b00000111]))
    with pytest.raises(ValueError, match="AC index out of range"):
        J.decode_jpeg(zrl_over)

    # sanity: the same skeleton with a LEGAL stream decodes — DC '0'
    # (diff 0) + EOB ('1') → flat gray 128 (qt all-ones)
    ok = _mini_jpeg([0xF0, 0x00], bytes([0b01111111]))
    d = J.decode_jpeg(ok)
    assert d["mode"] == "L" and (d["width"], d["height"]) == (8, 8)
    assert np.all(d["pixels"] == 128)

    # non-interleaved sequential: one SOS per component, decoded
    # through the scan-accumulation store — pixels bit-identical to
    # the interleaved encoding of the same image, truncation (a
    # missing final scan still renders the scanned components, a
    # chopped entropy segment raises)
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (13, 23, 3)).astype(np.uint8)
    for sub in (False, True):
        want = J.decode_jpeg(
            J.encode_jpeg_baseline(rgb, quality=90, subsample=sub)
        )["pixels"]
        ni = J.encode_jpeg_baseline(
            rgb, quality=90, subsample=sub, interleaved=False
        )
        assert ni.count(b"\xff\xda") == 3
        assert np.array_equal(J.decode_jpeg(ni)["pixels"], want), sub
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(ni[: ni.index(b"\xff\xda", 2) + 40])
    # cut after the SECOND scan + EOI: Y+Cb rendered, Cr plane zeros
    third = ni.index(
        b"\xff\xda", ni.index(b"\xff\xda", ni.index(b"\xff\xda") + 2) + 2
    )
    partial = J.decode_jpeg(ni[:third] + b"\xff\xd9")
    assert partial["mode"] == "RGB" and partial["pixels"].shape == (13, 23, 3)


def test_image_features_mixed_png_jpeg_corpus(spark):
    """image_features over a MIXED corpus — PNG, 4:4:4 JPEG, 4:2:0
    JPEG, PROGRESSIVE JPEG (decodes since round 9), arithmetic-coded
    poison — extracts real dims per format with the quarantine
    contract intact."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    rgb = np.tile(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3), (3, 5, 1)
    )  # 12x20x3
    png = mm.encode_png(rgb)
    j444 = J.encode_jpeg_baseline(rgb, quality=90)
    j420 = J.encode_jpeg_baseline(rgb, quality=90, subsample=True)
    jprog = J.encode_jpeg_progressive(rgb, quality=90)
    # SOF9 = arithmetic-coded sequential: a real still-unsupported tail
    poison = j444.replace(b"\xff\xc0", b"\xff\xc9", 1)
    df = generate_input(
        spark,
        [
            (1, bytearray(png)),
            (2, bytearray(j444)),
            (3, bytearray(j420)),
            (4, bytearray(jprog)),
            (5, bytearray(poison)),
        ],
        "doc_id bigint, media binary",
    )
    got = {r.doc_id: r for r in mm.image_features(df).collect()}
    for did in (1, 2, 3, 4):
        r = got[did]
        assert (r.width, r.height, r.channels, r.mode, r.ok) == (
            20, 12, 3, "RGB", True,
        ), r
    assert got[5].ok is False and "non-baseline" in got[5].err


def test_readability_scores_formula(spark):
    """readability_scores: hand-counted words/sentences/vowel-group
    syllables and the exact Flesch value; zero-denominator rows
    yield null flesch."""
    rows = [
        (1, "The cat sat. It purred! Good?"),
        (2, "no terminators here"),
        (3, ""),
    ]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    rs = tx.readability_scores("text")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            rs["n_words"].alias("w"),
            rs["n_sentences"].alias("s"),
            rs["n_syllables"].alias("y"),
            rs["flesch"].alias("f"),
        ).collect()
    }
    # doc 1: words The,cat,sat,It,purred,Good=6; sents=3 (., !, ?);
    # syllables: e,a,a,I,u+e(2),oo -> 7 vowel groups
    assert (got[1].w, got[1].s, got[1].y) == (6, 3, 7)
    expect = round(206.835 - 1.015 * 6 / 3 - 84.6 * 7 / 6, 4)
    assert abs(got[1].f - expect) < 1e-9
    assert got[2].s == 0 and got[2].f is None
    assert got[3].w == 0 and got[3].f is None


def test_word_paragraphs_and_dedup(spark):
    """word_paragraphs chunks exactly (ragged tail); dedup_paragraphs
    keeps the smallest (doc_id, para_idx) occurrence per identical
    paragraph corpus-wide and nothing else."""
    a = " ".join(f"w{i}" for i in range(25))          # 3 paras (10/10/5)
    b = " ".join(f"w{i}" for i in range(10)) + " unique tail"
    rows = [(1, a), (2, b), (3, a)]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    paras = df.select(
        "doc_id", dd.word_paragraphs("text", 10).alias("ps")
    ).collect()
    by_id = {r.doc_id: r.ps for r in paras}
    assert len(by_id[1]) == 3 and by_id[1][2] == " ".join(
        f"w{i}" for i in range(20, 25)
    )
    occ = dd.dedup_paragraphs(df, dd.word_paragraphs("text", 10))
    got = {(r.doc_id, r.para_idx): r.keep for r in occ.collect()}
    # doc1 all first occurrences; doc3 (same text) all dropped
    assert got[(1, 0)] and got[(1, 1)] and got[(1, 2)]
    assert not got[(3, 0)] and not got[(3, 1)] and not got[(3, 2)]
    # doc2 para0 == doc1 para0 -> dropped; its ragged tail is novel
    assert not got[(2, 0)] and got[(2, 1)]


def test_synthesize_image_formats_and_ahash(spark):
    """synthesize_image_from_text emits real PNG/JPEG containers per
    the fmt column; image_features passthrough carries fmt without a
    join; image_ahash is exact on the lossless gray path and handles
    RGB via floor-mean + resize; poison rows quarantine."""
    import numpy as np

    rows = [(2, "hello world"), (3, "spark"), (4, "x" * 100)]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    fmt = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("jpeg420"))
        .when(F.col("doc_id") % 2 == 0, F.lit("jpeg"))
        .otherwise(F.lit("png"))
    )
    media = mm.synthesize_image_from_text(df, fmt=fmt)
    feats = {
        r.doc_id: r
        for r in mm.image_features(media, passthrough=["fmt"]).collect()
    }
    for did, t in rows:
        r = feats[did]
        assert r.ok and (r.width, r.height) == (
            8 + len(t) % 9, 8 + len(t) % 7,
        )
        want_fmt = (
            "jpeg420" if did % 4 == 0 else "jpeg" if did % 2 == 0 else "png"
        )
        assert r.fmt == want_fmt
        assert (r.mode, r.channels) == (
            ("L", 1) if did % 2 == 0 else ("RGB", 3)
        )
    # gray 8x8 PNG -> ahash replays the pixel formula exactly
    g = mm.synthesize_image_from_text(df, fmt="pngL", size=(8, 8))
    got = {r.doc_id: r for r in mm.image_ahash(g).collect()}
    for did, t in rows:
        cps = np.zeros(64, dtype=np.int64)
        m = min(len(t), 64)
        cps[:m] = [ord(c) for c in t[:64]]
        px = ((cps + 1) * 2654435761) % 256
        s = int(px.sum())
        bits = "".join("1" if int(v) * 64 > s else "0" for v in px)
        assert (got[did].px_sum, got[did].ahash) == (s, bits), did
    # RGB path: flat color -> mean below-or-equal everywhere -> all 0
    flat = mm.encode_png(np.full((16, 12, 3), 77, dtype=np.uint8))
    one = generate_input(
        spark, [(9, bytearray(flat))], "doc_id bigint, media binary"
    )
    r9 = mm.image_ahash(one).collect()[0]
    assert r9.ok and r9.ahash == "0" * 64 and r9.px_sum == 77 * 64
    # poison
    bad = generate_input(
        spark, [(8, bytearray(b"nope"))], "doc_id bigint, media binary"
    )
    rb = mm.image_ahash(bad).collect()[0]
    assert rb.ok is False and rb.err


def _store_manifest(root):
    """relative path -> (size, md5) for every data file in a store."""
    import hashlib
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_SUCCESS", ".", "_temporary")):
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as fh:
                out[rel] = (os.path.getsize(p), hashlib.md5(fh.read()).hexdigest())
    return out


@pytest.mark.slow  # 23 s; append parity is default-gated by
# test_append_ivf_matches_full_build — this is the partial-commit
# crash-window self-heal stress
def test_append_ivf_crash_window_self_heal(spark, tmp_path):
    """ANN-store ledger discipline (VERDICT r7 item 7, the streaming
    admitters' contract extended to batch appends): replaying an
    already-committed append leaves the store BYTE-identical (the
    id anti-join admits nothing, so nothing is written), and a
    PARTIALLY committed append (crash mid-commit: some part files
    present, some lost) heals on replay — only the missing ids land,
    converging to the exact full-build row set. Covers the plain and
    quantized layouts."""
    import os
    import random

    rng = random.Random(11)
    mk = lambda i: (i, [rng.uniform(-1, 1) for _ in range(8)])
    a = [mk(i) for i in range(40)]
    b = [mk(100 + i) for i in range(20)]
    dfa = generate_input(spark, a, "vec_id bigint, embedding array<double>")
    dfb = generate_input(spark, b, "vec_id bigint, embedding array<double>")
    for quant in (False, True):
        p = str(tmp_path / f"ivf_heal_{quant}")
        cents = sim.materialize_ivf(dfa, p, n_cells=4, quantize=quant)
        sim.append_ivf(dfb, p)
        clean = _store_manifest(p)
        # replay of the committed append: byte-identical, zero files
        sim.append_ivf(dfb, p)
        assert _store_manifest(p) == clean, "replay wrote into the store"
        # crash window: lose ONE committed part file of the append,
        # replay — only the lost ids are re-admitted
        appended = spark.read.parquet(p)
        lost_file = next(
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
            # pick a file holding appended (>=100) ids so the damage
            # is in the append, not the base
            and any(
                r.vec_id >= 100
                for r in spark.read.parquet(os.path.join(dp, f)).collect()
            )
        )
        os.remove(lost_file)
        n_after_crash = spark.read.parquet(p).count()
        assert n_after_crash < 60
        sim.append_ivf(dfb, p)
        healed_ids = sorted(
            r.vec_id for r in spark.read.parquet(p).select("vec_id").collect()
        )
        assert healed_ids == sorted(
            [i for i, _ in a] + [i for i, _ in b]
        ), f"quant={quant}"
        # second replay after the heal: byte-identical again
        m = _store_manifest(p)
        sim.append_ivf(dfb, p)
        assert _store_manifest(p) == m
        del appended


def test_append_lsh_replay_idempotent(spark, tmp_path):
    """append_lsh: same ledger discipline — committed-append replay
    is byte-identical; opt-out (skip_existing_ids=False) duplicates,
    proving the guard is what provides the idempotence."""
    import random

    rng = random.Random(12)
    mk = lambda i: (i, [rng.uniform(-1, 1) for _ in range(8)])
    a = [mk(i) for i in range(30)]
    b = [mk(100 + i) for i in range(15)]
    dfa = generate_input(spark, a, "vec_id bigint, embedding array<double>")
    dfb = generate_input(spark, b, "vec_id bigint, embedding array<double>")
    p = str(tmp_path / "lsh_heal")
    sim.materialize_lsh(dfa, p, bits=4)
    sim.append_lsh(dfb, p, bits=4)
    clean = _store_manifest(p)
    sim.append_lsh(dfb, p, bits=4)
    assert _store_manifest(p) == clean
    assert spark.read.parquet(p).count() == 45
    # the opt-out really opts out
    sim.append_lsh(dfb, p, bits=4, skip_existing_ids=False)
    assert spark.read.parquet(p).count() == 60


def test_mjpeg_split_and_video_frame_features(spark):
    """MJPEG video path: split_mjpeg finds exact frame boundaries by
    marker structure (restart markers and all); video_frame_features
    decodes sampled frames with per-FRAME quarantine (a poison frame
    doesn't kill its siblings); an unsplittable stream quarantines
    the doc row."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    # three frames, one with restart markers (FFD0-D7 inside scan)
    f0 = J.encode_jpeg_baseline(
        np.arange(64, dtype=np.uint8).reshape(8, 8), quality=90
    )
    f1 = J.encode_jpeg_baseline(
        (np.arange(64, dtype=np.uint8)[::-1]).reshape(8, 8).copy(),
        quality=90, restart_interval=1,
    )
    f2 = J.encode_jpeg_baseline(
        np.full((16, 8), 200, dtype=np.uint8), quality=90
    )
    stream = f0 + f1 + f2
    bounds = mm.split_mjpeg(stream)
    assert bounds == [
        (0, len(f0)), (len(f0), len(f1)), (len(f0) + len(f1), len(f2)),
    ]
    with pytest.raises(ValueError, match="SOI"):
        mm.split_mjpeg(b"xx" + stream)
    with pytest.raises(ValueError, match="truncated"):
        mm.split_mjpeg(stream[:-4])

    # corpus: a clean 3-frame stream, a stream with a poison middle
    # frame (progressive), and junk
    poison_mid = f0 + f1.replace(b"\xff\xc0", b"\xff\xc2", 1) + f2
    df = generate_input(
        spark,
        [
            (1, bytearray(stream)),
            (2, bytearray(poison_mid)),
            (3, bytearray(b"AVI?not really")),
            (4, None),
            (5, bytearray(b"")),
        ],
        "doc_id bigint, media binary",
    )
    got = {}
    for r in mm.video_frame_features(df, every_n=1).collect():
        got[(r.doc_id, r.frame_idx)] = r
    for idx, (w, h) in enumerate([(8, 8), (8, 8), (8, 16)]):
        r = got[(1, idx)]
        assert r.ok and (r.width, r.height, r.n_frames) == (w, h, 3)
    assert got[(2, 0)].ok and got[(2, 2)].ok            # siblings live
    assert got[(2, 1)].ok is False and "progressive" in got[(2, 1)].err
    assert got[(3, -1)].ok is False                      # doc quarantine
    # empty/null media: zero frames must NOT silently drop the doc —
    # one ok=false quarantine row each (ADVICE r8 medium)
    for did in (4, 5):
        r = got[(did, -1)]
        assert r.ok is False and r.n_frames == 0
        assert "empty stream" in r.err
    assert len([k for k in got if k[0] in (4, 5)]) == 2
    # frame sampling: every 2nd frame only
    sampled = mm.video_frame_features(
        df.where("doc_id = 1"), every_n=2
    ).collect()
    assert sorted(r.frame_idx for r in sampled) == [0, 2]


def test_synthesize_video_roundtrip(spark):
    """synthesize_video_from_text: frame count follows the length
    rule, every frame decodes, and frame 0's pixels equal the image
    synthesizer's formula (shared pixel law across modalities)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    rows = [(1, "hello"), (2, ""), (3, "x" * 23)]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    vids = mm.synthesize_video_from_text(df, max_frames=5)
    raw = {r.doc_id: (r.n_frames, bytes(r.media)) for r in vids.collect()}
    feats = {}
    for r in mm.video_frame_features(vids).collect():
        feats.setdefault(r.doc_id, []).append(r)
    for did, t in rows:
        nf_want = 1 + len(t) % 5
        nf, stream = raw[did]
        assert nf == nf_want
        assert len(mm.split_mjpeg(stream)) == nf_want
        assert len(feats[did]) == nf_want and all(
            r.ok and (r.width, r.height) == (8, 8) for r in feats[did]
        )
    # frame-0 pixel parity with the formula (lossy codec: compare
    # through a decode of an identically-encoded reference)
    t = "hello"
    cps = np.zeros(64, dtype=np.int64)
    cps[: len(t)] = [ord(c) for c in t]
    ref = J.encode_jpeg_baseline(
        (((cps + 1) * 2654435761) % 256).astype(np.uint8).reshape(8, 8),
        quality=88,
    )
    off, ln = mm.split_mjpeg(raw[1][1])[0]
    assert raw[1][1][off : off + ln] == ref


def test_robots_filter_semantics(spark):
    """robots_filter: longest-match with the Allow tiebreak, agent
    group resolution (exact beats *), empty-Disallow no-op, missing
    host defaults to allowed; the rules side broadcasts and the
    per-URL decision has no Python stage."""
    from datasplash_spark.functions import web as wb

    robots = generate_input(
        spark,
        [
            (
                "a.com",
                "User-agent: trainer\nDisallow: /\n"
                "User-agent: *\nDisallow: /x/\nAllow: /x/ok\n",
            ),
            ("b.com", "User-agent: *\nDisallow:\n"),  # allow-all
        ],
        "host string, robots_txt string",
    )
    urls = generate_input(
        spark,
        [
            (1, "https://a.com/x/ok/page"),   # Allow wins (longer)
            (2, "https://a.com/x/other"),     # Disallow /x/
            (3, "https://a.com/y"),           # no match -> allow
            (4, "https://b.com/anything"),    # empty Disallow
            (5, "https://c.com/whatever"),    # no robots row
        ],
        "doc_id bigint, url string",
    )
    got = {
        r.doc_id: r.allowed
        for r in wb.robots_filter(urls, robots, agent="*").collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True}
    # exact agent group shadows the * group entirely
    got_tr = {
        r.doc_id: r.allowed
        for r in wb.robots_filter(urls, robots, agent="trainer").collect()
    }
    assert got_tr == {1: False, 2: False, 3: False, 4: True, 5: True}
    # plan: broadcast join, no Exchange on the URL side
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        wb.robots_filter(urls, robots).explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p


def test_html_extract(spark):
    """html_extract: scripts/styles/comments vanish with their
    content, title captured, block structure becomes newlines, tags
    strip, core entities decode, link/tag counts match hand counts —
    and the whole thing is a shuffle-free JVM expression."""
    from datasplash_spark.functions import web as wb

    html = (
        "<!DOCTYPE html><html><head><title> My Page </title>"
        "<style>body { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>Header</h1>"
        "<p>Hello &amp; welcome to <a href='/x'>the site</a>.</p>"
        "<div>Second &lt;block&gt;</div>"
        "<ul><li>one</li><li>two</li></ul>"
        "</body></html>"
    )
    df = generate_input(spark, [(1, html), (2, "plain, no markup"), (3, None)],
                        "doc_id bigint, html string")
    ex = wb.html_extract("html")
    out = df.select(
        "doc_id", ex["title"].alias("title"), ex["text"].alias("text"),
        ex["n_tags"].alias("n_tags"), ex["n_links"].alias("n_links"),
    )
    got = {r.doc_id: r for r in out.collect()}
    r = got[1]
    assert r.title == "My Page"
    assert "not text" not in r.text and "color" not in r.text
    assert "hidden" not in r.text
    lines = r.text.split("\n")
    assert "Header" in lines[0]
    assert "Hello & welcome to the site ." in r.text
    assert "Second <block>" in r.text
    assert "one" in r.text and "two" in r.text
    assert r.n_links == 1 and r.n_tags > 15
    assert got[2].text == "plain, no markup" and got[2].n_tags == 0
    assert got[3].text is None
    # shuffle-free plan
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert "Exchange" not in buf.getvalue()


def test_hamming_band_pairs_and_bitstring(spark):
    """hamming_band_pairs: pigeonhole recall is exact — every pair
    within max_hamming is found (verified against a brute-force
    enumeration), nothing beyond the bound survives, and the image
    path composes: ahash bit strings -> bigint -> banded pairs."""
    import itertools
    import random

    import numpy as np

    rng = random.Random(7)
    base = rng.getrandbits(64)

    def flip(v, n):
        for b in rng.sample(range(64), n):
            v ^= 1 << b
        return v

    sigs = [
        (0, base), (1, flip(base, 1)), (2, flip(base, 2)),
        (3, flip(base, 3)), (4, rng.getrandbits(64)),
        (5, flip(base, 12)),
    ]
    # signed view, as image_ahash->bitstring64_to_long would give
    rows = [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in sigs]
    df = generate_input(spark, rows, "doc_id bigint, sig long")
    got = {
        (r.a, r.b): r.hamming
        for r in dd.hamming_band_pairs(df, "sig", max_hamming=3).collect()
    }
    brute = {}
    for (ia, va), (ib, vb) in itertools.combinations(rows, 2):
        h = bin((va ^ vb) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            brute[(min(ia, ib), max(ia, ib))] = h
    assert got == brute and (0, 1) in got and got[(0, 1)] == 1
    assert all(h <= 3 for h in got.values())

    # image composition: two near-identical synthesized images and a
    # far one -> ahash bigints -> pairs finds exactly the near pair
    texts = [(10, "hello world"), (11, "hello world!"), (12, "zz " * 20)]
    tdf = generate_input(spark, texts, "doc_id bigint, text string")
    media = mm.synthesize_image_from_text(tdf, fmt="pngL", size=(8, 8))
    hashes = mm.image_ahash(media).select(
        "doc_id", dd.bitstring64_to_long("ahash").alias("sig")
    )
    # round-trip parity of the bitstring parse
    raw = {r.doc_id: r.ahash for r in mm.image_ahash(media).collect()}
    parsed = {r.doc_id: r.sig for r in hashes.collect()}
    for did, bits in raw.items():
        want = int(bits, 2)
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert parsed[did] == want
    pairs = dd.hamming_band_pairs(hashes, "sig", max_hamming=8).collect()
    found = {(r.a, r.b) for r in pairs}
    assert (10, 11) in found
    assert all({a, b} != {10, 12} and {a, b} != {11, 12} for a, b in found)

    # max_hamming=0 → one full-width 64-bit band (the (1<<64)-1 mask
    # does not fit a long literal — ADVICE r8): exact-duplicate pairs
    # only, including an MSB-set (negative long) signature
    neg = (1 << 63) | 5
    exact_rows = [
        (0, -42), (1, -42), (2, 7), (3, neg - (1 << 64)),
        (4, neg - (1 << 64)), (5, 8),
    ]
    edf = generate_input(spark, exact_rows, "doc_id bigint, sig long")
    got0 = {
        (r.a, r.b): r.hamming
        for r in dd.hamming_band_pairs(edf, "sig", max_hamming=0).collect()
    }
    assert got0 == {(0, 1): 0, (3, 4): 0}


def test_apply_paragraph_dedup_rebuild(spark):
    """apply_paragraph_dedup: surviving paragraphs reassemble in
    positional order, fully-duplicate docs come back empty with
    n_kept=0, and the rebuild agrees with the report op's counts."""
    a = " ".join(f"w{i}" for i in range(25))          # paras 0,1,2
    b = " ".join(f"w{i}" for i in range(10)) + " unique tail"
    rows = [(1, a), (2, b), (3, a)]
    df = generate_input(spark, rows, "doc_id bigint, text string")
    paras = dd.word_paragraphs("text", 10)
    out = {r.doc_id: r for r in dd.apply_paragraph_dedup(df, paras).collect()}
    assert out[1].text == "\n".join(
        [
            " ".join(f"w{i}" for i in range(10)),
            " ".join(f"w{i}" for i in range(10, 20)),
            " ".join(f"w{i}" for i in range(20, 25)),
        ]
    )
    assert (out[1].n_paras, out[1].n_kept) == (3, 3)
    assert out[2].text == "unique tail" and out[2].n_kept == 1
    assert out[3].text == "" and (out[3].n_paras, out[3].n_kept) == (3, 0)
    # count parity with the report op
    rep = {
        r.doc_id: (r.n_paras, r.n_kept)
        for r in dd.dedup_paragraphs(df, paras)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .collect()
    }
    for did in (1, 2, 3):
        assert rep[did] == (out[did].n_paras, out[did].n_kept)


# test_round10_staged_queries_match_oracle removed in round 10: all
# six staged queries (pdf_extract, image_neardup_clusters,
# image_progressive, image_formats_all, video_frames,
# rebuild_paragraphs) were promoted into the gated registry, where
# tests/test_gate_all.py runs the identical driver-faithful DuckDB
# compare at sf0.01 — keeping the sf0.001 copy would double-run them.


def test_corpus_prep_full_invariants(spark):
    """corpus_prep_full composes five individually-oracled stages;
    this pins the COMPOSITION invariants the per-stage oracles can't
    see: (a) deterministic across runs, (b) every admitted doc
    passed the quality filter and is its own cluster survivor,
    (c) no admitted doc shares a 3-gram with the eval set,
    (d) per-part token intervals are contiguous from zero (the
    packing precondition), (e) per-part admitted tokens respect the
    temperature budget."""
    from datasplash_spark.functions import text as tx
    from datasplash_spark.functions.prep import corpus_prep_full

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    out1 = corpus_prep_full(train, ev, total_budget=4000, seq_len=128)
    rows = sorted(out1.collect(), key=lambda r: (r.part, r.start_tok))
    assert rows
    again = sorted(
        corpus_prep_full(train, ev, total_budget=4000, seq_len=128).collect(),
        key=lambda r: (r.part, r.start_tok),
    )
    assert rows == again  # (a)
    admitted = {r.doc_id for r in rows}
    # (b) quality filter held
    q = {
        r.doc_id
        for r in train.filter(
            (tx.token_count("text") >= 5) & (tx.punct_ratio("text") < 0.2)
        ).collect()
    }
    assert admitted <= q
    # (c) decontamination held: the stage sees the paragraph-REBUILT
    # text (its own rebuild is oracle-gated by rebuild_paragraphs),
    # so replay the 3-gram overlap in pure Python over that text —
    # exact tokenizer parity: lower().split(" "), texts shorter than
    # k yielding their single full join (shingles' contract)
    def grams(t: str, k: int = 3) -> set:
        toks = t.lower().split(" ")
        return {
            " ".join(toks[i : i + k])
            for i in range(max(len(toks) - k + 1, 1))
        }

    ev_grams: set = set()
    for r in ev.select("text").collect():
        ev_grams |= grams(r.text)
    quality_train = train.filter(
        (tx.token_count("text") >= 5) & (tx.punct_ratio("text") < 0.2)
    )
    from datasplash_spark.functions import dedup as dd

    reb = {
        r.doc_id: r.text
        for r in dd.apply_paragraph_dedup(
            quality_train, dd.word_paragraphs("text", 10)
        )
        .filter(F.col("n_kept") > 0)
        .collect()
    }
    for did in admitted:
        assert not (grams(reb[did]) & ev_grams), did
    # (d) contiguous intervals per part + (e) budget ceiling
    budgets: dict[str, int] = {}
    by_part: dict[str, list] = {}
    for r in rows:
        by_part.setdefault(r.part, []).append(r)
    for part, rs in by_part.items():
        cursor = 0
        for r in rs:
            assert r.start_tok == cursor, (part, r)
            assert r.pack_id == r.start_tok // 128
            assert r.pack_offset == r.start_tok % 128
            cursor += r.n_tok
        budgets[part] = cursor
    # temperature budgets: sum of admitted tokens per part never
    # exceeds floor(4000 * share); just sanity-bound the total
    assert sum(budgets.values()) <= 4000


def test_staged_queries_match_oracle(spark):
    """The staging/retired-parity block (round-12 headroom policy:
    the cap is 356 and no longer zero-sum, but new capability
    queries still stage here before promotion, and queries retired
    by absorption keep oracle parity here): each entry must match
    its DuckDB oracle value-for-value at sf0.001 with
    driver-faithful canonicalization, so a promotion (or
    restoration) is one registry swap, not new work."""
    import duckdb

    from datasplash_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    # Every prior staging generation (round 8/9/10 blocks,
    # image_exif, office_extract, latex_extract, doctext_sweep) has
    # been promoted and is now covered by test_gate_all; the retired
    # office_extract keeps oracle parity HERE (its function + oracle
    # stay in the library after the round-12 absorption into
    # doctext_sweep, and this check proves the retired path still
    # matches value-for-value).
    staged: dict = {
        "office_extract": (Q.q_office_extract, Q.ORACLE_OFFICE_EXTRACT),
    }
    for name, (fn, osql) in staged.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(osql).df()
        assert sorted(got.columns) == sorted(want.columns), name
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols, kind="mergesort").reset_index(
            drop=True
        )
        want = want[cols].sort_values(cols, kind="mergesort").reset_index(
            drop=True
        )
        assert len(got) == len(want) and len(got) > 0, (
            name, len(got), len(want),
        )
        import pandas.testing as pdt

        # NaN-safe value compare (the driver canonicalizes NULLs;
        # list equality would fail on NaN != NaN)
        pdt.assert_frame_equal(got, want, check_dtype=True)


def test_sniff_media_type(spark):
    """sniff_media_type: magic-byte routing for every container the
    codecs handle plus lookalike traps (RIFF-but-WEBP, truncated
    RIFF), shuffle-free and Python-free (plan-pinned)."""
    import numpy as np

    from datasplash_spark.functions import jpeg as J

    png = mm.encode_png(np.zeros((4, 4), dtype=np.uint8))
    jpg = J.encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8))
    wav = mm.encode_wav(np.zeros(4, dtype=np.int16))
    rows = [
        (1, bytearray(png)), (2, bytearray(jpg)),
        (3, bytearray(b"P6 2 2 255 " + bytes(12))),
        (4, bytearray(wav)),
        (5, bytearray(b"RIFF\x04\x00\x00\x00WEBP")),
        (6, bytearray(b"RIFF\x04\x00")),           # truncated RIFF
        (7, bytearray(b"GIF89a....")),
        (8, bytearray(b"BM......")),
        (9, bytearray(b"")), (10, None),
        (11, bytearray(b"plain text")),
        (12, bytearray(b"OggS\x00......")),
        (13, bytearray(b"ID3\x03\x00....")),
        (14, bytearray(b"\xff\xfb\x90\x00" + bytes(8))),  # bare sync
        (15, bytearray(b"PK\x03\x04....")),
        (16, bytearray(b"\x1f\x8b\x08\x00....")),
        (17, bytearray(b"WARC/1.1\r\n...")),
        (18, bytearray(bytes(257) + b"ustar\x00" + bytes(20))),
        (19, bytearray(b"%PDF-1.4\n...")),
    ]
    df = generate_input(spark, rows, "doc_id bigint, media binary")
    out = df.select("doc_id", mm.sniff_media_type("media").alias("t"))
    got = {r.doc_id: r.t for r in out.collect()}
    want = {1: "png", 2: "jpeg", 3: "pnm", 4: "wav", 5: "webp",
            6: "unknown", 7: "gif", 8: "bmp", 9: "empty",
            10: "empty", 11: "unknown", 12: "ogg", 13: "mp3",
            14: "mp3", 15: "zip", 16: "gzip", 17: "warc",
            18: "tar", 19: "pdf"}
    assert got == want
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "Exchange" not in p and "Python" not in p


def test_robots_bare_host_url_matches_root_rules(spark):
    """Review regression: a bare-host URL (no path) crawls '/', so
    'Disallow: /' must block it — the empty extracted path
    normalizes to '/' before prefix matching."""
    from datasplash_spark.functions import web as wb

    robots = generate_input(
        spark,
        [("spam.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    urls = generate_input(
        spark,
        [
            (1, "https://spam.com"),    # bare host: still blocked
            (2, "https://spam.com/"),
            (3, "https://other.com"),   # no robots: allowed
        ],
        "doc_id bigint, url string",
    )
    got = {
        r.doc_id: r.allowed
        for r in wb.robots_filter(urls, robots).collect()
    }
    assert got == {1: False, 2: False, 3: True}


def test_robots_agent_product_token_matching():
    """RFC 9309 agent resolution (ADVICE r10): a versioned crawler
    UA like 'trainer/1.0' resolves the bare 'trainer' group instead
    of silently falling back to '*'; the longest matching token
    wins; and multiple groups naming the same agent combine."""
    from datasplash_spark.functions.web import parse_robots_rules

    txt = (
        "User-agent: trainer\nDisallow: /private/\n\n"
        "User-agent: trainer-img\nDisallow: /images/\n\n"
        "User-agent: *\nDisallow: /all/\n"
    )
    # versioned product token still hits its group
    assert parse_robots_rules(txt, "trainer/1.0") == [
        (False, "/private/")
    ]
    # case-insensitive
    assert parse_robots_rules(txt, "Trainer/2.3") == [
        (False, "/private/")
    ]
    # longest token wins: 'trainer-img/2.0' matches both 'trainer'
    # and 'trainer-img' -- the more specific group applies
    assert parse_robots_rules(txt, "trainer-img/2.0") == [
        (False, "/images/")
    ]
    # versioned token in the GROUP line is stripped too
    txt_v = "User-agent: trainer/9.9\nDisallow: /v/\n"
    assert parse_robots_rules(txt_v, "trainer/1.0") == [(False, "/v/")]
    # unknown agent falls back to the * group
    assert parse_robots_rules(txt, "elsebot/1.0") == [(False, "/all/")]


def test_robots_repeated_groups_combine():
    # RFC 9309 2.2.1: rules of ALL groups matching the UA combine --
    # a later Disallow for the same agent must not be dropped
    from datasplash_spark.functions.web import parse_robots_rules

    txt = (
        "User-agent: trainer\nDisallow: /a/\n\n"
        "User-agent: other\nDisallow: /o/\n\n"
        "User-agent: trainer\nDisallow: /b/\n"
    )
    assert parse_robots_rules(txt, "trainer") == [
        (False, "/a/"), (False, "/b/")
    ]
    # star groups combine the same way on fallback
    txt_star = (
        "User-agent: *\nDisallow: /x/\n\nUser-agent: *\nDisallow: /y/\n"
    )
    assert parse_robots_rules(txt_star, "nobody") == [
        (False, "/x/"), (False, "/y/")
    ]


def test_write_warc_shards_roundtrip(spark, tmp_path):
    """write_warc_shards → read_warc: shard-per-group layout, gzip
    members, atomic writes; records come back framed and typed."""
    from datasplash_spark.sources import archives as ar

    rows = [
        (i % 3, "https://h%d.example.com/doc/%d" % (i % 4, i),
         ("<html><body><p>doc %d body</p></body></html>" % i).encode())
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "shard_id int, target_uri string, payload binary"
    )
    out = str(tmp_path / "warc")
    res = ar.write_warc_shards(df, out).collect()
    assert sorted(r.shard_id for r in res) == ["0", "1", "2"]
    assert sum(r.n_records for r in res) == 30
    assert all(r.path.endswith(".warc.gz") for r in res)
    back = ar.read_warc(spark, out + "/*.warc.gz")
    got = back.select("target_uri", "payload", "content_type").collect()
    assert len(got) == 30
    by_uri = {r.target_uri: r for r in got}
    for i in range(30):
        uri = "https://h%d.example.com/doc/%d" % (i % 4, i)
        assert bytes(by_uri[uri].payload) == rows[i][2]
        assert by_uri[uri].content_type == "text/html"


def test_web_ingest_prep_end_to_end(spark, tmp_path):
    """web_ingest_prep: WARC shards → html_extract → robots gate →
    Gopher quality → paragraph dedup → minhash dedup, end to end on
    a small synthetic crawl. Disallowed URLs and near-dup replica
    docs must not survive; clean unique docs must."""
    from datasplash_spark.functions import prep as pp
    from datasplash_spark.sources import archives as ar

    texts = {
        i: " ".join(
            "w%d%s" % (j, chr(97 + (i * 7 + j) % 26)) for j in range(40)
        )
        for i in range(12)
    }
    rows = []
    for i in range(12):
        path = "/private/%d" % i if i % 4 == 3 else "/doc/%d" % i
        uri = "https://h%d.example.com%s" % (i % 2, path)
        body = "<html><head><title>t%d</title></head><body><p>%s</p></body></html>" % (
            i, texts[i],
        )
        rows.append((i % 2, uri, body.encode()))
    # a near-dup replica of doc 0 on another path: ONE word changed,
    # so with one 40-word paragraph per doc the paragraph pass keeps
    # it intact and the minhash pass kills it (keep-min-id survivor)
    rep = texts[0].split(" ")
    rep[17] = "changed"
    rows.append((
        0, "https://h0.example.com/doc/990",
        ("<html><body><p>%s</p></body></html>" % " ".join(rep)).encode(),
    ))
    df = spark.createDataFrame(
        rows, "shard_id int, target_uri string, payload binary"
    )
    out = str(tmp_path / "crawl")
    ar.write_warc_shards(df, out).collect()
    robots = spark.createDataFrame(
        [
            ("h0.example.com", "User-agent: *\nDisallow: /private/\n"),
            ("h1.example.com", "User-agent: *\nDisallow: /private/\n"),
        ],
        "host string, robots_txt string",
    )
    surv = pp.web_ingest_prep(
        spark, out + "/*.warc.gz", robots, min_tokens=5,
        words_per_para=40, num_hashes=32, bands=8,
    )
    urls = {r.url for r in surv.select("url").collect()}
    # /private/ URLs gated out (docs 3, 7, 11)
    assert not any("/private/" in u for u in urls)
    # the near-dup pair (doc 0 vs 990) keeps exactly one member
    pair = {u for u in urls if u.endswith("/doc/0") or u.endswith("/doc/990")}
    assert len(pair) == 1
    # every clean unique doc survives
    for i in (1, 2, 4, 5, 6, 8, 9, 10):
        assert any(u.endswith("/doc/%d" % i) for u in urls), i


def test_robots_short_token_cannot_hijack():
    # review fix (round 11): substring matching let 'ai' hijack
    # 'trainer' ('ai' ⊂ 'trAIner'); matching is now exact on the
    # product token, so the unrelated group never applies
    from datasplash_spark.functions.web import parse_robots_rules

    txt = (
        "User-agent: AI\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /tmp/\n"
    )
    assert parse_robots_rules(txt, "trainer/1.0") == [(False, "/tmp/")]
    assert parse_robots_rules(txt, "ai/2.0") == [(False, "/")]
    assert parse_robots_rules(txt, "AI") == [(False, "/")]


def test_web_ingest_caches_releasable(spark, tmp_path):
    # review fix (round 11): web_ingest_prep exposes its cache
    # handles so a continuous-ingestion loop can release them
    from datasplash_spark.functions import prep as pp
    from datasplash_spark.sources import archives as ar

    df = spark.createDataFrame(
        [(0, "https://h0.example.com/doc/1",
          b"<html><body><p>%s</p></body></html>"
          % (" ".join("w%d" % j for j in range(20))).encode())],
        "shard_id int, target_uri string, payload binary",
    )
    out = str(tmp_path / "warc")
    ar.write_warc_shards(df, out).collect()
    robots = spark.createDataFrame(
        [("h0.example.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    res = pp.web_ingest_prep(spark, out + "/*.warc.gz", robots)
    assert res.count() == 1
    caches = res._web_ingest_caches
    assert len(caches) == 2
    assert all(c.storageLevel.useMemory for c in caches)
    pp.unpersist_web_ingest(res)
    assert all(not c.storageLevel.useMemory for c in caches)
    # persist=False result carries no handles; unpersist is a no-op
    res2 = pp.web_ingest_prep(
        spark, out + "/*.warc.gz", robots, persist=False
    )
    assert res2._web_ingest_caches == ()
    pp.unpersist_web_ingest(res2)
    pp.unpersist_web_ingest(spark.range(1))  # plain DF: no-op


def test_av_sample_pairing_semantics(spark):
    """Round 13: WebDataset AV sidecar pairing — one kernel pairs a
    sample's .mp4 and .srt/.vtt members by basename key inside the
    shard task. Pinned: full pair, transcript-only, media-only, and
    the poison-media sample (typed ok=false, transcript still
    extracted); mp4 fields match the synth formulas; transcript
    text equals the subtitles family's expected text."""
    from datasplash_spark.functions import multimodal as mm
    from datasplash_spark.functions import subtitles as st

    rows = [
        (2, "alpha beta gamma delta"),  # full pair, srt
        (3, "delta epsilon words here"),  # %17==3: no transcript
        (5, "zeta eta"),  # %19==5: no media
        (7, "theta iota kappa"),  # %23==7: poison media
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.key: r
        for r in mm.av_sample_features(
            mm.synthesize_av_tar_from_text(df)
        ).collect()
    }
    d2 = out["d2"]
    assert d2.paired and d2.kind == "srt" and d2.ok
    n = len("alpha beta gamma delta")
    assert (d2.width, d2.height, d2.duration_s) == (
        8 + n % 9, 8 + n % 7, float(1 + n % 30),
    )
    assert d2.text == st.subtitles_expected_text(
        ["alpha gamma", "beta delta"]
    )
    d3 = out["d3"]
    assert not d3.paired and d3.kind is None and d3.n_members == 1
    assert d3.width is not None and d3.ok
    d5 = out["d5"]
    assert not d5.paired and d5.kind == "vtt" and d5.width is None
    assert d5.n_chars == len(d5.text) and d5.ok
    d7 = out["d7"]
    assert d7.paired and not d7.ok and "mp4" in d7.err
    assert d7.kind == "vtt" and d7.text  # transcript still extracted


def test_av_pairing_through_disk_shards(spark, tmp_path):
    """The same pairing kernel composes with REAL tar shards on
    disk through the binaryFile reader (the split helper is shared
    with read_tar_shards, so the in-plan and on-disk walks cannot
    diverge)."""
    from datasplash_spark.functions import multimodal as mm

    df = spark.createDataFrame(
        [(2, "alpha beta gamma delta"), (4, "epsilon zeta")],
        "doc_id bigint, text string",
    )
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for r in mm.synthesize_av_tar_from_text(df).collect():
        (shard_dir / r.shard).write_bytes(bytes(r.data))
    files = spark.read.format("binaryFile").load(
        str(shard_dir) + "/*.tar"
    )
    out = {
        r.key: r
        for r in mm.av_sample_features(
            files, shard_col="path", data_col="content"
        ).collect()
    }
    assert set(out) == {"d2", "d4"}
    assert all(r.paired and r.ok for r in out.values())
    assert out["d2"].kind == "srt" and out["d4"].kind == "srt"


# ---------------------------------------------------------------------
# round-14 optimization pins
# ---------------------------------------------------------------------


def test_contrastive_negatives_match_inplan_reference(spark):
    """The r14 fused negative mining (per-cell min-md5 riding the
    salt-width pass, winners folded in as driver literals) must pick
    the EXACT winners the former in-plan m1/m2 aggregates picked:
    m1 = global min-md5 row, m2 = min-md5 row among other cells."""
    import hashlib

    seed = 7
    rows = [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sim.ivf_centroids(df, 4)
    out = {
        r.vec_id: r
        for r in sim.contrastive_pairs(
            df, centroids=cents, seed=seed
        ).collect()
    }
    # reference: recompute the assignment + winners in pure Python
    from datasplash_spark.functions.similarity import _pydot, _pynorm

    def cos(a, b):
        d = _pynorm(a) * _pynorm(b)
        return round(_pydot(a, b) / d, 9) if d > 0 else 0.0

    def cell_of(v):
        scores = [(cos(v, c), -i) for i, c in enumerate(cents)]
        best = max(scores)
        return -best[1]

    assign = {i: cell_of([float(x) for x in v]) for i, v in rows}
    h = {
        i: hashlib.md5(f"{seed}{i}".encode()).hexdigest()
        for i, _ in rows
    }
    m1 = min(h, key=lambda i: h[i])
    c1 = assign[m1]
    others = [i for i in h if assign[i] != c1]
    m2 = min(others, key=lambda i: h[i]) if others else None
    for i, _ in rows:
        expected = m1 if assign[i] != c1 else m2
        assert out[i].neg_id == expected, (i, out[i].neg_id, expected)
        assert out[i].cell == assign[i]


def test_quantized_topk_trusted_raises_on_width_mismatch(spark):
    """ADVICE r13: the trusted fast path must RAISE when the store's
    code width disagrees with the validated query dimension instead
    of NULL-padding and silently sorting mismatched rows last."""
    codes = spark.createDataFrame(
        [(1, [3, 4], 1.0), (2, [1, 2, 3], 1.0)],
        "vec_id long, codes array<smallint>, scale double",
    )
    with pytest.raises(Exception, match="store and sidecar disagree"):
        sim.quantized_topk(codes, [1, 2], k=2, trusted_dim=2).collect()


def test_table_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    """pipeline._read_parquet_memo caches ONLY the schema, keyed on
    (path, mtime_ns, size/listing): rewriting the file with a new
    schema must serve the new schema, not the memo."""
    from datasplash_spark.pipeline import _read_parquet_memo

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1,)], "a long").toPandas().to_parquet(p)
    assert _read_parquet_memo(spark, p).columns == ["a"]
    import pandas as pd

    pd.DataFrame({"b": [2], "c": [3]}).to_parquet(p)
    assert sorted(_read_parquet_memo(spark, p).columns) == ["b", "c"]


def test_sidecar_fastpath_requires_json(spark, tmp_path):
    """ADVICE r13: a COMPRESSED single part file passes the name
    filter but decodes to garbage through the raw-bytes fast path —
    the JSON gate must reject it and fall back to the codec-aware
    spark.read.text, which returns the real line."""
    import gzip
    import json

    d = tmp_path / "_stats"
    d.mkdir()
    line = json.dumps({"n_buckets": 4})
    (d / "part-00000.txt.gz").write_bytes(gzip.compress(line.encode()))
    assert sim._read_sidecar_text(spark, str(d)) == line


def test_pair_width_gate_drops_malformed_rows(spark):
    """ADVICE r13: a vector WIDER than the centroid dimension must
    DROP out of the pair stage (the fold's null-pad behavior), not
    silently truncate to dim terms or raise under ANSI."""
    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.1]),
            (2, [1.0, 0.11]),
            (3, [1.0, 0.1, 99.0]),  # malformed: wider than dim
        ],
        "vec_id long, embedding array<double>",
    )
    out = sim.semantic_dedup(
        df, eps=0.5, centroids=cents, pair_backend="expr"
    ).collect()
    by_id = {r.vec_id: r for r in out}
    # 1 and 2 pair up; 3 must stay a singleton (its own component)
    assert by_id[1].component == by_id[2].component == 1
    assert by_id[3].component == 3
