"""Object-mode (Layer 1) parity: the reference's dynamic-value tests
re-expressed over PCollection — ragged maps, keywords-as-strings,
combiners, cogroup nil semantics.

Fixture shapes come from /root/reference/test/datasplash/api_test.clj
(cited per test)."""

from __future__ import annotations

from collections import Counter

import pytest

from datasplash_spark.objectmode import (
    CombineFn,
    PCollection,
    cogroup_by,
    concat,
    join_by,
    side_input,
)


def _multiset(xs):
    def freeze(v):
        if isinstance(v, dict):
            return tuple(sorted((k, freeze(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(freeze(x) for x in v)
        if isinstance(v, set):
            return frozenset(freeze(x) for x in v)
        return v

    return Counter(freeze(x) for x in xs)


def assert_same(got, expected):
    assert _multiset(got) == _multiset(expected)


def test_map_filter_keep(spark):
    """map (api_test.clj:327-340), filter (402-410), keep keeps false
    (412-419)."""
    pc = PCollection.from_items(spark, [1, 2, 3, 4, 5])
    assert_same(pc.map(lambda x: x * 10).collect(), [10, 20, 30, 40, 50])
    assert_same(pc.filter(lambda x: x % 2 == 0).collect(), [2, 4])
    got = pc.keep(lambda x: (x % 2 == 0) if x != 5 else None).collect()
    assert_same(got, [False, True, False, True])  # False survives, None dropped


def test_mapcat_ragged_maps(spark):
    """mapcat 1→N + heterogeneous dicts flow through untyped."""
    rows = [{"key": "a", "val": 42}, {"key": "b", "val": 56}, {"key": "a", "lue": 65}]
    pc = PCollection.from_items(spark, rows)
    exploded = pc.mapcat(lambda d: [(k, v) for k, v in d.items()])
    assert exploded.count() == 6


def test_group_by(spark):
    """group-by on ragged maps (api_test.clj:546-558)."""
    rows = [{"key": "a", "val": 42}, {"key": "b", "val": 56}, {"key": "a", "lue": 65}]
    pc = PCollection.from_items(spark, rows)
    grouped = dict(pc.group_by(lambda d: d["key"]).collect())
    assert _multiset(grouped["a"]) == _multiset(
        [{"key": "a", "val": 42}, {"key": "a", "lue": 65}]
    )
    assert grouped["b"] == [{"key": "b", "val": 56}]


def test_combine_by_plain_fn(spark):
    """(combine-fn +) 1-arg form (core.clj:739-744, api_test.clj:724-732):
    a bare binary fn is both reduce and merge; the first element seeds
    the accumulator."""
    import operator

    pc = PCollection.from_items(spark, [1, 2, 3, 4, 5], num_partitions=3)
    got = dict(pc.combine_by(lambda v: v % 2, operator.add).collect())
    assert got == {0: 6, 1: 9}


def test_combine_by_explicit_phases(spark):
    import operator

    pc = PCollection.from_items(spark, [("a", 1), ("a", 2), ("b", 5)])
    fn = CombineFn(
        initf=lambda: 0,
        reducef=lambda acc, kv: acc + kv[1],
        combinef=operator.add,
    )
    got = dict(pc.combine_by(lambda kv: kv[0], fn).collect())
    assert got == {"a": 3, "b": 5}


def test_combine_by_full_phases(spark):
    """4-phase combiner: mean via [sum count] accumulator — the
    reference's mean-fn shape (core.clj:2004-2017)."""
    fn = CombineFn(
        initf=lambda: (0.0, 0),
        reducef=lambda acc, v: (acc[0] + v, acc[1] + 1),
        combinef=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        extractf=lambda acc: acc[0] / acc[1] if acc[1] else 0.0,
    )
    pc = PCollection.from_items(spark, list(range(1, 101)), num_partitions=8)
    got = dict(pc.combine_by(lambda v: v % 2, fn).collect())
    assert got[0] == 51.0 and got[1] == 50.0


def test_combine_globally(spark):
    pc = PCollection.from_items(spark, list(range(101)), num_partitions=8)
    assert pc.combine_globally(lambda a, b: a + b).collect() == [5050]


def test_distinct_objects(spark):
    pc = PCollection.from_items(
        spark, [{"a": 1}, {"a": 1}, {"a": 2}, {"a": 1}]
    )
    assert_same(pc.distinct().collect(), [{"a": 1}, {"a": 2}])


def test_cogroup_nil_semantics(spark):
    """nil keys do NOT join — each nil-keyed element is its own
    singleton group (core.clj:1561-1570, api_test.clj:603-653)."""
    p1 = PCollection.from_items(
        spark, [{"k": "x", "v": 1}, {"k": None, "v": 2}, {"k": None, "v": 3}]
    )
    p2 = PCollection.from_items(spark, [{"k": "x", "w": 10}, {"k": None, "w": 20}])
    got = cogroup_by([(p1, lambda d: d["k"]), (p2, lambda d: d["k"])]).collect()
    by_key = {}
    nil_groups = []
    for k, sides in got:
        if k is None:
            nil_groups.append(sides)
        else:
            by_key[k] = sides
    assert _multiset(by_key["x"][0]) == _multiset([{"k": "x", "v": 1}])
    assert _multiset(by_key["x"][1]) == _multiset([{"k": "x", "w": 10}])
    # three nil-keyed elements → three singleton groups
    assert len(nil_groups) == 3
    assert all(sum(len(s) for s in sides) == 1 for sides in nil_groups)


def test_join_by_required_and_outer(spark):
    """join-by cartesian per key; empty optional side → [nil]
    (core.clj:1696-1739, api_test.clj:655-681)."""
    p1 = PCollection.from_items(
        spark, [{"id": 1, "a": "x"}, {"id": 2, "a": "y"}]
    )
    p2 = PCollection.from_items(
        spark, [{"id": 1, "b": "p"}, {"id": 1, "b": "q"}, {"id": 3, "b": "r"}]
    )
    inner = join_by(
        [(p1, lambda d: d["id"], True), (p2, lambda d: d["id"], True)]
    ).collect()
    assert_same(
        inner,
        [
            {"id": 1, "a": "x", "b": "p"},
            {"id": 1, "a": "x", "b": "q"},
        ],
    )
    left = join_by(
        [(p1, lambda d: d["id"], True), (p2, lambda d: d["id"], False)]
    ).collect()
    assert_same(
        left,
        [
            {"id": 1, "a": "x", "b": "p"},
            {"id": 1, "a": "x", "b": "q"},
            {"id": 2, "a": "y"},  # merge with None side = left row alone
        ],
    )


def test_concat_and_side_input(spark):
    p1 = PCollection.from_items(spark, [1, 2])
    p2 = PCollection.from_items(spark, [3])
    assert_same(concat(p1, p2).collect(), [1, 2, 3])
    # side input as map view (api_test.clj:500-530)
    lookup = PCollection.from_items(spark, [("a", 1), ("b", 2)])
    bc = side_input(lookup, view="map")
    main = PCollection.from_items(spark, ["a", "b", "a"])
    got = main.map(lambda k, bc=bc: bc.value[k]).collect()
    assert_same(got, [1, 2, 1])


def test_map_partitions_with_initialize(spark):
    """pardo + initialize-fn/system (core.clj:274-277, api_test.clj:
    328-340): once-per-task setup passed into the fn."""
    pc = PCollection.from_items(spark, [1, 2, 3], num_partitions=2)

    def init():
        return {"offset": 100}

    def run(values, system):
        return [v + system["offset"] for v in values]

    assert_same(pc.map_partitions(run, initialize=init).collect(), [101, 102, 103])


def test_to_dataframe_exit(spark):
    pc = PCollection.from_items(
        spark, [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    )
    df = pc.to_dataframe(spark, "id bigint, name string")
    assert {(r.id, r.name) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_combine_globally_empty_emits_default(spark):
    """Empty input + init-ful combiner → singleton extract(init())
    (Beam default output; without_defaults suppresses)."""
    empty = PCollection.from_items(spark, [])
    fn = CombineFn(
        initf=lambda: (0.0, 0),
        reducef=lambda a, v: (a[0] + v, a[1] + 1),
        combinef=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        extractf=lambda a: a[0] / a[1] if a[1] else 0.0,
    )
    assert empty.combine_globally(fn).collect() == [0.0]
    assert empty.combine_globally(fn, without_defaults=True).collect() == []
    # no-init combiner: stays empty (nothing to default from)
    assert empty.combine_globally(lambda a, b: a + b).collect() == []
    # non-empty input: default row must NOT leak in
    some = PCollection.from_items(spark, [1.0, 2.0, 3.0])
    assert some.combine_globally(fn).collect() == [2.0]


def test_mixed_type_dict_keys_group(spark):
    """Ragged keys with incomparable types canonicalize fine."""
    pc = PCollection.from_items(
        spark, [{"k": {"b": 2, 1: "a"}, "v": 1}, {"k": {1: "a", "b": 2}, "v": 2}]
    )
    grouped = pc.group_by(lambda d: d["k"]).collect()
    assert len(grouped) == 1 and len(grouped[0][1]) == 2


def test_numeric_key_unification_deterministic_repr(spark):
    """True/1/1.0 group together (Python dict semantics — documented
    divergence from Clojure ``(= 1 1.0)``) and the EMITTED key is the
    canonical int regardless of which variant a partition saw first."""
    pc = PCollection.from_items(spark, [True, 1, 1.0, 2, False, 0.0])
    out = dict(pc.combine_by(lambda v: v, CombineFn.of(lambda a, b: a)).map(
        lambda kv: (kv[0], 1)
    ).collect())
    assert set(out) == {0, 1, 2}
    assert all(type(k) is int for k in out)
    grouped = pc.group_by(lambda v: v).collect()
    keys = [k for k, _ in grouped]
    assert sorted(keys) == [0, 1, 2] and all(type(k) is int for k in keys)


def test_combine_by_bounded_flush(spark, monkeypatch):
    """Partial-agg memory bound: with the cap forced tiny, the
    per-partition accumulator table flushes repeatedly mid-stream and
    the post-shuffle merge must still produce exact per-key results
    (multiple flushes from one partition == partials from many)."""
    import datasplash_spark.objectmode as om

    monkeypatch.setattr(om, "_PARTIAL_CACHE_CAP", 3)
    items = [(f"k{i % 7}", i) for i in range(100)]
    pc = PCollection.from_items(spark, items)
    got = dict(
        pc.map(lambda kv: kv)  # exercise fusion into the partial pass
        .combine_by(
            lambda kv: kv[0],
            CombineFn.of(
                {
                    "init": lambda: 0,
                    "reduce": lambda acc, kv: acc + kv[1],
                    "combine": lambda a, b: a + b,
                }
            ),
        )
        .collect()
    )
    expected = Counter()
    for k, v in items:
        expected[k] += v
    assert got == dict(expected)


@pytest.mark.parametrize("n_distinct_off", [-1, 0, 1])
def test_combine_by_cap_boundary_equals_uncapped(
    spark, monkeypatch, n_distinct_off
):
    """VERDICT r4 item 6: the flush predicate changes the partial-agg
    path exactly AT ``_PARTIAL_CACHE_CAP`` — pin cap−1 / cap / cap+1
    distinct keys to output-equality with the uncapped path (each key
    seen several times, interleaved, so a flush mid-stream splits
    some key's accumulator across partial frames)."""
    import datasplash_spark.objectmode as om

    cap = 4
    n_distinct = cap + n_distinct_off
    items = [
        (f"k{i % n_distinct}", i * (-1 if i % 3 else 1))
        for i in range(10 * n_distinct)
    ]
    combiner = CombineFn.of(
        {
            "init": lambda: 0,
            "reduce": lambda acc, kv: acc + kv[1],
            "combine": lambda a, b: a + b,
        }
    )

    def run() -> dict:
        pc = PCollection.from_items(spark, items)
        return dict(
            pc.combine_by(lambda kv: kv[0], combiner).collect()
        )

    monkeypatch.setattr(om, "_PARTIAL_CACHE_CAP", cap)
    capped = run()
    monkeypatch.setattr(om, "_PARTIAL_CACHE_CAP", 1_000_000)
    assert capped == run()


def test_keybytes_cap_boundary_pure():
    """_KeyBytes beyond its cap must keep returning the same bytes as
    the direct path (new keys just stop being memoized) — straddle
    the boundary with hypothesis-style exhaustive small cases."""
    from datasplash_spark.objectmode import _KeyBytes, _key_bytes

    for cap in (1, 2, 3):
        for n_keys in (cap - 1, cap, cap + 1, cap + 5):
            kb = _KeyBytes(cap)
            keys = [("k", i) for i in range(max(n_keys, 0))] * 3
            for k in keys:
                assert kb(k) == _key_bytes(k)
            assert len(kb.cache) <= cap


# ------------------------------------------------- side outputs / timestamps


def test_side_outputs_basic(spark):
    """api_test.clj:532-544: map with :side-outputs returns one pcoll
    per declared tag."""
    from datasplash_spark.objectmode import side_outputs

    pc = PCollection.from_items(spark, [1, 2, 3, 4, 5])
    outs = pc.map(
        lambda x: side_outputs("simple", x, "multi", x * 10),
        side_outputs=["simple", "multi"],
    )
    assert set(outs) == {"simple", "multi"}
    assert _multiset(outs["simple"].collect()) == _multiset([1, 2, 3, 4, 5])
    assert _multiset(outs["multi"].collect()) == _multiset([10, 20, 30, 40, 50])


def test_side_outputs_untagged_goes_to_main(spark):
    """Untagged results route to the main output = first SORTED tag
    (core.clj:245)."""
    from datasplash_spark.objectmode import side_outputs

    pc = PCollection.from_items(spark, [1, 2, 3])
    outs = pc.map(
        lambda x: x if x % 2 else side_outputs("odd_b", x),
        side_outputs=["odd_b", "a_main"],
    )
    assert _multiset(outs["a_main"].collect()) == _multiset([1, 3])
    assert _multiset(outs["odd_b"].collect()) == _multiset([2])


def test_side_outputs_undeclared_tag_raises(spark):
    import pytest
    from datasplash_spark.objectmode import side_outputs

    pc = PCollection.from_items(spark, [1])
    outs = pc.map(
        lambda x: side_outputs("nope", x), side_outputs=["a", "b"]
    )
    with pytest.raises(Exception, match="undeclared"):
        outs["a"].collect()


def test_timestamped_results_and_propagation(spark):
    """core.clj:316-326: with_timestamp attaches an event timestamp;
    it survives downstream map/filter (Beam ParDo keeps the input
    element's timestamp) and is readable via timestamps()."""
    from datasplash_spark.objectmode import with_timestamp

    pc = PCollection.from_items(spark, [1, 2, 3])
    stamped = pc.map(lambda x: with_timestamp(100.0 + x, x))
    # propagate through a further map and a filter
    doubled = stamped.map(lambda x: x * 2).filter(lambda x: x < 6)
    got = dict((v, t) for t, v in doubled.timestamps().collect())
    assert got == {2: 101.0, 4: 102.0}


def test_timestamp_nested_in_side_outputs(spark):
    """core.clj:341-358: TimeStamped and MultiResult nest both ways —
    outer timestamp applies to all branches; inner overrides."""
    from datasplash_spark.objectmode import side_outputs, with_timestamp

    pc = PCollection.from_items(spark, [7])
    outs = pc.map(
        lambda x: with_timestamp(
            50.0,
            side_outputs(
                "plain", x,
                "stamped", with_timestamp(99.0, x * 2),
            ),
        ),
        side_outputs=["plain", "stamped"],
    )
    assert outs["plain"].timestamps().collect() == [(50.0, 7)]
    assert outs["stamped"].timestamps().collect() == [(99.0, 14)]


def test_timestamp_to_dataframe_field(spark):
    from datasplash_spark.objectmode import with_timestamp

    pc = PCollection.from_items(spark, [{"v": 1}, {"v": 2}])
    stamped = pc.map(lambda d: with_timestamp(float(d["v"]), d))
    df = stamped.to_dataframe(spark, "v bigint, ts double", timestamp_field="ts")
    rows = {r.v: r.ts for r in df.collect()}
    assert rows == {1: 1.0, 2: 2.0}


def test_pardo_side_outputs(spark):
    """map_partitions (pardo) with declared side_outputs routes a
    partition-level result stream."""
    from datasplash_spark.objectmode import side_outputs

    pc = PCollection.from_items(spark, [1, 2, 3, 4], num_partitions=2)

    def split(values):
        for v in values:
            yield side_outputs("evens" if v % 2 == 0 else "odds", v)

    outs = pc.map_partitions(split, side_outputs=["evens", "odds"])
    assert _multiset(outs["evens"].collect()) == _multiset([2, 4])
    assert _multiset(outs["odds"].collect()) == _multiset([1, 3])


def test_grouping_ignores_timestamps(spark):
    """Equal values that differ only in timestamp metadata group/key
    identically (ts is element metadata, not value)."""
    from datasplash_spark.objectmode import with_timestamp

    pc = PCollection.from_items(spark, [("a", 1), ("b", 2)])
    stamped = pc.map(lambda kv: with_timestamp(5.0, kv))
    grouped = dict(stamped.group_by_key().collect())
    assert grouped == {"a": [1], "b": [2]}


def test_group_by_key_hot_key(spark):
    """Deliberately skewed key: one key carrying 50k values (vs 5 for
    the other) assembles correctly — the documented bound is 'hottest
    key fits in an executor', and this pins the practical behavior."""
    hot = [("hot", i) for i in range(50_000)] + [("cold", i) for i in range(5)]
    pc = PCollection.from_items(spark, hot, num_partitions=8)
    grouped = dict(pc.group_by_key().collect())
    assert len(grouped["hot"]) == 50_000
    assert sorted(grouped["cold"]) == [0, 1, 2, 3, 4]
    assert sum(grouped["hot"]) == sum(range(50_000))


def test_group_by_key_giant_hot_key(spark):
    """×100 the hot-key test (VERDICT r8 item 6): a 5M-value single
    key through the streaming assembly — batches arrive at Arrow
    granularity and values append to one growing list, so the only
    memory held is the output contract's own (k, [v...]) list; the
    old applyInPandas path held the whole group three times over
    (Arrow batch + pandas frame + pickled rows) and a 10M-value key
    was the practical ceiling. Measured: 10M values assemble in
    ~34 s wall end-to-end (SCALING.md round 9)."""
    n = 5_000_000
    pc = PCollection.from_dataframe(spark.range(0, n, 1, 32)).map(
        lambda r: ("hot" if r["id"] % 1000 else "cold", r["id"])
    )
    grouped = dict(pc.group_by_key().collect())
    assert set(grouped) == {"hot", "cold"}
    assert len(grouped["hot"]) == n - n // 1000
    assert len(grouped["cold"]) == n // 1000
    assert sum(grouped["hot"]) + sum(grouped["cold"]) == n * (n - 1) // 2


def test_pardo_bundle_lifecycle(spark, tmp_path):
    """Full DoFn lifecycle (AbstractClojureDoFn.java:33-52):
    initialize → start_bundle → elements → finish_bundle (may emit) →
    teardown (always, even on error). One Spark task = one bundle."""
    marker_dir = tmp_path / "teardown_markers"
    marker_dir.mkdir()
    md = str(marker_dir)

    def init():
        return {"seen": 0}

    def start(sys_):
        sys_["started"] = True

    def process(values, sys_):
        assert sys_["started"]
        for v in values:
            sys_["seen"] += 1
            yield v * 2

    def finish(sys_):
        yield {"bundle_total": sys_["seen"]}

    def teardown(sys_):
        import os
        import uuid

        open(os.path.join(md, uuid.uuid4().hex), "w").close()

    pc = PCollection.from_items(spark, [1, 2, 3, 4], num_partitions=2)
    got = pc.map_partitions(
        process,
        initialize=init,
        start_bundle=start,
        finish_bundle=finish,
        teardown=teardown,
    ).collect()
    plain = sorted(v for v in got if isinstance(v, int))
    totals = sorted(v["bundle_total"] for v in got if isinstance(v, dict))
    assert plain == [2, 4, 6, 8]
    assert sum(totals) == 4 and len(totals) == 2  # one finish per bundle/task
    import os

    assert len(os.listdir(md)) == 2  # teardown ran once per task


def test_pardo_teardown_runs_on_error(spark, tmp_path):
    import os

    import pytest

    marker = tmp_path / "err_markers"
    marker.mkdir()
    md = str(marker)

    def boom(values):
        next(values)
        raise RuntimeError("kaboom")

    def teardown(_):
        import uuid

        open(os.path.join(md, uuid.uuid4().hex), "w").close()

    pc = PCollection.from_items(spark, [1, 2], num_partitions=1)
    with pytest.raises(Exception):
        pc.map_partitions(boom, teardown=teardown).collect()
    assert len(os.listdir(md)) >= 1


def test_partition_by(spark):
    """api_test.clj:486-498: partition-by routes by f(elem, n) into a
    list of n pcolls, one pass."""
    pc = PCollection.from_items(spark, list(range(10)))
    parts = pc.partition_by(lambda v, n: v % n, 3)
    assert len(parts) == 3
    assert _multiset(parts[0].collect()) == _multiset([0, 3, 6, 9])
    assert _multiset(parts[1].collect()) == _multiset([1, 4, 7])
    assert _multiset(parts[2].collect()) == _multiset([2, 5, 8])


def test_fusion_differential_vs_python(spark):
    """Differential check of operator fusion: a representative chain
    of element-wise ops must produce exactly what applying the same
    functions to a Python list produces — regardless of how many
    stages fuse into one mapInPandas."""
    from datasplash_spark.objectmode import CombineFn, PCollection

    data = list(range(-20, 21))

    def chain_py(xs):
        step1 = [x * 3 for x in xs]
        step2 = [y for y in step1 if y % 2 == 0]
        step3 = [z for x in step2 for z in (x, x + 1)]
        step4 = [w if w > 0 else None for w in step3]
        kept = [w for w in step4 if w is not None]
        agg = {}
        for w in kept:
            agg[w % 5] = agg.get(w % 5, 0) + w
        return agg

    pc = (
        PCollection.from_items(spark, data)
        .map(lambda x: x * 3)
        .filter(lambda y: y % 2 == 0)
        .mapcat(lambda x: (x, x + 1))
        .keep(lambda w: w if w > 0 else None)
        .combine_by(
            lambda w: w % 5,
            CombineFn(initf=lambda: 0, reducef=lambda a, w: a + w),
        )
    )
    # the whole chain above is ONE pre-shuffle Python pass: the plan
    # has exactly two Arrow evals (partial before / merge after the
    # per-key Exchange). Explain BEFORE executing — after a collect,
    # AQE prints final+initial plans and doubles every node count.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pc.df.explain("simple")
    plan = buf.getvalue()
    arrow_nodes = sum(
        plan.count(m) for m in ("MapInPandas", "FlatMapGroupsInPandas")
    )
    assert arrow_nodes == 2, plan
    got = dict(pc.collect())
    assert got == chain_py(data)


def test_api_parity_shims_kv_and_edn(spark):
    """make_kv/kv_key/kv_val tuple shims and the from_edn/to_edn
    PCollection transforms (full EDN reader, tagged literals kept)."""
    from datasplash_spark import objectmode as om

    kv = om.make_kv("a", 1)
    assert kv == ("a", 1) and om.kv_key(kv) == "a" and om.kv_val(kv) == 1

    pc = om.PCollection.from_items(
        spark, ['{:a 1, :b [1 2]}', "#{1 2}", "(1 2 3)"]
    )
    parsed = om.from_edn(pc).collect()
    assert {"a", "b"} == set(parsed[0].keys()) or any(
        isinstance(p, dict) for p in parsed
    )
    rendered = om.to_edn(om.from_edn(pc)).collect()
    reparsed = om.from_edn(
        om.PCollection.from_items(spark, rendered)
    ).collect()
    assert sorted(map(repr, reparsed)) == sorted(map(repr, parsed))


def test_make_partition_mapping_routes(spark):
    """make_partition_mapping + mapping_to_column route rows to the
    reference's partition indices, unknowns to the default."""
    from datasplash_spark.operators import (
        make_partition_mapping,
        mapping_to_column,
        partition_by,
    )
    from datasplash_spark.sources import generate_input

    mapping = make_partition_mapping(["en", "fr", "de"])
    assert mapping == {"en": 0, "fr": 1, "de": 2}
    df = generate_input(
        spark,
        [(1, "en"), (2, "fr"), (3, "de"), (4, "zz")],
        "id bigint, lang string",
    )
    parts = partition_by(
        df, mapping_to_column(mapping, "lang"), len(mapping)
    )
    got = [sorted(r.id for r in p.collect()) for p in parts]
    assert got == [[1, 4], [2], [3]]  # unknown 'zz' falls to default 0
