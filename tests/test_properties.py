"""Property-based tests (hypothesis) for the pure-Python layers —
going beyond the reference's example-based-only strategy (SURVEY §5:
"No property-based/randomized testing" in datasplash)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datasplash_spark.functions import edn
from datasplash_spark.objectmode import CombineFn, _canon, _key_bytes
from datasplash_spark.schema import bqize_keys, clean_name

# EDN-serializable values: keywords are strings starting with ':',
# plain strings must not start with ':' (that's the keyword marker).
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=30).filter(lambda s: not s.startswith(":")),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1, max_size=10
    ).map(lambda s: ":" + s),
)

_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
            ).map(lambda s: ":" + s),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


@given(_value)
@settings(max_examples=300, deadline=None)
def test_edn_roundtrip_property(v):
    assert edn.loads(edn.dumps(v)) == v


@given(st.sets(st.integers(min_value=-100, max_value=100), max_size=6))
@settings(max_examples=100, deadline=None)
def test_edn_set_roundtrip(s):
    assert edn.loads(edn.dumps(s)) == s


@given(_value, _value)
@settings(max_examples=200, deadline=None)
def test_canonical_key_bytes_equality(a, b):
    """Equal values ⇒ equal key bytes; the shuffle-key contract."""
    if a == b:
        assert _key_bytes(a) == _key_bytes(b)
    # canonicalization is deterministic
    assert _canon(a) == _canon(a)


@given(st.dictionaries(st.integers(), st.integers(), min_size=2, max_size=8))
@settings(max_examples=100, deadline=None)
def test_canonical_key_dict_order_independent(d):
    items = list(d.items())
    shuffled = dict(reversed(items))
    assert _key_bytes(d) == _key_bytes(shuffled)


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_combiner_split_merge_equals_direct(xs):
    """The 4-phase combiner contract: any split into partial
    accumulators merged together equals the straight fold — what makes
    map-side partial aggregation correct."""
    fn = CombineFn(
        initf=lambda: (0, 0),
        reducef=lambda acc, v: (acc[0] + v, acc[1] + 1),
        combinef=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        extractf=lambda acc: acc[0] / acc[1],
    )
    direct = fn.init()
    for v in xs:
        direct = fn.reduce(direct, v)
    for cut in range(1, len(xs) + 1):
        left = fn.init()
        for v in xs[:cut]:
            left = fn.reduce(left, v)
        right = fn.init()
        for v in xs[cut:]:
            right = fn.reduce(right, v)
        assert fn.extract(fn.merge(left, right)) == fn.extract(direct)


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
    )
)
@settings(max_examples=200, deadline=None)
def test_clean_name_idempotent(s):
    assert clean_name(clean_name(s)) == clean_name(s)
    assert "-" not in clean_name(s) and "?" not in clean_name(s)


@given(
    st.recursive(
        st.integers(),
        lambda c: st.dictionaries(
            st.text(alphabet="ab-?", min_size=1, max_size=5), c, max_size=3
        ),
        max_leaves=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_bqize_keys_produces_clean_keys(v):
    def all_keys_clean(x):
        if isinstance(x, dict):
            return all(
                "-" not in k and "?" not in k and all_keys_clean(val)
                for k, val in x.items()
            )
        return True

    assert all_keys_clean(bqize_keys(v))
