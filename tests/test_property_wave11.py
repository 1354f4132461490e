"""Property-based checks for the wave-10/11 algebraic identities vs
independent pure-Python references on hypothesis-generated inputs: the
gaps-and-islands streak trick, nearest-rank percentile selection, the
dyadic-decay baseline, and set containment-vs-jaccard dominance. The
oracle gate proves Spark == DuckDB; these prove the shared arithmetic
matches the textbook definition."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --- q248: gaps-and-islands == brute-force longest run ----------------------


def _islands_longest(days: set[int]) -> int:
    """The q248 identity: day - rank(day) is constant within an island."""
    groups: dict[int, int] = {}
    for rank, day in enumerate(sorted(days), start=1):
        key = day - rank
        groups[key] = groups.get(key, 0) + 1
    return max(groups.values())


def _brute_longest(days: set[int]) -> int:
    best = cur = 0
    prev = None
    for day in sorted(days):
        cur = cur + 1 if prev is not None and day == prev + 1 else 1
        best = max(best, cur)
        prev = day
    return best


@settings(max_examples=300, deadline=None)
@given(days=st.sets(st.integers(min_value=0, max_value=60), min_size=1))
def test_islands_trick_equals_brute_force(days):
    assert _islands_longest(days) == _brute_longest(days)


# --- q252: nearest-rank selection == sorted-list indexing -------------------


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1),
    p=st.sampled_from([1, 50, 90, 99, 100]),
)
def test_nearest_rank_selection_matches_definition(vals, p):
    n = len(vals)
    # the SQL form: value at ROW_NUMBER == (n*p + 99) div 100 over sorted order
    rank = (n * p + 99) // 100
    got = sorted(vals)[rank - 1]
    # textbook nearest-rank: smallest v with at least ceil(p*n/100) values <= v
    want = sorted(vals)[math.ceil(p * n / 100) - 1]
    assert got == want
    assert 1 <= rank <= n


# --- q240: dyadic decay weights -------------------------------------------


@settings(max_examples=200, deadline=None)
@given(counts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30))
def test_dyadic_decay_matches_weight_definition(counts):
    weights = [64, 32, 16, 8, 4, 2, 1]  # lag 1..7
    for t in range(len(counts)):
        decay = sum(
            w * (counts[t - i] if t - i >= 0 else 0)
            for i, w in enumerate(weights, start=1)
        )
        # the LAG-chain form evaluated directly
        lag = lambda i: counts[t - i] if t - i >= 0 else 0
        chain = (
            64 * lag(1) + 32 * lag(2) + 16 * lag(3) + 8 * lag(4)
            + 4 * lag(5) + 2 * lag(6) + lag(7)
        )
        assert chain == decay
        # burst rule: integer comparison equals the ratio comparison
        if decay > 0:
            assert (127 * counts[t] > 2 * decay) == (
                counts[t] / (decay / 127) > 2
            )


# --- q237: containment dominates jaccard ------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    a=st.sets(st.integers(min_value=0, max_value=50), min_size=1),
    b=st.sets(st.integers(min_value=0, max_value=50), min_size=1),
)
def test_containment_dominates_jaccard(a, b):
    inter = len(a & b)
    jacc = inter / len(a | b)
    cont = inter / min(len(a), len(b))
    assert cont >= jacc
    if a <= b or b <= a:
        assert cont == 1.0


# --- q245: RRF ordering is stable under the integer ppm form ----------------


@settings(max_examples=200, deadline=None)
@given(
    ranks=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=1, max_value=100)),
            st.one_of(st.none(), st.integers(min_value=1, max_value=100)),
        ).filter(lambda t: t[0] is not None or t[1] is not None),
        min_size=2,
        max_size=20,
    )
)
def test_rrf_integer_ppm_preserves_float_order(ranks):
    def fscore(lr, dr):
        return (1 / (60 + lr) if lr else 0.0) + (1 / (60 + dr) if dr else 0.0)

    def iscore(lr, dr):
        return (1000000 // (60 + lr) if lr else 0) + (
            1000000 // (60 + dr) if dr else 0
        )

    for (l1, d1) in ranks:
        for (l2, d2) in ranks:
            f1, f2 = fscore(l1, d1), fscore(l2, d2)
            # a strict float-order win never inverts under integer ppm
            # (ppm floors each term by < 1e-6; distinct rank-sum scores
            # differ by >= ~1e-4 at depth 100)
            if f1 > f2 + 1e-9:
                assert iscore(l1, d1) >= iscore(l2, d2)
