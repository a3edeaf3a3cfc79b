"""Round-5 operator additions vs naive Python references: the CUSUM
prefix closed form, star-contraction CC (see test_dedup_similarity for
its union-find pin), and the Benford digit extraction. Hand-sized
semantic checks complementing the DuckDB oracle parity the registry
queries get (s_stream_cusum, e_benford, x_vocab_growth)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st


@given(
    xs=st.lists(st.integers(-100_000, 100_000), min_size=1, max_size=200),
    k=st.integers(-1000, 100_000),
)
def test_cusum_closed_form_equals_recurrence(xs, k):
    """S_t = max(0, S_{t-1} + (x_t - k)) == P_t - min(0, min_{j<=t} P_j):
    the identity that lets cusum_stream keep 3 BIGINTs of state and the
    oracle use two plain windows. Pure-Python pin of the algebra both
    engines rely on."""
    s_rec = 0
    prefix = 0
    min_prefix = 0
    for x in xs:
        d = x - k
        s_rec = max(0, s_rec + d)
        prefix += d
        min_prefix = min(min_prefix, prefix)
        s_closed = prefix - min(0, min_prefix)
        assert s_closed == s_rec


@given(cents=st.integers(1, 10**15))
def test_benford_first_digit_extraction(cents):
    """substring(cast(cents as string), 1, 1) == the first significant
    digit by repeated division — the string form both engines use."""
    d = cents
    while d >= 10:
        d //= 10
    assert int(str(cents)[0]) == d


def test_heaps_first_seen_decomposition():
    """vocab(prefix b) == sum over k<=b of |{tokens first seen in k}| —
    the identity behind x_vocab_growth's distributed cumulative DISTINCT."""
    docs = {
        0: ["a", "b"],
        1: ["b", "c"],
        2: ["a", "d", "e"],
        3: ["e"],
        4: ["f", "a"],
    }
    buckets = {doc: doc // 2 for doc in docs}  # 3 buckets: {0,1},{2,3},{4}
    first_seen: dict[str, int] = {}
    for doc in sorted(docs):
        for t in docs[doc]:
            first_seen.setdefault(t, buckets[doc])
    for b in range(3):
        direct = len({t for doc in sorted(docs) if buckets[doc] <= b for t in docs[doc]})
        decomposed = sum(1 for fb in first_seen.values() if fb <= b)
        assert direct == decomposed
