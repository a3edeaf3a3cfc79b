"""Property-based tests (hypothesis): operators vs naive Python reference
implementations on generated data — SURVEY §5's missing-in-reference test
depth. Example counts are kept small because each example round-trips
through Spark."""

import datetime as dt
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gmall_flink_230422_spark.functions.hashing import portable_hash64
from gmall_flink_230422_spark.operators import dedup
from gmall_flink_230422_spark.operators.stateful import detect_bounces, latest_by_key
from gmall_flink_230422_spark.streaming.joins import session_agg

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

T0 = dt.datetime(2024, 1, 1)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), st.text("ab", max_size=3)),
        min_size=1,
        max_size=30,
    )
)
def test_latest_by_key_matches_fold(spark, rows):
    """Changelog compaction == dict fold in (key, seq, uniq-tiebreak) order."""
    data = [(k, s, i, v) for i, (k, s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "seq", "uniq", "v"])
    got = {
        r["k"]: (r["seq"], r["uniq"], r["v"])
        for r in latest_by_key(df, ["k"], [F.col("seq"), F.col("uniq")]).collect()
    }
    want = {}
    for k, s, i, v in data:
        if k not in want or (s, i) > want[k][:2]:
            want[k] = (s, i, v)
    assert got == want


@SLOW
@given(
    deltas=st.lists(st.integers(0, 40), min_size=1, max_size=20),
    gap=st.integers(5, 15),
)
def test_session_agg_matches_python_sessionizer(spark, deltas, gap):
    """Session windows: same (start, end, count) sets as a linear scan with
    the gap rule end = last_event + gap."""
    ts, acc = [], 0
    for d in deltas:
        acc += d
        ts.append(T0 + dt.timedelta(seconds=acc))
    df = spark.createDataFrame([(1, t) for t in ts], ["k", "ts"])
    got = {
        (r["session_start"], r["session_end"], r["ct"])
        for r in session_agg(
            df, "ts", f"{gap} seconds", ["k"], [F.count(F.lit(1)).alias("ct")]
        ).collect()
    }
    want = set()
    uniq = sorted(set(ts))
    start, prev, n = uniq[0], uniq[0], 0
    counts = {t: ts.count(t) for t in uniq}
    for t in uniq:
        if (t - prev).total_seconds() > gap:
            want.add((int(start.timestamp()), int(prev.timestamp()) + gap, n))
            start, n = t, 0
        n += counts[t]
        prev = t
    want.add((int(start.timestamp()), int(prev.timestamp()) + gap, n))
    assert got == want


@SLOW
@given(
    texts=st.lists(st.text("abc d", min_size=0, max_size=12), min_size=1, max_size=12)
)
def test_exact_dedup_partition_property(spark, texts):
    """Dedup groups partition the corpus: counts sum to N, canonicals are
    group minima, distinct normalized texts == number of groups."""
    data = list(enumerate(texts))
    df = spark.createDataFrame(data, ["doc_id", "text"])
    rows = dedup.exact_dedup_groups(df).collect()
    assert sum(r["n_docs"] for r in rows) == len(data)
    norm = {}
    for i, t in data:
        norm.setdefault(t.strip().lower(), []).append(i)
    assert len(rows) == len(norm)
    assert {r["canonical_id"] for r in rows} == {min(v) for v in norm.values()}


@SLOW
@given(s=st.text(min_size=0, max_size=20))
def test_portable_hash_matches_python_md5(spark, s):
    """The Spark conv/substr/md5 construction == python int(md5[:15], 16)."""
    df = spark.createDataFrame([(s,)], ["x"])
    got = df.select(portable_hash64(F.col("x")).alias("h")).collect()[0]["h"]
    want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert got == want


@SLOW
@given(
    deltas=st.lists(st.integers(1, 30), min_size=1, max_size=15),
    gap=st.integers(5, 15),
)
def test_bounce_detection_matches_simulation(spark, deltas, gap):
    """Batch bounce predicate == linear per-key simulation: an entry (gap
    from predecessor) is a bounce iff its successor is absent within the
    gap or is itself an entry."""
    ts, acc = [], 0
    for d in deltas:
        acc += d
        ts.append(T0 + dt.timedelta(seconds=acc))
    df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(ts)], ["k", "ts", "eid"]
    )
    got = {
        r["eid"]
        for r in detect_bounces(df, "k", "ts", gap, ["eid"]).collect()
        if r["is_bounce"]
    }
    want = set()
    for i, t in enumerate(ts):
        is_entry = i == 0 or (t - ts[i - 1]).total_seconds() > gap
        if not is_entry:
            continue
        if i + 1 == len(ts):
            want.add(i)
        else:
            nxt = ts[i + 1]
            if (nxt - t).total_seconds() > gap:
                want.add(i)
    assert got == want
