"""Batch forms of the keyed-state operators (SURVEY §2.5), edge cases the
oracle queries don't isolate — especially T5 bounce match-vs-timeout."""

import datetime as dt

from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators.stateful import (
    detect_bounces,
    first_per_key_day,
    latest_by_key,
    repair_is_new,
    transition_rows,
)


def ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id"])


T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def s(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_first_per_key_day(spark):
    df = ev(spark, [(1, s(0), 1), (1, s(5), 2), (1, s(86400), 3), (2, s(1), 4)])
    out = first_per_key_day(df, ["user_id"], "ts", ["event_id"])
    assert {r["event_id"] for r in out.collect()} == {1, 3, 4}


def test_repair_is_new(spark):
    """is_new=1 only on the first-ever day (BaseLogApp.java:79-88)."""
    df = ev(spark, [(1, s(0), 1), (1, s(86400), 2), (2, s(86400), 3)])
    out = {r["event_id"]: r["is_new"] for r in repair_is_new(df, "user_id", "ts").collect()}
    assert out == {1: 1, 2: 0, 3: 1}


def test_bounce_match_and_timeout(spark):
    """T5 edge cases (DwdTrafficUserJumpDetail.java:48-82):
    - entry followed by entry within horizon → first is a bounce (match)
    - entry with no successor → bounce (timeout side-output)
    - entry followed quickly by non-entry → NOT a bounce
    """
    gap = 10
    rows = [
        # user 1: e1 entry, e2 is 30s later (> gap) so e2 is an entry too →
        # e1 bounce by "next is an entry"; e2 is last → bounce by timeout
        (1, s(0), 1), (1, s(30), 2),
        # user 2: entry then activity 5s later → not a bounce; successor
        # chain ends → the non-entry e4 is not an entry so no bounce there
        (2, s(0), 3), (2, s(5), 4),
        # user 3: single event → entry + timeout bounce
        (3, s(0), 5),
    ]
    out = detect_bounces(ev(spark, rows), "user_id", "ts", gap, ["event_id"])
    flags = {r["event_id"]: (r["is_entry"], r["is_bounce"]) for r in out.collect()}
    assert flags[1] == (True, True)   # match-case bounce
    assert flags[2] == (True, True)   # timeout-case bounce
    assert flags[3] == (True, False)  # has a quick successor
    assert flags[4] == (False, False)
    assert flags[5] == (True, True)   # timeout-case bounce


def test_latest_by_key(spark):
    df = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 5, "only")], ["k", "seq", "v"]
    )
    out = {r["k"]: r["v"] for r in latest_by_key(df, ["k"], [F.col("seq")]).collect()}
    assert out == {1: "new", 2: "only"}


def test_transition_rows(spark):
    df = spark.createDataFrame(
        [(1, 1, "O"), (1, 2, "F"), (1, 3, "F"), (2, 1, "F")], ["k", "seq", "st"]
    )
    out = transition_rows(df, "k", "st", "F", [F.col("seq")]).collect()
    # only the O→F flip; F→F repeat and first-ever F (no prev) excluded
    assert [(r["k"], r["seq"]) for r in out] == [(1, 2)]
