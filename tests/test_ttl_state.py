"""Wall-clock (processing-time) state TTL — streaming/stateful.py
ttl_latest_stream. This is the one operator whose semantics follow the
processing clock (like the reference's StateTtlConfig), so it is verified
against wall time with generous margins instead of a DuckDB oracle.

NOTE: never drive a ProcessingTimeTimeout query with processAllAvailable()
— re-arming wall-clock timers mean the engine always has pending work, so
it blocks forever; poll the sink table instead (operator docstring)."""

from __future__ import annotations

import time

from gmall_flink_230422_spark.sources.files import stream_parquet
from gmall_flink_230422_spark.streaming.stateful import ttl_latest_stream

SCHEMA = "k string, v string"


def test_ttl_state_expires_on_wall_clock(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    (tmp_path / "in").mkdir()

    def land(chunk, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src_dir}/c{chunk}"
        )

    def poll(q, pred, secs):
        deadline = time.time() + secs
        while time.time() < deadline:
            rows = {tuple(r) for r in spark.sql("SELECT * FROM ttl_sink").collect()}
            if pred(rows):
                return rows
            time.sleep(1)
        return {tuple(r) for r in spark.sql("SELECT * FROM ttl_sink").collect()}

    land(1, [("A", "1")])
    src = stream_parquet(spark, f"{src_dir}/*", SCHEMA, files_per_trigger=1)
    out = ttl_latest_stream(src, "k", "v", ttl_seconds=2)
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        got = poll(q, lambda rows: ("A", "1", "updated") in rows, 30)
        assert ("A", "1", "updated") in got

        # wall clock passes the TTL; a later batch lets timers fire
        time.sleep(5)
        land(2, [("B", "9")])
        got = poll(q, lambda rows: any(r[2] == "expired" for r in rows), 45)
        assert ("A", "1", "expired") in got

        # state removed on expiry: a NEW event for A starts fresh ('updated'
        # again — no residue of the expired value)
        land(3, [("A", "2")])
        got = poll(q, lambda rows: ("A", "2", "updated") in rows, 30)
        assert ("A", "2", "updated") in got
    finally:
        q.stop()


def test_transitions_stream_drops_late_rows(spark, tmp_path):
    """ADVICE r3: transitions_stream's stored (last_ts, last_eid) must
    actually protect against out-of-order arrivals — a batch-2 row OLDER
    than the committed state is dropped, not emitted as a fabricated
    backwards transition."""
    import datetime as dt

    from gmall_flink_230422_spark.streaming.stateful import transitions_stream

    schema = "user_id bigint, event_type string, ts timestamp, event_id bigint"

    def t(m):
        return dt.datetime(2024, 1, 1, 10, m)

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [(1, "A", t(0), 1), (1, "B", t(5), 2)], schema
    ).coalesce(1).write.parquet(str(src / "c1"))
    time.sleep(1.1)  # distinct mtimes: c1 is its own micro-batch before c2
    spark.createDataFrame(
        [(1, "C", t(1), 3), (1, "D", t(10), 4)], schema
    ).coalesce(1).write.parquet(str(src / "c2"))

    stream = stream_parquet(spark, f"{src}/*", schema, files_per_trigger=1)
    out = transitions_stream(stream, key="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("trans_late_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(tuple(r) for r in spark.sql("SELECT * FROM trans_late_sink").collect())
    # late C (ts 10:01 < committed 10:05) dropped: no (B, C) / (C, D)
    assert rows == [("A", "B"), ("B", "D")]
