"""Streaming sink E2E: foreachBatch + upsert + checkpoint replay (SURVEY
§2.5 T11, §2.1 S7/S8/S11) — the engine's exactly-once story: checkpointed
offsets + an idempotent per-key MERGE sink."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_flink_230422_spark import sinks
from gmall_flink_230422_spark.sources.files import stream_parquet

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)

ROWS = [(1, 1, "a"), (2, 1, "b"), (1, 2, "a2"), (3, 1, "c"), (2, 2, "b2")]


def test_foreachbatch_upsert_with_checkpoint(spark):
    d = tempfile.mkdtemp(prefix="gmall_sink_")
    src, out, ckpt = f"{d}/src", f"{d}/out", f"{d}/ckpt"
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        # two files → two micro-batches; updates for ids 1/2 in batch 2
        df.filter(F.col("seq") == 1).coalesce(1).write.parquet(f"{src}/f1")

        def sink_batch(batch_df, batch_id):
            sinks.upsert_parquet(spark, batch_df, out, ["id"], ["seq"])

        def run():
            q = (
                stream_parquet(spark, f"{src}/*", SCHEMA)
                .writeStream.foreachBatch(sink_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        got1 = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
        assert got1 == {1: "a", 2: "b", 3: "c"}

        # second run with the same checkpoint: only the NEW file is
        # processed (offset replay), and the per-key merge upserts
        df.filter(F.col("seq") == 2).coalesce(1).write.parquet(f"{src}/f2")
        run()
        got2 = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
        assert got2 == {1: "a2", 2: "b2", 3: "c"}

        # third run, no new data: idempotent (nothing reprocessed)
        run()
        got3 = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
        assert got3 == got2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sink_failure_retry_is_exactly_once(spark):
    """T11: a sink that crashes mid-query is retried from the checkpoint on
    restart; the idempotent per-key MERGE makes the retry invisible — final
    state identical to a clean run, no duplicates."""
    d = tempfile.mkdtemp(prefix="gmall_sinkfail_")
    src, out, ckpt = f"{d}/src", f"{d}/out", f"{d}/ckpt"
    attempts = {"n": 0}
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        df.filter(F.col("seq") == 1).coalesce(1).write.parquet(f"{src}/f1")
        df.filter(F.col("seq") == 2).coalesce(1).write.parquet(f"{src}/f2")

        def flaky_sink(batch_df, batch_id):
            # write first, THEN fail once: the worst case — retried batch
            # re-merges rows that already landed
            sinks.upsert_parquet(spark, batch_df, out, ["id"], ["seq"])
            attempts["n"] += 1
            if attempts["n"] == 2:
                raise RuntimeError("injected sink failure")

        def run():
            q = (
                stream_parquet(spark, f"{src}/*", SCHEMA)
                .writeStream.foreachBatch(flaky_sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        with pytest.raises(Exception, match="injected sink failure"):
            run()
        run()  # restart: replays the failed batch, then finishes
        got = {r["id"]: (r["seq"], r["v"]) for r in spark.read.parquet(out).collect()}
        assert got == {1: (2, "a2"), 2: (2, "b2"), 3: (1, "c")}
        # each id appears exactly once despite the re-merged batch
        assert spark.read.parquet(out).count() == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_static_lookup_join(spark):
    """J3 streaming form: a streaming fact joins a static broadcast dim —
    no watermark needed, dim snapshot per micro-batch (proc-time lookup)."""
    from gmall_flink_230422_spark.operators.joins import lookup_join

    d = tempfile.mkdtemp(prefix="gmall_slookup_")
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        df.filter(F.col("seq") == 1).coalesce(1).write.parquet(f"{d}/src/f1")
        df.filter(F.col("seq") == 2).coalesce(1).write.parquet(f"{d}/src/f2")
        dim = spark.createDataFrame(
            [(1, "gold"), (2, "silver")], ["dim_id", "tier"]
        )
        src = stream_parquet(spark, f"{d}/src/*", SCHEMA)
        joined = lookup_join(src, dim, src["id"] == dim["dim_id"], "left_outer")
        q = (
            joined.writeStream.format("memory")
            .queryName("t_slookup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from t_slookup").collect()
        tiers = {(r["id"], r["seq"]): r["tier"] for r in rows}
        assert tiers[(1, 1)] == "gold" and tiers[(1, 2)] == "gold"
        assert tiers[(2, 1)] == "silver"
        assert tiers[(3, 1)] is None  # unmatched fact rows pass through
        assert len(rows) == len(ROWS)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_windowed_agg_checkpoint_recovery(spark):
    """T11 for stateful aggregation: a watermarked tumble stream stopped and
    restarted from its checkpoint resumes window state — late-arriving rows
    of an open window still merge, and no window is emitted twice."""
    import datetime as dt

    from gmall_flink_230422_spark.operators.windows import tumble
    from gmall_flink_230422_spark.sources.files import stream_parquet

    T0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    d = tempfile.mkdtemp(prefix="gmall_aggckpt_")
    src, ckpt = f"{d}/src", f"{d}/ckpt"
    rows1 = [(1, T0, 1), (1, T0 + dt.timedelta(seconds=30), 2)]
    rows2 = [(1, T0 + dt.timedelta(seconds=50), 3),
             (1, T0 + dt.timedelta(minutes=30), 4)]  # closes the first window
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )

    out = f"{d}/out"

    def run():
        win = tumble(
            stream_parquet(spark, f"{src}/*", schema),
            "ts", "1 minute", ["user_id"],
            [F.count(F.lit(1)).alias("ct")], watermark="10 seconds",
        )
        q = (
            win.writeStream.foreachBatch(
                lambda batch_df, _id: batch_df.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    try:
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{src}/f1")
        first = run()
        assert first == []  # window still open, nothing emitted yet
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(f"{src}/f2")
        second = run()  # restart from checkpoint: state for 10:00 window intact
        got = {(r["stt"], r["user_id"]): r["ct"] for r in second}
        stt0 = int(T0.timestamp())
        assert got[(stt0, 1)] == 3, "restored state must merge pre-restart rows"
        assert len([k for k in got if k[0] == stt0]) == 1, "window emitted once"
    finally:
        shutil.rmtree(d, ignore_errors=True)
