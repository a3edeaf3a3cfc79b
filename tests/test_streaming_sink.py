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
