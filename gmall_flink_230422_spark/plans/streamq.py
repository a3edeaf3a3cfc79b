"""Driver-visible STREAMING queries: the windowed aggregates of the gmall
surface executed end-to-end through Structured Streaming, returning their
final result as a batch DataFrame so the driver harness (and the DuckDB
oracle) can check the streaming execution path itself — not just the batch
twin.

Mechanics per query:

1. re-chunk the fixture table into a multi-file parquet dir (8 files) so the
   file stream replays as several micro-batches (``maxFilesPerTrigger``) —
   the deterministic Kafka stand-in (sources/files.py);
2. run the SAME operator composition as the batch twin
   (``operators/windows.py``) on the ``readStream`` DataFrame;
3. land the complete-mode aggregate image via ``foreachBatch`` +
   ``Trigger.AvailableNow`` (process-everything-then-stop) and read the
   final image back.

Because complete mode emits the full aggregate state and AvailableNow
drains every file, the result is batch-equal by construction — each query
reuses its batch twin's oracle VERBATIM (gmall.ORACLE_*). Complete mode
retains all window state: correct here (bounded window count), while the
production path for unbounded horizons is the watermark+append form proven
batch-equal in tests/test_streaming.py.

Reference parity: the same 10 s-window pipelines as
DwsTrafficVcChArIsNewPageViewWindow.java:43-86 /
DwsTrafficSourceKeywordPageViewWindow.java:145-154, transport per
MyKafkaUtil.java:21-60 (file-stream stand-in — no broker in the sandbox).
"""

from __future__ import annotations

import tempfile
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import windows
from ..sources import files
from . import QuerySpec
from .analytics import ORACLE_CUMULATE
from .gmall import ORACLE_TUMBLE_KEYED, ORACLE_UNION_PREAGG, ORACLE_UPSERT


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a replayed multi-file micro-batch stream (ts already
    micros — the nanos conversion happens in the batch re-chunk write)."""
    tmp = tempfile.mkdtemp(prefix="streamq_src_")
    src = os.path.join(tmp, "events")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(8).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    return files.stream_parquet(spark, src, schema, files_per_trigger=2)


def _drain_complete(out: DataFrame, name: str) -> str:
    """Run a streaming aggregate to completion (AvailableNow), landing the
    final complete-mode image as parquet; returns the image path."""
    tmp = tempfile.mkdtemp(prefix=f"streamq_{name}_")
    image = os.path.join(tmp, "image")
    ck = os.path.join(tmp, "ck")
    q = (
        out.writeStream.outputMode("complete")
        .foreachBatch(lambda b, _i: b.write.mode("overwrite").parquet(image))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return image


def q_stream_tumble_keyed(spark, sf_dir):
    """A1 through the streaming engine: keyed 1-hour tumble on the replayed
    event stream; final image == batch a1_tumble_keyed."""
    ev = _events_stream(spark, sf_dir)
    out = windows.tumble(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("ct"), F.round(F.sum("value"), 2).alias("value_sum")],
    )
    return spark.read.parquet(_drain_complete(out, "a1"))


def q_stream_union_preagg(spark, sf_dir):
    """A4+T8 through the streaming engine: three filtered branches 1-hot
    encoded, unioned, day-tumbled; final image == batch a4_union_preagg."""
    ev = _events_stream(spark, sf_dir)
    branches = [
        (ev.filter(F.col("event_type") == "view"), {"pv_ct": F.lit(1)}),
        (ev.filter(F.col("event_type") == "click"), {"click_ct": F.lit(1)}),
        (ev.filter(F.col("event_type") == "error"), {"err_ct": F.lit(1)}),
    ]
    unioned = windows.one_hot_branches(branches, ["ts"])
    out = windows.tumble(
        unioned,
        "ts",
        "1 day",
        [],
        [
            F.sum("pv_ct").alias("pv_ct"),
            F.sum("click_ct").alias("click_ct"),
            F.sum("err_ct").alias("err_ct"),
        ],
    )
    return spark.read.parquet(_drain_complete(out, "a4"))


def q_stream_cumulate(spark, sf_dir):
    """CUMULATE through the streaming engine (the windows.cumulate_streaming
    + cumulate_rollup split: watermark-friendly per-step tumble partials
    drained via AvailableNow, growing windows rolled up read-side). value_sum
    partials are exact on the fixture's 2-dec value grid, so the re-rounded
    rollup equals the batch/oracle total exactly."""
    ev = _events_stream(spark, sf_dir)
    partial = windows.cumulate_streaming(
        ev,
        "ts",
        "1 hour",
        "4 hours",
        ["event_type"],
        [F.count(F.lit(1)).alias("ct"), F.round(F.sum("value"), 2).alias("value_sum")],
    )
    image = spark.read.parquet(_drain_complete(partial, "cum"))
    return windows.cumulate_rollup(
        image,
        "1 hour",
        "4 hours",
        ["event_type"],
        [F.sum("ct").alias("ct"), F.round(F.sum("value_sum"), 2).alias("value_sum")],
    )


def q_stream_upsert_latest(spark, sf_dir):
    """S8+T11 through the streaming engine: the orders changelog replayed as
    a multi-file micro-batch stream into a CHECKPOINTED foreachBatch running
    the idempotent MERGE-by-key writer (sinks.upsert_parquet) — the repo's
    exactly-once sink model (checkpoint replay + idempotent merge). The
    compaction is associative (latest by a total order), so the final store
    equals batch s8_upsert_latest regardless of micro-batch boundaries."""
    from .. import sinks

    tmp = tempfile.mkdtemp(prefix="streamq_s8_")
    src = os.path.join(tmp, "src")
    store = os.path.join(tmp, "store")
    ck = os.path.join(tmp, "ck")
    o = load_table(spark, sf_dir, "orders")
    o.repartition(8).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = files.stream_parquet(spark, src, schema, files_per_trigger=2)

    def _merge(batch: DataFrame, _i: int) -> None:
        sinks.upsert_parquet(
            spark,
            batch.select(
                "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
            ),
            store,
            ["o_custkey"],
            ["o_orderdate", "o_orderkey"],
        )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store).select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"
    )


SPECS = (
    QuerySpec(
        "s_stream_upsert_latest", q_stream_upsert_latest, ORACLE_UPSERT,
        doc="S8+T11 executed via streaming: checkpointed foreachBatch + idempotent MERGE",
        tags=("S8", "T11", "S6", "streaming"),
    ),
    QuerySpec(
        "s_stream_cumulate", q_stream_cumulate, ORACLE_CUMULATE,
        doc="CUMULATE via streaming: per-step tumble partials + read-side rollup",
        tags=("A5", "T1", "streaming"),
    ),
    QuerySpec(
        "s_stream_tumble_keyed", q_stream_tumble_keyed, ORACLE_TUMBLE_KEYED,
        doc="A1 executed via Structured Streaming (AvailableNow replay), batch-equal",
        tags=("A1", "T1", "S1", "streaming"),
    ),
    QuerySpec(
        "s_stream_union_preagg", q_stream_union_preagg, ORACLE_UNION_PREAGG,
        doc="A4+T8 executed via Structured Streaming (AvailableNow replay), batch-equal",
        tags=("A4", "T8", "T1", "S1", "streaming"),
    ),
)
