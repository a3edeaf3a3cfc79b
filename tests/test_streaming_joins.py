"""Stream-stream join + session-window parity (SURVEY §2.3 J1/J2/J7, §5
batch-as-oracle): the streaming interval join must agree with the same
join condition evaluated in batch; append-mode left-outer rows may only
be emitted once the watermark proves no match, so the final window's
pending rows are the allowed difference."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_flink_230422_spark.sources.files import stream_parquet
from gmall_flink_230422_spark.streaming.joins import interval_join, session_agg

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)

L_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("l_ts", T.TimestampType()),
        T.StructField("amount", T.LongType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("oid", T.LongType()),
        T.StructField("r_ts", T.TimestampType()),
        T.StructField("status", T.StringType()),
    ]
)

# left: 4 orders; order 3 never gets a detail (outer-join null case);
# order 4's detail arrives outside the 60 s range (range-miss case)
# watermark pushers: the global watermark is the MIN across sources, so
# BOTH streams need a far-future row for the last real join window to close
L_ROWS = [
    (1, T0, 10),
    (2, T0 + dt.timedelta(seconds=5), 20),
    (3, T0 + dt.timedelta(seconds=8), 30),
    (4, T0 + dt.timedelta(seconds=10), 40),
    (98, T0 + dt.timedelta(hours=2), 0),
]
R_ROWS = [
    (1, T0 + dt.timedelta(seconds=2), "paid"),
    (2, T0 + dt.timedelta(seconds=30), "paid"),
    (4, T0 + dt.timedelta(seconds=200), "late"),
    (99, T0 + dt.timedelta(hours=2), "noop"),
]


@pytest.fixture(scope="module")
def join_dir(spark):
    d = tempfile.mkdtemp(prefix="gmall_sjoin_")
    l_df = spark.createDataFrame(L_ROWS, L_SCHEMA)
    r_df = spark.createDataFrame(R_ROWS, R_SCHEMA)
    l_df.filter(F.col("order_id") <= 2).coalesce(1).write.parquet(f"{d}/l/f1")
    l_df.filter(F.col("order_id").isin(3, 4)).coalesce(1).write.parquet(f"{d}/l/f2")
    l_df.filter(F.col("order_id") == 98).coalesce(1).write.parquet(f"{d}/l/f3")
    r_df.filter(F.col("status") == "paid").coalesce(1).write.parquet(f"{d}/r/f1")
    r_df.filter(F.col("status") != "paid").coalesce(1).write.parquet(f"{d}/r/f2")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_stream(spark, out_df, name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _join(l_df, r_df, how):
    return interval_join(
        l_df,
        r_df,
        F.col("order_id") == F.col("oid"),
        "l_ts",
        "r_ts",
        watermark="5 seconds",
        lower="0 seconds",
        upper="60 seconds",
        how=how,
    )


def batch_pairs(spark, how):
    l_df = spark.createDataFrame(L_ROWS, L_SCHEMA)
    r_df = spark.createDataFrame(R_ROWS, R_SCHEMA)
    return {
        (r["order_id"], r["status"])
        for r in _join(l_df, r_df, how).collect()
    }


def test_interval_join_inner_matches_batch(spark, join_dir):
    l_src = stream_parquet(spark, f"{join_dir}/l/*", L_SCHEMA)
    r_src = stream_parquet(spark, f"{join_dir}/r/*", R_SCHEMA)
    got = run_stream(spark, _join(l_src, r_src, "inner"), "t_sj_inner")
    have = {(r["order_id"], r["status"]) for r in got.collect()}
    want = batch_pairs(spark, "inner")
    assert have == want
    assert want == {(1, "paid"), (2, "paid")}  # range excludes order 4; pushers don't pair


def test_interval_join_left_outer_matches_batch(spark, join_dir):
    l_src = stream_parquet(spark, f"{join_dir}/l/*", L_SCHEMA)
    r_src = stream_parquet(spark, f"{join_dir}/r/*", R_SCHEMA)
    got = run_stream(spark, _join(l_src, r_src, "left_outer"), "t_sj_outer")
    have = {(r["order_id"], r["status"]) for r in got.collect()}
    want = batch_pairs(spark, "left_outer")
    # every emitted row must match batch; null-extended rows require the
    # watermark to have closed their window (the far-future pusher row
    # guarantees it for all real orders)
    assert have <= want
    assert {(1, "paid"), (2, "paid")} <= have
    assert (3, None) in have, "watermark-closed unmatched row must null-extend"
    assert (4, None) in have, "range-miss must null-extend, not join"


def test_session_agg_stream_matches_batch(spark, join_dir):
    l_src = stream_parquet(spark, f"{join_dir}/l/*", L_SCHEMA)
    got = run_stream(
        spark,
        session_agg(
            l_src, "l_ts", "10 seconds", ["order_id"],
            [F.count(F.lit(1)).alias("ct"), F.sum("amount").alias("amt")],
            watermark="5 seconds",
        ),
        "t_session",
    )
    batch = session_agg(
        spark.createDataFrame(L_ROWS, L_SCHEMA),
        "l_ts", "10 seconds", ["order_id"],
        [F.count(F.lit(1)).alias("ct"), F.sum("amount").alias("amt")],
    )
    got_m = {
        (r["order_id"], r["session_start"], r["session_end"]): (r["ct"], r["amt"])
        for r in got.collect()
    }
    batch_m = {
        (r["order_id"], r["session_start"], r["session_end"]): (r["ct"], r["amt"])
        for r in batch.collect()
    }
    assert got_m == {k: v for k, v in batch_m.items() if k in got_m}
    assert len(got_m) >= 1
