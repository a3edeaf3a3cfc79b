"""SparkSession factory.

The reference pins every app to parallelism 1 on a single TaskManager
(e.g. /root/reference/gmall-realtime/src/main/java/com/sqs/app/dim/DimApp.java:122).
We instead size for a real cluster: AQE on (runtime re-plan + skew-join
handling), Arrow for any pandas exchange, and shuffle partitions sized from
the environment. Session timezone defaults to UTC so results are directly
comparable with the DuckDB oracle; the reference's GMT+8 rendering
(R/utils/DateFormatUtil.java:21) is available via functions.datetime.GMALL_TZ
for the reference-faithful pipelines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "gmall-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    tz: str = "UTC",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    Scale notes (100 TB design intent):
      - AQE enabled: coalesces post-shuffle partitions, converts to broadcast
        joins at runtime, splits skewed partitions (skew-join) — replaces the
        reference's hand-set parallelism.
      - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
        real cluster set it ~2-3x total cores, AQE coalesces the rest.
      - Arrow enabled so any pandas UDF exchange is columnar-batched.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", tz)
        # testdata events.parquet stores TIMESTAMP(NANOS) which vanilla Spark
        # rejects; read as long and convert in io.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
