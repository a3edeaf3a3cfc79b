"""Testdata loaders.

Tables per TESTDATA.md: region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.

``events.ts`` is written as parquet TIMESTAMP(NANOS); Spark reads it as a
long (``spark.sql.legacy.parquet.nanosAsLong=true``, set by session.get_spark)
and we convert to a microsecond timestamp here, matching DuckDB's
nanos→micros truncation so oracle comparisons line up exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros (truncating, same as DuckDB's parquet reader)
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 32
) -> None:
    """Materialize a DataFrame hash-bucketed (and sorted) by join keys.

    Bucketing is the 100 TB co-location strategy: two tables bucketed by the
    same keys into the same bucket count join with ZERO shuffle on either
    side (Spark matches bucket specs and plans a shuffle-free sort-merge
    join). The write itself shuffles once — paid one time, amortized over
    every subsequent join/aggregate on the keys. Uses the session catalog
    (parquet source table under spark.sql.warehouse.dir).
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (bare names, like the DuckDB oracle)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
