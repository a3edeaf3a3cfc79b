"""CDC-envelope operators (the kernel behind 9 of the 13 SQL DWD apps).

Reference envelope (Maxwell → ``topic_db``), declared at
R/utils/MyKafkaUtil.java:79-89: ``database STRING, table STRING, type STRING,
data MAP<STRING,STRING>, old MAP<STRING,STRING>, pt AS PROCTIME()``. The
whole business row travels as a string→string map; typing is deferred to
query time via cast (R/app/dwd/DwdTradeCartAdd.java:31).

We keep that contract: ``cdc_table`` routes + type-filters, ``map_project``
does the ``data['k'] AS k`` wide projections, ``transition_filter`` encodes
the old-value state-transition predicates, ``delta_column`` the
insert-vs-update conditional delta. All pure Column expressions — fully
inside Catalyst/codegen, filters push down to the source scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# FIXTURES.md A1 — Maxwell CDC envelope
CDC_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("old", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.StringType()),
    ]
)

# type values seen in the envelope (DimApp.java:153 keeps the first three)
CDC_TYPES = ("insert", "update", "delete", "bootstrap-insert")


def parse_cdc(df: DataFrame, json_col: str = "value") -> DataFrame:
    """S3: raw JSON strings → typed CDC envelope (+ proc_time ≙ PROCTIME())."""
    return (
        df.withColumn("_e", F.from_json(F.col(json_col), CDC_SCHEMA))
        # malformed JSON parses to an all-NULL struct: a usable CDC record
        # needs at least the routing key and the row image
        .filter(F.col("_e.table").isNotNull() & F.col("_e.data").isNotNull())
        .select("_e.*")
        .withColumn("proc_time", F.current_timestamp())
    )


def cdc_table(
    df: DataFrame,
    table: str,
    types: tuple[str, ...] = ("insert",),
    database: str = "gmall",
) -> DataFrame:
    """P2+P4: route filter ``database='gmall' AND table=X AND type IN (...)``
    (DwdTradeCartAdd.java:41-49, DimApp.java:142-160)."""
    return df.filter(
        (F.col("database") == database)
        & (F.col("table") == table)
        & F.col("type").isin(*types)
    )


def map_project(df: DataFrame, fields: dict[str, str], keep: list[str] | None = None) -> DataFrame:
    """P3: ``data['id'] AS id, ...`` wide projection from the CDC map
    (DwdTradeOrderPreProcess.java:25-43 and every SQL DWD app)."""
    cols: list[Column] = [F.col(c) for c in (keep or [])]
    cols += [F.col("data").getItem(src).alias(dst) for dst, src in fields.items()]
    return df.select(*cols)


def transition_filter(df: DataFrame, field: str, to_value: str) -> DataFrame:
    """P5: old-value state-transition predicate —
    ``old['f'] IS NOT NULL AND data['f'] = v`` detects the transition *into*
    ``v`` (DwdTradeCancelDetail.java:89-92 for order_status 1003; same shape
    in DwdTradeOrderRefund.java:78-80, DwdTradeRefundPaySuc.java:64-67)."""
    return df.filter(
        F.col("old").getItem(field).isNotNull()
        & (F.col("data").getItem(field) == to_value)
    )


def delta_column(df: DataFrame, field: str, alias: str) -> DataFrame:
    """P6: conditional delta —
    ``if(type='insert', f, cast(data.f as int) - cast(old.f as int))``
    (DwdTradeCartAdd.java:31,44-49); rows with non-positive delta dropped,
    matching the reference's ``where`` clause."""
    data_v = F.col("data").getItem(field).cast("int")
    old_v = F.col("old").getItem(field).cast("int")
    delta = F.when(F.col("type") == "insert", data_v).otherwise(data_v - old_v)
    return df.withColumn(alias, delta).filter(F.col(alias) > 0)
