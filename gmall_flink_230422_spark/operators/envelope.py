"""Log-envelope operators (ODS → DWD traffic layer).

Reference: BaseLogApp parses ``topic_log`` JSON with fastjson, routes dirty
lines to a side output (R/app/dwd/BaseLogApp.java:36-52), splits the stream
five ways (start/page/display/action/err, :93-156) and explodes the
``displays[]``/``actions[]`` arrays enriched with common/page_id/ts
(:122-144).

Spark-first shape: one ``from_json`` pass; corrupt rows are simply null
structs, so the dirty split is two filters on the same parsed DataFrame (no
side-output machinery needed, and Catalyst shares the scan). Explosion is
``explode`` + select — whole-stage-codegen friendly, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# FIXTURES.md A2 — the implicit schema of the reference log envelope
LOG_SCHEMA = T.StructType(
    [
        T.StructField(
            "common",
            T.StructType(
                [T.StructField(f, T.StringType()) for f in
                 ("ar", "ch", "vc", "mid", "uid", "is_new", "ba", "md", "os")]
            ),
        ),
        T.StructField(
            "page",
            T.StructType(
                [
                    T.StructField("page_id", T.StringType()),
                    T.StructField("last_page_id", T.StringType()),
                    T.StructField("item", T.StringType()),
                    T.StructField("item_type", T.StringType()),
                    T.StructField("during_time", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "displays",
            T.ArrayType(
                T.StructType(
                    [T.StructField(f, T.StringType()) for f in
                     ("item", "item_type", "pos_id")]
                )
            ),
        ),
        T.StructField(
            "actions",
            T.ArrayType(
                T.StructType(
                    [T.StructField(f, T.StringType()) for f in
                     ("action_id", "item", "item_type")]
                )
            ),
        ),
        T.StructField(
            "start",
            T.StructType(
                [
                    T.StructField("entry", T.StringType()),
                    T.StructField("loading_time", T.StringType()),
                ]
            ),
        ),
        T.StructField("err", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)


def parse_with_dirty_split(
    df: DataFrame, json_col: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """P1: try-parse JSON; (clean, dirty) DataFrames.

    Reference routes parse failures to an OutputTag (BaseLogApp.java:36-52);
    here corrupt rows parse to null and the split is two cheap filters.
    """
    parsed = df.withColumn("_parsed", F.from_json(F.col(json_col), schema))
    # from_json yields NULL for empty input but an all-NULL struct for
    # malformed JSON — a row is clean only if some envelope field parsed
    any_field = None
    for f in schema.fields:
        cond = F.col(f"_parsed.{f.name}").isNotNull()
        any_field = cond if any_field is None else (any_field | cond)
    valid = F.col("_parsed").isNotNull() & any_field
    clean = parsed.filter(valid).select(
        *[c for c in df.columns if c != json_col], "_parsed.*"
    )
    dirty = parsed.filter(~valid | valid.isNull()).drop("_parsed")
    return clean, dirty


def split_log_streams(parsed: DataFrame) -> dict[str, DataFrame]:
    """T6: the five-way side-output split of BaseLogApp.java:93-156.

    err → error log; start → start log; otherwise page log, with displays[]
    and actions[] exploded and enriched (page_id, ts, common carried along).
    Note the reference's sink wiring bug (dirty stream written to the display
    topic, BaseLogApp.java:172) is NOT replicated — we implement the intent.
    """
    err = parsed.filter(F.col("err").isNotNull())
    start = parsed.filter(F.col("err").isNull() & F.col("start").isNotNull())
    page = parsed.filter(F.col("err").isNull() & F.col("start").isNull())
    displays = explode_enriched(page, "displays")
    actions = explode_enriched(page, "actions")
    return {
        "err": err,
        "start": start.drop("displays", "actions", "err"),
        "page": page.drop("displays", "actions", "start", "err"),
        "display": displays,
        "action": actions,
    }


def explode_enriched(page: DataFrame, array_col: str) -> DataFrame:
    """T7: explode displays[]/actions[], enriched with common + page_id + ts
    (BaseLogApp.java:122-144)."""
    return page.select(
        "common",
        F.col("page.page_id").alias("page_id"),
        "ts",
        F.explode(array_col).alias("entry"),
    ).select("common", "page_id", "ts", "entry.*")


def prune_columns_by_config(df: DataFrame, sink_columns: list[str]) -> DataFrame:
    """P11: keep only configured sink columns, in config order
    (TableProcessFunction.java:306-324 filters JSON keys the same way)."""
    keep = [c for c in sink_columns if c in df.columns]
    return df.select(*keep)
