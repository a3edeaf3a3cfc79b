"""Stateful-operator semantics, batch/oracle form (SURVEY §2.5).

Each of the reference's keyed-state operators has a precise batch
re-statement as an analytic-window expression; the streaming variants (in
``streaming/``) share these semantics, so the DuckDB oracle on the batch
path validates the logic. All are single-shuffle (one hash partition by key)
and contain no Python — at 100 TB they run as partitioned window aggs.

Reference cites:
  T2 is_new repair  — BaseLogApp.java:56-91 (ValueState<lastVisitDate>)
  T3 daily UV dedup — DwdTrafficUniqueVisitorDetail.java:55-84 (1-day TTL)
  T4 home/detail UV — DwsTrafficPageViewWindow.java:67-115 (2 ValueStates)
  T5 bounce (CEP)   — DwdTrafficUserJumpDetail.java:48-82 (match ∪ timeout)
  S8 upsert-latest  — MyKafkaUtil.java:91-100 upsert-kafka changelog
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_per_key_day(
    df: DataFrame, key_cols: list[str], ts_col: str, order_extra: list[str] | None = None
) -> DataFrame:
    """T3/T4: keep the first event per (key, day).

    The reference keeps a last-date ValueState with a 1-day TTL and passes
    only the first sighting per day; batch form = row_number over
    (key, to_date(ts)) ordered by ts. Streaming form =
    ``dropDuplicates([*keys, "cur_date"])`` (see streaming.pipelines).
    """
    day = F.to_date(F.col(ts_col)).alias("cur_date")
    w = Window.partitionBy(*key_cols, day).orderBy(
        F.col(ts_col), *[F.col(c) for c in (order_extra or [])]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def repair_is_new(df: DataFrame, key: str, ts_col: str) -> DataFrame:
    """T2: new-visitor flag repair. A visitor is genuinely new on a day only
    if it's their first day ever seen (BaseLogApp.java:79-88 rewrites
    is_new=1 to 0 when state holds an earlier date). Batch form: compare the
    row's date with min(date) over the visitor's whole history."""
    w = Window.partitionBy(key)
    cur = F.to_date(F.col(ts_col))
    first = F.min(cur).over(w)
    return df.withColumn("is_new", F.when(cur == first, 1).otherwise(0))


def detect_bounces(
    df: DataFrame, key: str, ts_col: str, gap_seconds: int, order_extra: list[str] | None = None
) -> DataFrame:
    """T5: CEP bounce detection, batch form.

    Reference pattern (DwdTrafficUserJumpDetail.java:48-82): an *entry* event
    (no predecessor within the horizon) whose successor is absent within 10 s
    (timeout side output) or is itself another entry (match) is a bounce;
    both cases are unioned. Equivalent predicate with lag/lead over
    (key ORDER BY ts):
        entry  := prev ts IS NULL OR ts - prev > gap
        bounce := entry AND (next ts IS NULL OR next - ts > gap)
    Adds boolean columns ``is_entry``/``is_bounce``.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col), *[F.col(c) for c in (order_extra or [])]
    )
    ts = F.col(ts_col).cast("double")
    prev_ts = F.lag(ts).over(w)
    next_ts = F.lead(ts).over(w)
    is_entry = prev_ts.isNull() | (ts - prev_ts > gap_seconds)
    is_bounce = is_entry & (next_ts.isNull() | (next_ts - ts > gap_seconds))
    return df.withColumn("is_entry", is_entry).withColumn("is_bounce", is_bounce)


def latest_by_key(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """S8: upsert-kafka changelog compaction — keep the newest row per key.

    Reference writes a keyed changelog topic (primary key NOT ENFORCED,
    MyKafkaUtil.java:91-100); readers see only the latest row per key. Batch
    form: row_number over key ordered by the sequence columns descending.
    Scale note: this is a single hash shuffle; for heavy keys AQE skew-split
    applies, and the window uses partial sort within partitions.
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def changelog_to_retract(
    df: DataFrame, keys: list[str], order_by: list[Column], payload: list[str]
) -> DataFrame:
    """Changelog → retract-stream conversion (Flink's changelog semantics,
    the contract behind upsert-kafka, SURVEY §2.1 S8): per key, the first
    version emits ``+I``; every later version emits ``-U`` retracting the
    previous payload followed by ``+U`` asserting the new one — exactly the
    RowKind sequence a Flink retract sink receives.

    One keyed window shuffle: each row looks back one version with ``lag``
    and emits its retraction + assertion via an inline array explode (no
    self-join, no second shuffle). Output: keys, version, row_kind, payload.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    ver = F.row_number().over(w)
    rows = df.select(
        *keys,
        ver.alias("version"),
        F.struct(*[F.col(c) for c in payload]).alias("_cur"),
        F.lag(F.struct(*[F.col(c) for c in payload])).over(w).alias("_prev"),
    )
    kinds = rows.select(
        *keys,
        "version",
        F.explode(
            F.when(
                F.col("version") == 1,
                F.array(F.struct(F.lit("+I").alias("row_kind"), F.col("_cur").alias("p"))),
            ).otherwise(
                F.array(
                    F.struct(F.lit("-U").alias("row_kind"), F.col("_prev").alias("p")),
                    F.struct(F.lit("+U").alias("row_kind"), F.col("_cur").alias("p")),
                )
            )
        ).alias("_k"),
    )
    return kinds.select(
        *keys,
        "version",
        F.col("_k.row_kind").alias("row_kind"),
        *[F.col(f"_k.p.{c}").alias(c) for c in payload],
    )


def transition_rows(
    df: DataFrame, key: str, status_col: str, to_value: str, order_by: list[Column]
) -> DataFrame:
    """P5 (derived form): detect rows where ``status`` transitions into
    ``to_value`` within a key's ordered history — the batch analog of the
    CDC old-value predicate when no explicit ``old`` map exists."""
    w = Window.partitionBy(key).orderBy(*order_by)
    prev = F.lag(F.col(status_col)).over(w)
    return (
        df.withColumn("_prev", prev)
        .filter((F.col(status_col) == to_value) & F.col("_prev").isNotNull()
                & (F.col("_prev") != to_value))
        .drop("_prev")
    )
