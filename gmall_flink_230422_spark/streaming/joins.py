"""Stream-stream joins (SURVEY §2.3 J1/J2/J5/J7) in their true Structured
Streaming form.

The reference joins order_detail ⋈ order_info etc. with Flink's unbounded
join state bounded by IdleStateRetention (5 s / 905 s wall-clock TTL,
DwdTradeOrderPreProcess.java:20, DwdTradePayDetailSuc.java:19). Spark's
model is event-time: both sides carry a watermark and the join condition
carries a time-range constraint; state is evicted once the watermark passes
the range. That is the documented semantic difference (J7): eviction by
event-time progress, not wall-clock idle time — same bounded-state
guarantee, deterministic under replay (wall-clock TTL is not).

At scale: a stream-stream join shuffles both sides on the equi keys once;
state size ≈ rate × range window, independent of total history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    watermark: str | None = "10 seconds",
    lower: str = "0 seconds",
    upper: str = "60 seconds",
    how: str = "inner",
) -> DataFrame:
    """J1/J2: equi-join two watermarked streams with the event-time range
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    ``how='left_outer'`` emits null-extended rows once the watermark proves
    no match can arrive (J2's left joins). ``on`` may be a composite
    condition (J5 multi-key). Batch DataFrames pass through with the same
    condition, which is what the oracle queries compare against.

    ``watermark=None`` skips the ``withWatermark`` calls — required when
    CHAINING joins (s_stream_order_preprocess): Spark forbids redefining a
    watermark downstream of a stateful operator, so in a multi-join
    topology each leaf stream is watermarked exactly once by the caller
    and the chain joins pass None.
    """
    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)
    time_cond = (
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, on & time_cond, how)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregate (extension; streaming-capable sessionizer).

    Same output contract as plans/analytics e_session_window: session_start /
    session_end as epoch-second bigints. In streaming mode sessions close
    when the watermark passes end+gap; Spark merges overlapping session
    state per key — state is one open session per key, not per event.
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    agg_cols = [c for c in out.columns if c not in ("w", *keys)]
    return out.select(
        *keys,
        F.col("w.start").cast("long").alias("session_start"),
        F.col("w.end").cast("long").alias("session_end"),
        *agg_cols,
    )
