"""Datetime helpers.

Reference parity: R/utils/DateFormatUtil.java:10-38 converts epoch millis ↔
``yyyy-MM-dd[ HH:mm:ss]`` strings at GMT+8 (also explicit ZoneId GMT+8 at
R/app/dwd/DwdUserRegister.java:23). We keep the session timezone UTC for
oracle determinism and expose GMT+8 rendering explicitly — callers that need
reference-faithful date strings pass ``tz=GMALL_TZ``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GMALL_TZ = "Asia/Shanghai"  # the reference's display zone (GMT+8)


def to_date_str(ts: Column, tz: str | None = None) -> Column:
    """epoch-or-timestamp → 'yyyy-MM-dd' (DateFormatUtil.toDate analog)."""
    if tz:
        ts = F.from_utc_timestamp(ts, tz)
    return F.date_format(ts, "yyyy-MM-dd")


def to_ymd_hms(ts: Column, tz: str | None = None) -> Column:
    """'yyyy-MM-dd HH:mm:ss' (DateFormatUtil.toYmdHms analog)."""
    if tz:
        ts = F.from_utc_timestamp(ts, tz)
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def epoch_millis(ts: Column) -> Column:
    """timestamp → epoch millis (DateFormatUtil.toTs analog)."""
    return (F.unix_timestamp(ts) * 1000 + F.date_format(ts, "SSS").cast("long")).cast(
        "long"
    )


def epoch_seconds(ts: Column) -> Column:
    return ts.cast("long")


def millis_to_ts(ms: Column) -> Column:
    """epoch millis → timestamp (TO_TIMESTAMP(FROM_UNIXTIME(ts/1000)) analog,
    R/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:118)."""
    return F.timestamp_millis(ms.cast("long"))
