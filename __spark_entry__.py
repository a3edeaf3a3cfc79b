"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship DWS traffic pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions; built from the
``gmall_flink_230422_spark.plans`` registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from gmall_flink_230422_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the union-preagg tumbling-window DWS pipeline
    (SURVEY §2.4 A4 + §2.5 T8 — DwsTrafficVcChArIsNewPageViewWindow analog)
    on /root/testdata/sf0.001."""
    from gmall_flink_230422_spark.plans.gmall import q_union_preagg

    return q_union_preagg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
