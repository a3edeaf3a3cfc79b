"""Plan-invariant guard for the bench headliners: the regressions the
round-2 verdict asked to gate (tools/audit_plans.py audits the FULL
registry; this test pins the invariants on the queries whose timings the
driver records, so a plan regression fails CI, not just the audit doc).

Invariants per headliner plan (built at sf0.001 — plan shape, not data):
  - no ``BatchEvalPython``: Python in the hot path must be Arrow-batched;
  - no ``CartesianProduct``: 1-row scalar attaches compile to
    BroadcastNestedLoopJoin, so CartesianProduct means a real quadratic
    join escaped;
  - no data-proportional ``SinglePartition`` exchange: global top-k must
    compile to TakeOrderedAndProject and windows must be keyed (the q15
    round-1 bug class). Classification is shared with
    tools/audit_plans.py:single_partition_audit — a single-partition
    exchange feeding a grand-total aggregate (``Keys: []``) is benign
    because the partial aggregate already reduced each partition to one
    row; anything else fails. (Round-3 verdict: the old literal match on
    ``Exchange SinglePartition`` was vacuous in formatted mode, where the
    distribution prints on a separate ``Arguments:`` line.)
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from audit_plans import SINGLE_PARTITION_OK, single_partition_audit  # noqa: E402

from gmall_flink_230422_spark.plans import registry

SF_DIR = "/root/testdata/sf0.001"


def _headline_names():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", _headline_names())
def test_headliner_plan_invariants(spark, name):
    spec = registry()[name]
    plan = plan_of(spec.fn(spark, SF_DIR))
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in the plan"
    _, sp_other = single_partition_audit(plan)
    if name not in SINGLE_PARTITION_OK:
        assert not sp_other, (
            f"{name}: data-proportional single-partition exchange(s) in the "
            f"plan: {sp_other}"
        )


def test_single_partition_classifier_fires(spark):
    """Canary for the r3 vacuous-invariant bug: the classifier MUST flag a
    deliberately-bad plan (unpartitioned Window -> global Sort ->
    SinglePartition exchange) and MUST pass a benign grand-total
    aggregate. If formatted-explain output ever changes shape again, this
    fails loudly instead of letting the guard silently match nothing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("v", F.col("id") % 7)

    bad = df.withColumn(
        "cum",
        F.sum("v").over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    _, sp_other = single_partition_audit(plan_of(bad))
    assert sp_other, "classifier failed to flag an unpartitioned window"

    benign = df.agg(F.sum("v").alias("s"))
    n_scalar, sp_other = single_partition_audit(plan_of(benign))
    assert n_scalar >= 1 and not sp_other, (
        "grand-total aggregate misclassified"
    )
