"""Plan-invariant guard for the bench headliners: the regressions the
round-2 verdict asked to gate (tools/audit_plans.py audits the FULL
registry; this test pins the invariants on the queries whose timings the
driver records, so a plan regression fails CI, not just the audit doc).

Invariants per headliner plan (built at sf0.001 — plan shape, not data):
  - no ``BatchEvalPython``: Python in the hot path must be Arrow-batched;
  - no ``CartesianProduct``: 1-row scalar attaches compile to
    BroadcastNestedLoopJoin, so CartesianProduct means a real quadratic
    join escaped;
  - no ``Exchange SinglePartition``: global top-k must compile to
    TakeOrderedAndProject and windows must be keyed (the q15 round-1 bug
    class).
"""

import pytest

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
    assert "Exchange SinglePartition" not in plan, (
        f"{name}: single-partition exchange in the plan"
    )
