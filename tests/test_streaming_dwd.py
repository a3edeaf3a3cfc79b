"""Streaming DWD app E2E: the reference's per-app dataflow (S1 kafka-value
stream → P1 parse → P2-P6 route/transition/delta/projection → J3 dim lookup
→ sink) runs unchanged on a Structured-Streaming source — run_dwd_app is
stateless transforms, so the same spec executes in both modes and must
agree row-for-row."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gmall_flink_230422_spark.apps import DWD_SPECS, run_dwd_app
from gmall_flink_230422_spark.operators.cdc import parse_cdc
from gmall_flink_230422_spark.sources.files import stream_text

from test_apps import CDC_LINES, DIC_ROWS


@pytest.fixture(scope="module")
def cdc_stream_dir(spark):
    d = tempfile.mkdtemp(prefix="gmall_dwd_stream_")
    half = len(CDC_LINES) // 2
    import os

    os.makedirs(f"{d}/src")
    for i, chunk in enumerate((CDC_LINES[:half], CDC_LINES[half:])):
        with open(f"{d}/src/f{i}.txt", "w") as f:
            f.write("\n".join(chunk) + "\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("spec_name", ["dwd_trade_cart_add", "dwd_tool_coupon_get"])
def test_dwd_spec_streaming_matches_batch(spark, cdc_stream_dir, spec_name):
    dic = spark.createDataFrame(DIC_ROWS, ["dic_code", "dic_name"])
    spec = DWD_SPECS[spec_name]

    src = parse_cdc(stream_text(spark, f"{cdc_stream_dir}/src/*"))
    out = run_dwd_app(src, spec, dic)
    q = (
        out.writeStream.format("memory")
        .queryName(f"t_dwd_{spec_name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"select * from t_dwd_{spec_name}")

    raw = spark.createDataFrame([(l,) for l in CDC_LINES], ["value"])
    want = run_dwd_app(parse_cdc(raw), spec, dic)

    assert got.columns == want.columns
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
    assert len(w) > 0, f"{spec_name} fixture produced no rows"
