"""T6 streaming E2E: the five-way base-log split + dirty side output runs as
ONE foreachBatch fan-out over a replayed text stream, and the union of the
written "topics" matches the batch evaluation of the same splitter."""

import shutil
import tempfile

import pytest

from gmall_flink_230422_spark import apps, sinks
from gmall_flink_230422_spark.sources.files import stream_text

from test_apps import LOG_LINES

STREAMS = ("page", "start", "display", "action", "err", "dirty")


@pytest.fixture(scope="module")
def fan_dir(spark):
    d = tempfile.mkdtemp(prefix="gmall_fanout_")
    # two text files → two micro-batches
    half = len(LOG_LINES) // 2
    for i, chunk in enumerate((LOG_LINES[:half], LOG_LINES[half:])):
        with open(f"{d}/in_f{i}.txt", "w") as f:
            f.write("\n".join(chunk) + "\n")
    src_dir = f"{d}/src"
    import os

    os.makedirs(src_dir)
    for i in range(2):
        shutil.move(f"{d}/in_f{i}.txt", f"{src_dir}/f{i}.txt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_fanout_matches_batch_split(spark, fan_dir):
    src = stream_text(spark, f"{fan_dir}/src/*")
    q = sinks.fan_out_sink(
        src,
        lambda df: apps.base_log_app(df, batch=False),
        f"{fan_dir}/out",
        f"{fan_dir}/ckpt",
    )
    q.awaitTermination(120)

    raw = spark.createDataFrame([(l,) for l in LOG_LINES], ["value"])
    batch = apps.base_log_app(raw, batch=False)
    for name in STREAMS:
        want = batch[name].count()
        try:
            got = spark.read.parquet(f"{fan_dir}/out/{name}").count()
        except Exception:
            got = 0  # branch dir absent ⇔ batch produced nothing
        assert got == want, f"{name}: stream wrote {got}, batch has {want}"
    # at least page + one exploded branch must be non-empty for the fixture
    assert batch["page"].count() > 0


def test_keyword_pipeline_streaming(spark, fan_dir):
    """Flagship keyword pipeline (E3: parse -> P9 filter -> U1/U2 tokenize
    UDF + explode -> A1 watermarked tumble) over the replayed log stream:
    closed windows must match the batch evaluation exactly."""
    from pyspark.sql import functions as F

    from gmall_flink_230422_spark.apps import dws_keyword_window

    src = stream_text(spark, f"{fan_dir}/src/*")
    page_s = apps.base_log_app(src, batch=False)["page"]
    win_s = dws_keyword_window(page_s)
    q = (
        win_s.writeStream.format("memory")
        .queryName("t_kw_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["stt"], r["keyword"]): r["keyword_count"]
        for r in spark.sql("select * from t_kw_stream").collect()
    }

    raw = spark.createDataFrame([(l,) for l in LOG_LINES], ["value"])
    page_b = apps.base_log_app(raw, batch=False)["page"]
    want = {
        (r["stt"], r["keyword"]): r["keyword_count"]
        for r in dws_keyword_window(page_b).collect()
    }
    # append-mode emits only watermark-closed windows; each must match batch
    assert got == {k: v for k, v in want.items() if k in got}
    assert len(want) > 0
