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
