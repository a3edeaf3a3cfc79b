"""Atomic-publication contract of io.ensure_dataset (r10 verdict item 2):
a concurrent probe must see either no artifact or a COMPLETE one, never a
partial write; racing builders must converge on one artifact with no
stranded staging debris; a fingerprint change must address a NEW immutable
directory and leave the old generation intact for in-flight readers.

The mechanics under test are pure filesystem (staging dir + atomic rename),
so the build callbacks here write plain files — no SparkSession needed,
which keeps the race windows tight and the test deterministic."""

from __future__ import annotations

import os
import threading
import time

from gmall_flink_230422_spark.io import (
    dataset_fingerprint,
    ensure_dataset,
    fingerprint_token,
)


def _slow_build(files: dict[str, str], delay: float = 0.0):
    def build(staging: str) -> None:
        os.makedirs(staging)
        for name, content in files.items():
            with open(os.path.join(staging, name), "w") as f:
                f.write(content)
            if delay:
                time.sleep(delay)

    return build


def test_probe_never_sees_partial_artifact(tmp_path):
    base = str(tmp_path / "art")
    final = os.path.join(base, "fp=v1")
    seen: list[frozenset] = []
    stop = threading.Event()

    def probe() -> None:
        # poll what a concurrent reader would observe of the FINAL path
        while not stop.is_set():
            if os.path.exists(final):
                seen.append(frozenset(os.listdir(final)))
            time.sleep(0.001)

    t = threading.Thread(target=probe)
    t.start()
    try:
        files = {f"part-{i}": "x" * 100 for i in range(5)}
        out = ensure_dataset(base, "v1", _slow_build(files, delay=0.02))
        time.sleep(0.05)  # let the probe sample the just-published artifact
    finally:
        stop.set()
        t.join()
    assert out == final
    # every observation of the published path saw ALL files: the rename is
    # the commit point, so a partially-built artifact is unobservable
    complete = frozenset(files)
    assert seen, "probe thread never observed the published artifact"
    assert all(s == complete for s in seen), f"partial artifact observed: {seen}"


def test_racing_builders_converge_without_debris(tmp_path):
    base = str(tmp_path / "art")
    barrier = threading.Barrier(2)
    results: list[str] = []
    builds = []

    def build(staging: str) -> None:
        builds.append(staging)
        barrier.wait()  # force BOTH threads past the absent-gate into build
        os.makedirs(staging)
        with open(os.path.join(staging, "data"), "w") as f:
            f.write("payload")

    def run() -> None:
        results.append(ensure_dataset(base, "v1", build))

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(builds) == 2, "both racers should have entered build"
    assert len(set(results)) == 1, f"racers diverged: {results}"
    final = results[0]
    with open(os.path.join(final, "data")) as f:
        assert f.read() == "payload"
    # the losing racer's staging dir was discarded: only fp=v1 remains
    assert sorted(os.listdir(os.path.dirname(final))) == ["fp=v1"]


def test_fingerprint_change_new_generation_old_intact(tmp_path):
    base = str(tmp_path / "art")
    p1 = ensure_dataset(base, "v1", _slow_build({"a": "1"}))
    p2 = ensure_dataset(base, "v2", _slow_build({"a": "2"}))
    assert p1 != p2
    with open(os.path.join(p1, "a")) as f:
        assert f.read() == "1", "old generation mutated by new build"
    with open(os.path.join(p2, "a")) as f:
        assert f.read() == "2"
    # cache hit: same fingerprint returns without rebuilding
    calls = []
    p1b = ensure_dataset(base, "v1", lambda s: calls.append(s))
    assert p1b == p1 and not calls


def test_fingerprint_token_never_aliases():
    # the r10 int-packing collided on out-of-range fields (advisor find);
    # string tokens with escaped separators cannot
    assert fingerprint_token("v1", 10**12) != fingerprint_token("v2", 0)
    assert fingerprint_token("a_b") != fingerprint_token("a", "b")


def test_dataset_fingerprint_footer_stats(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ds"
    d.mkdir()
    pq.write_table(pa.table({"x": [1, 2, 3]}), d / "part-0.parquet")
    tok1 = dataset_fingerprint(str(d))
    assert tok1.startswith("n3-")
    assert dataset_fingerprint(str(d)) == tok1, "token not deterministic"
    # appending a file changes the token even at unchanged content elsewhere
    pq.write_table(pa.table({"x": [4]}), d / "part-1.parquet")
    tok2 = dataset_fingerprint(str(d))
    assert tok2 != tok1 and tok2.startswith("n4-")
    # single-file form (the fixture tables are one file each)
    assert dataset_fingerprint(str(d / "part-0.parquet")).startswith("n3-")
