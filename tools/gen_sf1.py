"""Synthesize the sf1 tier (~10x sf0.1) for heavy-tail scale probing
(r10 verdict item 5: SCALING.md stopped a decade below where the heavy
queries start to differentiate).

The driver testdata is read-only and ships no sf1, so this derives one
from sf0.1 by K=10 replication with DISJOINT keys and per-copy token
vocabulary:

- ``documents``: copy 0 is the original corpus verbatim; copies k>=1
  shift doc_id by k*10M and suffix every whitespace token with ``_c<k>``
  — shingles/vocab across copies are disjoint, so LSH buckets, gram
  indexes, and dedup clusters scale LINEARLY (naive replication would
  make every doc a 10-way near-dup and blow bucket pair generation up
  quadratically — a skew stress, not a scale measurement).
- ``embeddings``: copies shift vec_id and ROTATE the vector by k
  positions — norms and within-copy pairwise structure preserved, so
  per-copy ANN work is identical and total work scales with rows.
- ``events``/``orders``/``lineitem``: key-shifted copies over the same
  time range (10x the traffic, 10x users/orders — the realistic fact-
  table growth axis); dimension tables are copied verbatim (dims grow
  slower than facts).

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/sf1_testdata), one parquet
dataset per table, readable by io.load_table. Deterministic — no RNG.
Run: python tools/gen_sf1.py
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from gmall_flink_230422_spark.io import load_table
from gmall_flink_230422_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_testdata")
K = 10
SHIFT = 10_000_000

VERBATIM = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    spark = get_spark("gen-sf1")
    os.makedirs(OUT, exist_ok=True)
    done = os.path.join(OUT, "_GENERATED")
    if os.path.exists(done):
        print(f"{OUT} already generated")
        return

    for t in VERBATIM:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)

    copies = spark.range(K).withColumnRenamed("id", "_k")

    d = load_table(spark, SRC, "documents")
    docs = (
        d.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_k") * SHIFT).alias("doc_id"),
            F.when(F.col("_k") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda tok: F.concat(
                            tok, F.lit("_c"), F.col("_k").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )

    e = load_table(spark, SRC, "embeddings")
    dim = len(e.select("embedding").first()[0])
    rotated = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> element_at(embedding, int((i + _k) % {dim}) + 1))"
    )
    (
        e.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("_k") * SHIFT).alias("vec_id"),
            F.when(F.col("_k") == 0, F.col("embedding"))
            .otherwise(rotated)
            .alias("embedding"),
            "label",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "embeddings.parquet"))
    )

    ev = load_table(spark, SRC, "events")
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("_k") * SHIFT).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_k") * SHIFT).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "events.parquet"))
    )

    o = load_table(spark, SRC, "orders")
    (
        o.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("_k") * SHIFT * 10).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_k") * SHIFT).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "orders.parquet"))
    )

    li = load_table(spark, SRC, "lineitem")
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("_k") * SHIFT * 10).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "lineitem.parquet"))
    )

    with open(done, "w") as f:
        f.write("sf1 = 10x sf0.1, gen_sf1.py\n")
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        n = spark.read.parquet(os.path.join(OUT, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
