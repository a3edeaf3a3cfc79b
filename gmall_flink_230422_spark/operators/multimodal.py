"""Multimodal column handling (LLM-pipeline extension).

Pattern: media travel as opaque ``binary`` columns with typed metadata
structs; decode / feature-extract runs as Arrow-batched ``mapInPandas`` so
each task processes a columnar batch without JVM↔Python row overhead. The
actual image/audio decode libraries are not in this container, so the decode
kernel is STUBBED with a deterministic fake (clearly marked below); the
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def to_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary media column + metadata —
    stands in for image/audio payloads in this container."""
    media = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """STUB: deterministic fake of an image-dimension probe.

    A real deployment replaces this with e.g. PIL.Image.open(BytesIO(blob))
    — the library is not available here (see module docstring). The fake
    derives stable pseudo-dimensions from the payload length so tests and
    oracles are reproducible.
    """
    n = len(blob)
    return (n % 64 + 1, (n // 64) % 64 + 1)


def decode_media(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode via mapInPandas: binary in → typed metadata out.

    At scale: one pass, no shuffle; partition sizing governed by
    spark.sql.files.maxPartitionBytes on the media source.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["media"].map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "media_type": pdf["media_type"],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling analog: deterministic 1-in-N selection by id (stands in
    for video frame sampling; selection logic is the real, scalable part)."""
    return decoded.filter(F.col("doc_id") % every_n == 0)
