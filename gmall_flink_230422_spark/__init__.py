"""gmall_flink_230422_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the ``moneymonth/gmall-flink-230422``
reference (a Flink 1.13 real-time e-commerce warehouse; see SURVEY.md).

Not a port: the reference's operator surface (CDC/log envelope parsing,
config-driven dim sync, stream joins + lookup joins, keyed-state dedup,
CEP-style bounce detection, tumbling-window aggregates) is re-expressed as a
library of composable DataFrame transforms. Every operator has a batch path
(checked against a DuckDB oracle) and, where meaningful, a Structured
Streaming path sharing the same transform.

Layout:
  session    — SparkSession factory (AQE, Arrow, timezone, scale knobs)
  io         — testdata loaders (parquet tables incl. nanos-ts workaround)
  operators/ — envelope, cdc, joins, windows, stateful, dedup, similarity,
               text, multimodal
  functions/ — portable hashing, tokenization, datetime helpers
  sources/   — batch/stream source factories (files, kafka, memory)
  sinks      — upsert/column-contract/console sink helpers
  streaming/ — streaming pipelines mirroring the reference apps
  plans/     — named query registry (drives __spark_entry__ + bench)
"""

__version__ = "0.1.0"
