"""Streaming exact dedup: incremental deduplication of a document stream.

The batch pipeline dedups a corpus with one content-key groupBy
(``operators.dedup.exact_dedup``); a production ingestion pipeline receives
documents continuously and must dedup INCREMENTALLY — each micro-batch
merges into the running per-content-key state instead of rescanning the
corpus. This is expressed entirely with the BUILT-IN streaming aggregation
(state handled by Spark's state store, no custom state code): group by the
md5 content key, keep ``min(doc_id)`` (the deterministic survivor — same
tie-break as the batch operator) and the running duplicate count.

Output/state contract:
- state = ONE row per distinct content key — the true cost of streaming
  dedup at scale; on a cluster back it with the RocksDB state store
  (``spark.sql.streaming.stateStore.providerClass``) so state spills past
  executor memory.
- the test/bench harness drains with ``availableNow`` into a memory sink in
  ``complete`` mode (deterministic, equals the batch operator exactly —
  tested); a production sink would run ``update`` mode into an upsert-able
  store so only keys touched by the micro-batch are rewritten.

Reference seed: the reference engine is batch-only (SURVEY.md §2.7); this
extends the dedup family to the streaming surface the same way
``events_stream`` extends sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.hashing import md5_key

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_docs(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source document stream (the sandbox analog of an Iceberg feed)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def dedup_stream(docs: DataFrame) -> DataFrame:
    """(keep_id, dup_count) per distinct content — streaming aggregation with
    the same survivor rule as the batch ``exact_dedup`` (min doc_id), so a
    full drain equals the batch result row for row."""
    return (
        docs.select(md5_key(F.col("text")).alias("key"), "doc_id")
        .groupBy("key")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )
