"""Table IO: Iceberg-first reads with Parquet fallback, plus result/metrics sinks.

Reference surface being re-expressed (SURVEY.md §2.1):
- S1 graph load  → ``read_table`` (Iceberg catalog table or Parquet path)
- S6 stdout sink → ``write_results`` (Parquet/JSON results table; the reference
  prints sexp/tabular text, ``src/main.rs:232-240``)
- S7 telemetry   → ``write_metrics`` (per-superstep metrics JSONL — the
  reference's per-BFS elapsed prints, ``src/main.rs:72,192``)

Iceberg is the north-rule input format at production scale (partition pruning
on conv_id buckets, snapshot isolation for resumable jobs). This container
ships no Iceberg runtime jars, so the reader degrades to Parquet transparently
and tests exercise the fallback; the Iceberg path is the same one-line
``spark.read.table`` against a configured catalog.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured and its classes are on the
    JVM classpath (gated — no hard dependency)."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe, public API absent
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read ``catalog.db.table`` (Iceberg) or a Parquet path/directory.

    Dotted names without a path separator are treated as catalog tables;
    anything else as a Parquet location — so the same entry point serves the
    sandbox (driver-generated parquet) and a production Iceberg warehouse.
    """
    # an existing local file/dir or an explicit parquet name is always a path —
    # without this, a relative 'data.parquet' would be misread as catalog.table
    looks_like_table = (
        ("/" not in source)
        and ("\\" not in source)
        and ("." in source)
        and not source.endswith(".parquet")
        and not os.path.exists(source)
    )
    if looks_like_table:
        if not iceberg_available(spark):
            raise RuntimeError(
                f"'{source}' looks like a catalog table but no Iceberg runtime "
                "is on the classpath; pass a Parquet path or add the Iceberg jars"
            )
        return spark.read.table(source)
    return spark.read.parquet(source)


def write_results(
    df: DataFrame, out_dir: str, name: str, fmt: str = "parquet", mode: str = "overwrite"
) -> str:
    """Durable results sink (reference S6). Returns the written path."""
    path = os.path.join(out_dir, name)
    writer = df.write.mode(mode)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported results format: {fmt}")
    return path


def write_metrics(metrics, out_dir: str, run_id: str | None = None) -> str:
    """Append a SuperstepMetrics snapshot to ``{out_dir}/metrics.jsonl``
    (reference S7 telemetry; north rule: per-superstep metrics)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "metrics.jsonl")
    rec = {"run_id": run_id, "ts": time.time(), **metrics.as_dict()}
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return path
