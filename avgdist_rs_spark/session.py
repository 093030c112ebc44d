"""SparkSession factory with engine defaults.

The settings mirror what we would pass to ``spark-submit`` on a real cluster
(see ``BENCH/BASELINE.md``): AQE on for scan-heavy relational work, but the
iterative superstep loops pin their own shuffle partitioning (see
``plans.graph.GraphFrame``) because AQE partition coalescing would break the
stable co-partitioning that keeps per-superstep joins shuffle-free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "avgdist-rs-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a cluster the same
    engine code runs unchanged under ``spark-submit --py-files``; only the
    master URL and executor sizing differ.
    """
    cpus_s = str(cpus) if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus_s}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE must not coalesce away the stable partitioning used by superstep joins.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
