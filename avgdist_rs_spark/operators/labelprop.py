"""Synchronous label propagation for community detection (north rule).

Every vertex starts labeled with its own id; each superstep it adopts the most
frequent label among its (undirected) in-neighbors, breaking frequency ties by
the SMALLEST label — the deterministic tie-break is essential for exact-match
testing (SURVEY.md §7.3). Vertices with no neighbors keep their label. Runs a
fixed number of supersteps (synchronous LPA need not converge — it can
oscillate on bipartite structures; fixed-iteration semantics are exactly
reproducible by the SQL oracle).

Physical plan per superstep: labels ⋈ symmetric edges (one shuffle) →
``groupBy(v, label).count()`` → per-vertex argmax via max_by over the
(count, -label) ordering — a single aggregate, no window sort.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.graph import GraphFrame
from ..streaming.superstep import (
    Checkpointer,
    SuperstepMetrics,
    aqe_disabled,
    broadcast_joins_disabled,
    fixpoint_shuffle_partitions,
    fixpoint_width,
)


def label_propagation(
    graph: GraphFrame,
    iterations: int = 5,
    checkpointer: Checkpointer | None = None,
    metrics: SuperstepMetrics | None = None,
) -> DataFrame:
    """(v, label) after ``iterations`` synchronous LPA supersteps."""
    spark = graph.spark
    met = metrics if metrics is not None else SuperstepMetrics(name="lpa")
    ckpt = checkpointer or Checkpointer(spark, name="lpa", every=4)

    # shuffle width scoped to the vote stream (2m rows of (v, label) votes +
    # n state rows per superstep) — measured 4.6 s → 1.8–2.4 s for 4
    # supersteps at sf0.1 (see fixpoint_shuffle_partitions). The symmetric
    # edge table is built inside the scope so the per-superstep labels ⋈ sym
    # join matches partitioning on the edge side (guide §2.4 — no edge
    # re-exchange per superstep).
    from contextlib import nullcontext

    loop_w = fixpoint_width(spark, max(graph.num_nodes, 2 * graph.num_edges))
    # rows gate rationale: components.py — only genuinely small states trade
    # the broadcast join for the co-partitioned SMJ
    small = max(graph.num_nodes, 2 * graph.num_edges) <= 32_000
    bj_ctx = broadcast_joins_disabled(spark) if loop_w <= 8 and small else nullcontext()
    with fixpoint_shuffle_partitions(
        spark, max(graph.num_nodes, 2 * graph.num_edges)
    ), aqe_disabled(spark), bj_ctx:
        sym = (
            graph.symmetric_edges()
            .select(F.col("src").alias("_esrc"), F.col("dst").alias("_edst"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        sym.count()

        labels = graph.vertices().select(
            "v", F.col("v").alias("label")
        ).localCheckpoint(eager=True)

        for it in range(1, iterations + 1):
            t0 = time.monotonic()
            votes = (
                labels.join(sym, labels.v == F.col("_esrc"))
                .select(F.col("_edst").alias("v"), F.col("label"))
                .groupBy("v", "label")
                .agg(F.count("*").alias("cnt"))
            )
            # argmax by (cnt desc, label asc): max_by with a sortable struct —
            # deterministic, single aggregate, no window. The keep-own-label
            # fallback is fused in as a cnt=0 state row per vertex riding the
            # same union: it loses to every real vote (cnt ≥ 1) and wins exactly
            # when the vertex has no neighbors — no labels ⋈ winner join stage.
            new_labels = (
                votes.unionAll(labels.select("v", "label", F.lit(0).cast("long").alias("cnt")))
                .groupBy("v")
                .agg(
                    F.max_by(
                        "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
                    ).alias("label")
                )
            )
            new_labels = ckpt.step(new_labels, it, wall_s=time.monotonic() - t0)
            met.record(it, graph.num_nodes, time.monotonic() - t0)
            labels = new_labels
    sym.unpersist()
    return labels
