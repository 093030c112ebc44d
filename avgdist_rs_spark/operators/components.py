"""Connected components via hash-min label propagation (north rule).

Seeded by the reference's implicit component detection inside SIMPATH
renumbering (``src/lib.rs:379-400`` — "graph isn't connected; working with
source's component of size k"); re-expressed as the classic distributed
fixpoint: every vertex starts with label = its own id; each superstep every
vertex takes the min of its own and its (undirected) neighbors' labels;
converged when no label changes. The result is exactly the min vertex id of
each weakly-connected component — deterministic, exact-match testable.

Scale notes: supersteps = O(component diameter) — fine for the short-diameter
web/social regime; for pathological chains the star-contraction
(large-star/small-star) variant halves distances per round, at the cost of two
shuffles per round. Hash-min with the pre-partitioned symmetric edge table is
one shuffle (label exchange) + one aggregate per superstep.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.graph import GraphFrame
from ..streaming.superstep import Checkpointer, SuperstepMetrics


def connected_components(
    graph: GraphFrame,
    max_supersteps: int = 200,
    checkpointer: Checkpointer | None = None,
    metrics: SuperstepMetrics | None = None,
    shortcut: bool = False,
) -> DataFrame:
    """(v, component) where component = min vertex id reachable undirected.

    ``shortcut=True`` adds pointer jumping each superstep — after taking the
    neighbor minimum, every vertex also adopts its current label's label
    (``component ← label(component)``). Labels then travel 2^k hops in k
    supersteps instead of k hops, turning O(diameter) convergence into
    O(log diameter) — the lever for the north star's *large-diameter* graphs
    (a 10^4-hop payment-graph chain needs ~14 shortcut rounds, not 10^4) at
    the cost of one extra self-join per superstep. Both modes converge to the
    identical exact labeling (tested).
    """
    spark = graph.spark
    met = metrics if metrics is not None else SuperstepMetrics(name="cc")
    ckpt = checkpointer or Checkpointer(spark, name="cc", every=4)

    sym = (
        graph.symmetric_edges()
        .select(F.col("src").alias("_esrc"), F.col("dst").alias("_edst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()

    labels = graph.vertices().select("v", F.col("v").alias("component")).localCheckpoint(
        eager=True
    )

    for it in range(1, max_supersteps + 1):
        t0 = time.monotonic()
        nbr_min = (
            labels.join(sym, labels.v == F.col("_esrc"))
            .select(F.col("_edst").alias("v"), F.col("component").alias("cand"))
            .groupBy("v")
            .agg(F.min("cand").alias("cand"))
        )
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce(F.col("cand"), F.col("component"))
                ).alias("component"),
            )
        )
        if shortcut:
            # pointer jump: component ← label(component). The label table is
            # the (small) per-vertex state, self-joined on the label key.
            parent = new_labels.select(
                F.col("v").alias("_pv"), F.col("component").alias("_pc")
            )
            new_labels = (
                new_labels.join(parent, new_labels.component == F.col("_pv"), "left")
                .select(
                    "v",
                    F.least(
                        F.col("component"), F.coalesce(F.col("_pc"), F.col("component"))
                    ).alias("component"),
                )
            )
        new_labels = ckpt.step(new_labels, it, wall_s=time.monotonic() - t0)
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "v")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        met.record(it, changed, time.monotonic() - t0)
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def num_components(graph: GraphFrame) -> int:
    return connected_components(graph).select("component").distinct().count()
