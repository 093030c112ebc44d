"""Strongly connected components: trim + multi-pivot forward-backward coloring.

Completes the classic distributed-graph family (PageRank / CC / LP /
triangles / k-core) with the DIRECTED component structure — on a transcript
graph, nontrivial SCCs are exactly the conversation loops (tool-response
cycles), and the condensation is what any reachability analysis runs on.

Algorithm (public literature: FB-Trim / multi-pivot coloring, Slota et al.;
Hong et al.): alternate two phases until every vertex is assigned —

1. **Trim fixpoint** — a vertex with no alive successor or no alive
   predecessor is its own singleton SCC; removing it can expose more. On
   mostly-acyclic graphs (DAG-ish transcript/session graphs) trimming alone
   resolves everything in O(longest chain) supersteps.
2. **Coloring round** — for the cyclic remainder: propagate color(v) =
   max(own, colors of alive in-neighbors) to fixpoint, so color(v) = the
   max-id vertex that reaches v. Every color class has one pivot (its own
   max vertex); the pivot's SCC = vertices of its class that reach it —
   found by one backward frontier expansion restricted to the class, ALL
   pivots in parallel (the class key rides the frontier). Assign each found
   SCC its min member id (deterministic, exact-match testable), remove, and
   loop back to trimming.

Physical shape per superstep: the same fused union-aggregate discipline as
``components``/``labelprop`` (state rows ride the contribution union into one
exchange); edge tables are filtered to the alive set by hash semi-joins and
re-persisted once per round, not per superstep.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.graph import GraphFrame
from ..streaming.superstep import Checkpointer, SuperstepMetrics, aqe_disabled


def strongly_connected_components(
    graph: GraphFrame,
    max_rounds: int = 64,
    max_supersteps: int = 10_000,
    checkpointer: Checkpointer | None = None,
    metrics: SuperstepMetrics | None = None,
) -> DataFrame:
    """(v, component) for every vertex; component = min vertex id of v's SCC."""
    spark = graph.spark
    met = metrics if metrics is not None else SuperstepMetrics(name="scc")
    ckpt = checkpointer or Checkpointer(spark, name="scc", every=4)

    edges = graph.edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    alive = graph.vertices().localCheckpoint(eager=True)
    n_alive = alive.count()
    assigned: DataFrame | None = None
    step = 0

    def _record(rows: int, t0: float) -> int:
        nonlocal step
        step += 1
        met.record(step, rows, time.monotonic() - t0)
        return step

    with aqe_disabled(spark):
        for _round in range(1, max_rounds + 1):
            if n_alive == 0:
                break
            # ---- phase 1: trim fixpoint (singleton SCCs) -----------------------
            while n_alive > 0:
                t0 = time.monotonic()
                ea = edges.join(alive.select(F.col("v").alias("_s")), "_s").join(
                    alive.select(F.col("v").alias("_d")), "_d"
                ).persist()
                keep = (
                    alive.join(ea.select(F.col("_s").alias("v")).distinct(), "v", "semi")
                    .join(ea.select(F.col("_d").alias("v")).distinct(), "v", "semi")
                )
                keep = keep.localCheckpoint(eager=True)
                n_keep = keep.count()
                ea.unpersist()
                if n_keep == n_alive:
                    _record(0, t0)
                    break
                # dead derives from two checkpointed frames — lineage stays
                # shallow without materializing the growing union every step
                dead = alive.join(keep, "v", "anti").select(
                    "v", F.col("v").alias("component")
                )
                assigned = dead if assigned is None else assigned.unionAll(dead)
                alive, n_alive = keep, n_keep
                _record(n_alive, t0)
            if n_alive == 0:
                break
            # ---- phase 2: one coloring round on the cyclic remainder -----------
            ea = (
                edges.join(alive.select(F.col("v").alias("_s")), "_s")
                .join(alive.select(F.col("v").alias("_d")), "_d")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            ea.count()
            color = alive.select("v", F.col("v").alias("color")).localCheckpoint(eager=True)
            while True:
                t0 = time.monotonic()
                # fused max-propagation (same shape as components.connected_components)
                contrib = color.join(ea, color.v == F.col("_s")).select(
                    F.col("_d").alias("v"),
                    F.col("color").alias("cand"),
                    F.lit(None).cast("long").alias("_prev"),
                )
                state = color.select(
                    "v", F.col("color").alias("cand"), F.col("color").alias("_prev")
                )
                stepped = (
                    contrib.unionAll(state)
                    .groupBy("v")
                    .agg(F.max("cand").alias("color"), F.max("_prev").alias("_old"))
                )
                stepped = ckpt.step(stepped, step + 1)
                changed = int(
                    stepped.agg(
                        F.sum((F.col("color") != F.col("_old")).cast("long"))
                    ).collect()[0][0]
                    or 0
                )
                color = stepped.drop("_old")
                _record(changed, t0)
                if changed == 0:
                    break
                if step >= max_supersteps:
                    # a truncated color fixpoint would silently split SCCs —
                    # fail loudly like every other fixpoint here
                    raise RuntimeError(
                        f"scc: color propagation not converged within "
                        f"max_supersteps={max_supersteps}; raise the budget"
                    )
            color = color.persist(StorageLevel.MEMORY_AND_DISK)
            color.count()
            # backward frontier from each pivot within its color class, in parallel
            mem = color.where(F.col("v") == F.col("color")).select("v", "color")
            mem = mem.localCheckpoint(eager=True)
            frontier = mem
            while True:
                t0 = time.monotonic()
                preds = (
                    frontier.join(ea, frontier.v == F.col("_d"))
                    .select(F.col("_s").alias("v"), "color")
                    .distinct()
                    .join(
                        color.select(F.col("v").alias("v"), F.col("color").alias("_vc")),
                        "v",
                    )
                    .where(F.col("color") == F.col("_vc"))
                    .select("v", "color")
                )
                new = preds.join(mem, ["v", "color"], "anti").localCheckpoint(eager=True)
                n_new = new.count()
                _record(n_new, t0)
                if n_new == 0:
                    break
                if step >= max_supersteps:
                    raise RuntimeError(
                        f"scc: backward sweep not converged within "
                        f"max_supersteps={max_supersteps}; raise the budget"
                    )
                mem = mem.unionAll(new)
                mem = ckpt.step(mem, step)
                frontier = new
            # label each found SCC with its min member; remove from alive
            labels = mem.groupBy("color").agg(F.min("v").alias("component"))
            found = (
                mem.join(labels, "color").select("v", "component").localCheckpoint(eager=True)
            )
            assigned = found if assigned is None else assigned.unionAll(found)
            alive = alive.join(mem.select("v"), "v", "anti").localCheckpoint(eager=True)
            n_alive = alive.count()
            color.unpersist()
            ea.unpersist()
    if n_alive > 0:
        edges.unpersist()
        raise RuntimeError(
            f"scc: {n_alive} vertices unresolved after {max_rounds} rounds"
        )
    edges.unpersist()
    out = (assigned or graph.vertices().select("v", F.col("v").alias("component")))
    return out.localCheckpoint(eager=True)
