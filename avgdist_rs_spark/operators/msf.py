"""Minimum spanning forest via distributed Borůvka.

Completes the classic distributed-graph family (PageRank / CC / LP / SCC /
k-core / k-truss) with the weighted-structure primitive: the MSF is the
backbone a clustering pass runs on (single-linkage clustering IS the MSF with
long edges cut), and Borůvka is THE parallel MST algorithm — every component
picks its minimum crossing edge simultaneously, components at least halve per
round, so O(log n) rounds regardless of diameter (public method: Borůvka
1926; the parallel formulation follows the standard GPU/Pregel treatments).

Determinism: weights default to the portable md5 hash of the canonical
(min,max) endpoint pair, and ALL comparisons use the total order
(w, u, v) — so the MSF is unique even under hash collisions, any engine
replays it, and networkx's Kruskal on the same weights is an exact oracle
(``tests/test_msf.py``).

Physical shape per round:
- re-label edge endpoints: two joins of the (shrinking) cross-component
  edge table against the label table; intra-component edges are DROPPED
  from the loop-carried table (the scan shrinks monotonically, the same
  discipline as scc.py's alive-edge table).
- per-component min: ONE map-side-combinable groupBy of the candidate
  stream (each edge appears under both endpoint components) taking
  ``min(struct(w, u, v, other))``.
- contraction: the picked parent pointers form a functional graph whose
  only cycles are mutual pairs (distinct total order ⇒ a longer cycle
  would need a descending weight loop); break 2-cycles toward the smaller
  component id, then pointer-jump (``parent ← parent(parent)``) to the
  root — O(log chain) inner supersteps on the LABEL table only (component
  count ≤ n, halving each round; edges never enter the jump loop).

The reference has no weighted operators (studied for behavior only:
``/root/reference/src/lib.rs`` is unweighted BFS throughout); this operator
is part of the beyond-reference pipeline family, with no SQL oracle — the
driver records the weaker rows-only check and pytest carries the exact
parity (unique-MSF networkx replay + parallelism invariance).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..streaming.superstep import (
    Checkpointer,
    SuperstepMetrics,
    aqe_disabled,
    fixpoint_shuffle_partitions,
)


def _canonical_weighted(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """Undirected canonical edge set (u < v) with a total-order weight."""
    u = F.least(F.col("src"), F.col("dst")).alias("u")
    v = F.greatest(F.col("src"), F.col("dst")).alias("v")
    e = edges.where(F.col("src") != F.col("dst"))
    if weight_col is None:
        e = e.select(u, v).distinct()
        w = portable_hash64(
            F.concat_ws(":", F.col("u").cast("string"), F.col("v").cast("string")),
            salt="msf:",
        )
        return e.select("u", "v", w.alias("w"))
    # explicit weights: keep the minimum per canonical pair
    return (
        e.select(u, v, F.col(weight_col).alias("w"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str | None = None,
    max_rounds: int = 64,
    metrics: SuperstepMetrics | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(u, v, w) — the unique minimum spanning forest of the undirected
    graph under the total order (w, u, v). ``weight_col=None`` derives
    portable-md5 weights from the canonical endpoint pair.

    ALL lineage cuts route through one :class:`Checkpointer` — the cut
    ancestry here is deep (relabel -> pick -> break -> jumps -> labels,
    every round), exactly the shape that trips the chained-localCheckpoint
    cost blow-up (see ``Checkpointer.HARD_EVERY``); the periodic Parquet
    reset keeps per-cut cost flat through arbitrarily many rounds."""
    spark = edges.sparkSession
    met = metrics if metrics is not None else SuperstepMetrics(name="msf")
    ckpt = checkpointer or Checkpointer(spark, name="msf", every=1, hard_every=6)
    _step = [0]

    def cut(df: DataFrame) -> DataFrame:
        _step[0] += 1
        return ckpt.step(df, _step[0])

    ew = cut(_canonical_weighted(edges, weight_col))

    verts = (
        ew.select(F.col("u").alias("x"))
        .unionAll(ew.select(F.col("v").alias("x")))
        .distinct()
    )
    labels = cut(verts.select(F.col("x"), F.col("x").alias("lbl")))
    forest: DataFrame | None = None
    step = 0
    n_edges = ew.count()

    with fixpoint_shuffle_partitions(spark, max(n_edges, 1), per_partition=250_000):
        with aqe_disabled(spark):
            for _round in range(1, max_rounds + 1):
                t0 = time.monotonic()
                # 1. relabel endpoints; drop intra-component edges for good
                el = (
                    ew.select("u", "v", "w")
                    .join(labels.select(F.col("x").alias("u"), F.col("lbl").alias("_lu")), "u")
                    .join(labels.select(F.col("x").alias("v"), F.col("lbl").alias("_lv")), "v")
                )
                ew = cut(
                    el.where(F.col("_lu") != F.col("_lv")).select(
                        "u", "v", "w", "_lu", "_lv"
                    )
                )
                n_cross = ew.count()
                if n_cross == 0:
                    break
                # 2. per-component minimum crossing edge (total order w,u,v)
                cand = ew.select(
                    F.col("_lu").alias("c"),
                    F.struct("w", "u", "v", F.col("_lv").alias("o")).alias("m"),
                ).unionAll(
                    ew.select(
                        F.col("_lv").alias("c"),
                        F.struct("w", "u", "v", F.col("_lu").alias("o")).alias("m"),
                    )
                )
                pick = cand.groupBy("c").agg(F.min("m").alias("m"))
                sel = cut(
                    pick.select(
                        F.col("m.u").alias("u"), F.col("m.v").alias("v"), F.col("m.w").alias("w")
                    ).distinct()
                )
                forest = sel if forest is None else cut(forest.unionAll(sel))
                # 3. contraction: parent pointers, 2-cycle break toward the
                # smaller id, pointer-jump to the root
                par = cut(pick.select("c", F.col("m.o").alias("p")))
                g = par.select(F.col("c").alias("_pc"), F.col("p").alias("_pp"))
                par = cut(
                    par.join(g, par.p == F.col("_pc"), "left").select(
                        "c",
                        F.when(
                            (F.col("_pp") == F.col("c")) & (F.col("c") < F.col("p")),
                            F.col("c"),
                        )
                        .otherwise(F.col("p"))
                        .alias("p"),
                    )
                )
                while True:
                    step += 1
                    g = par.select(F.col("c").alias("_pc"), F.col("p").alias("_pp"))
                    jumped = par.join(g, par.p == F.col("_pc"), "left").select(
                        "c", F.coalesce("_pp", "p").alias("p"), par.p.alias("_old")
                    )
                    jumped = cut(jumped)
                    moved = jumped.where(F.col("p") != F.col("_old")).count()
                    par = jumped.drop("_old")
                    if moved == 0:
                        break
                # 4. fold the round's root map into the vertex labels
                labels = cut(
                    labels.join(
                        par.select(F.col("c").alias("lbl"), F.col("p").alias("_r")),
                        "lbl",
                        "left",
                    ).select("x", F.coalesce("_r", "lbl").alias("lbl"))
                )
                met.record(step, n_cross, time.monotonic() - t0)
            else:
                raise RuntimeError(
                    f"msf: not converged within max_rounds={max_rounds}"
                )
    if forest is None:
        return ew.select("u", "v", "w").limit(0)
    return forest


def msf_total_weight(edges: DataFrame, weight_col: str | None = None):
    """One-row (n_edges, total_weight) summary of the forest."""
    f = minimum_spanning_forest(edges, weight_col)
    # sum as double: default weights are 60-bit hashes, whose long sum
    # overflows under ANSI mode within ~8 edges
    return f.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("w").cast("double")).alias("total_weight"),
    )
