"""Deterministic k-hop neighborhood sampling (GraphSAGE-style fan-out).

The graph→GNN-training bridge of the pipeline family: for each seed vertex,
sample up to ``fanouts[h]`` neighbors at hop h, recursively — the sampled
computation graph a GraphSAGE/GAT trainer consumes (Hamilton et al. 2017,
NeurIPS — public method). Complements ``walks`` (trajectory corpus) with the
other standard graph-learning extraction: per-seed rooted neighborhood trees.

Reference seed: the reference engine's hash-driven vertex sampling
(``/root/reference/src/main.rs:162-168``, studied for behavior only) extended
from vertices to bounded neighborhood expansions.

Determinism contract (same discipline as ``walks``): NO RNG state — the
pick order at (seed, hop, parent) is the portable md5 stream
``portable_hash64("khop:" || seed || ":" || hop || ":" || parent || ":" ||
child)`` with ties broken by child id, so any ANSI-SQL engine replays the
exact sample with one ``row_number()`` window, and every parallelism level
produces bit-identical output.

Scale shape:
- hop h is ONE equi-join of the (seed, frontier-vertex) table against the
  edge table on the frontier key, followed by a window partitioned by
  (seed, parent) — never a global window; the partition size is bounded by
  max out-degree, the same hub-bound as ``walks.node2vec_walks`` (a >10^7
  out-degree hub should pre-cap its candidate list by the same
  sorted-prefix rule; documented, not speculatively built).
- fixed depth ``len(fanouts)`` composes as ONE lazy plan: no driver loop
  state, no fixpoint — Catalyst sees all hops at once and reuses the edge
  scan across hops (ReusedExchange at matched partitioning).
- frontier dedup per (seed, v) bounds the fan-out: a vertex reached twice
  within one seed's hop expands once (its sampled children are shared, which
  is exactly GraphSAGE's computation-graph sharing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash64


def khop_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (4, 3),
    salt: str = "khop:",
) -> DataFrame:
    """(seed, hop, parent, child) — the sampled rooted neighborhood of every
    seed, hop numbering from 1, at most ``fanouts[h-1]`` children per
    (seed, parent).

    ``seeds`` is a one-column DataFrame (``seed``). Directed expansion along
    ``src → dst`` (sinks simply stop expanding, like stalled walks).
    """
    if not fanouts:
        raise ValueError("fanouts must name at least one hop")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    frontier = seeds.select("seed", F.col("seed").alias("v"))
    out: DataFrame | None = None
    for hop, fan in enumerate(fanouts, start=1):
        cand = frontier.join(e, frontier.v == e.src).select(
            "seed",
            F.lit(hop).cast("int").alias("hop"),
            F.col("v").alias("parent"),
            F.col("dst").alias("child"),
        )
        key = portable_hash64(
            F.concat_ws(
                ":",
                F.col("seed").cast("string"),
                F.col("hop").cast("string"),
                F.col("parent").cast("string"),
                F.col("child").cast("string"),
            ),
            salt=salt,
        )
        w = Window.partitionBy("seed", "parent").orderBy(key, F.col("child"))
        picked = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(fan))
            .drop("_rn")
        )
        out = picked if out is None else out.unionByName(picked)
        frontier = picked.select("seed", F.col("child").alias("v")).distinct()
    return out
