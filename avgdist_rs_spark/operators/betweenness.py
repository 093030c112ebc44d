"""Betweenness centrality (Brandes) — seed-parallel over broadcast CSR.

Completes the centrality family (harmonic / closeness / Lin / eccentricity):
bc(v) = Σ_{s≠v≠t} σ_st(v)/σ_st over DIRECTED shortest paths — the classic
"broker" score; on a transcript graph it ranks the turns every reply chain
routes through. Public algorithm (Brandes 2001): one BFS per source computes
shortest-path counts σ level by level, then a reverse sweep accumulates
dependencies δ(v) = Σ_{w: succ} σ_v/σ_w · (1 + δ(w)).

Spark shape — the same seed-parallel strategy as ``bfs_csr``: sources are
distributed one-task-per-core over the broadcast CSR, each task runs
level-vectorized numpy Brandes per seed (np.add.at over the tree edges —
never per-row Python) and emits ONE partial n-vector of dependency sums; the
driver-visible result is a single groupBy("v").sum. ``seeds`` samples sources
for the standard O(k·m) approximation (Brandes–Pich); ``None`` = exact.
Gated by the same broadcast cap as ``bfs_csr`` (the beyond-memory strategy
would shard the CSR like ``bfs_frontier(shards=True)``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.graph import GraphFrame, _num_partitions_for
from .bfs import DEFAULT_CSR_MAX_EDGES, _gather


def _brandes_seed(
    offsets: np.ndarray,
    targets: np.ndarray,
    n: int,
    seed: int,
    acc: np.ndarray,
    dist: np.ndarray,
    sigma: np.ndarray,
    delta: np.ndarray,
) -> None:
    """Accumulate one source's dependencies into ``acc`` (scratch arrays are
    caller-owned and reset here — no per-seed allocation)."""
    dist.fill(-1)
    sigma.fill(0.0)
    delta.fill(0.0)
    dist[seed] = 0
    sigma[seed] = 1.0
    frontier = np.array([seed], dtype=np.int64)
    levels: list[tuple[np.ndarray, np.ndarray]] = []  # tree edges per depth
    d = 0
    while frontier.size:
        starts = offsets[frontier]
        counts = offsets[frontier + 1] - starts
        ws = _gather(offsets, targets, frontier)
        if ws.size == 0:
            break
        us = np.repeat(frontier, counts)
        # first touch: vertices entering at depth d+1
        fresh = np.unique(ws[dist[ws] == -1])
        dist[fresh] = d + 1
        # tree edges = edges into the (d+1)-level set
        sel = dist[ws] == d + 1
        tu, tw = us[sel], ws[sel]
        if tu.size:
            np.add.at(sigma, tw, sigma[tu])
            levels.append((tu, tw))
        frontier = fresh
        d += 1
    for tu, tw in reversed(levels):
        np.add.at(delta, tu, sigma[tu] / sigma[tw] * (1.0 + delta[tw]))
    delta[seed] = 0.0
    acc += delta


def betweenness(
    graph: GraphFrame,
    seeds: np.ndarray | None = None,
    transposed: bool = False,
) -> DataFrame:
    """(v, bc) — directed, unnormalized betweenness. ``seeds=None`` → exact
    (every vertex a source); an array of sources → the sampled approximation
    scaled by n/k (unbiased estimator of the exact score)."""
    from .bfs import _seed_batches

    if graph.num_edges > DEFAULT_CSR_MAX_EDGES:
        raise ValueError(
            f"graph has {graph.num_edges} edges > CSR fast-path cap "
            f"{DEFAULT_CSR_MAX_EDGES}; shard the sources over bfs_frontier"
        )
    bc = graph.csr_broadcast(transposed=transposed)
    n = graph.num_nodes
    scale = 1.0 if seeds is None else float(n) / max(1, len(seeds))
    seeds_df = (
        graph.vertices().select(F.col("v").alias("seed"))
        if seeds is None
        else _seed_batches(graph, np.asarray(seeds, dtype=np.int64))
    )
    if seeds is None:
        seeds_df = seeds_df.repartition(_num_partitions_for(graph.spark))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        csr = bc.value
        offsets, targets = csr["offsets"], csr["targets"]
        acc = np.zeros(n)
        dist = np.empty(n, dtype=np.int32)
        sigma = np.empty(n)
        delta = np.empty(n)
        touched = False
        for pdf in batches:
            for s in pdf["seed"].to_numpy(dtype=np.int64):
                touched = True
                _brandes_seed(offsets, targets, n, int(s), acc, dist, sigma, delta)
        if touched:
            nz = np.flatnonzero(acc)
            yield pd.DataFrame({"v": nz, "part": acc[nz]})

    partials = seeds_df.mapInPandas(part, schema="v long, part double")
    return (
        graph.vertices()
        .join(partials.groupBy("v").agg(F.sum("part").alias("s")), "v", "left")
        .select(
            "v",
            F.round(F.coalesce(F.col("s"), F.lit(0.0)) * F.lit(scale), 6).alias("bc"),
        )
    )
