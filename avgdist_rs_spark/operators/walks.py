"""Deterministic random-walk corpus generation (DeepWalk-style) + skip-gram
pair extraction — the graph→training-data bridge of the pipeline family.

A 100 TB link graph becomes embedding training data in two steps: (1) a
corpus of fixed-length random walks over the graph, (2) (center, context)
skip-gram pairs windowed over each walk. Both are expressed here as pure
DataFrame plans with NO driver-side loop state and NO RNG: every draw is the
engine-portable md5 hash stream (``functions.hashing.portable_hash64``) of
``(seed, walk_id, step, current-vertex)``, so any ANSI-SQL engine replays the
exact same walks — the DuckDB correctness oracle verifies them value-exactly,
and re-running at any parallelism is bit-identical (no partition-order or
RNG-state dependence, unlike ``rand()``-based samplers).

Reference seed: the reference engine samples *vertices* for distance
estimation (`/root/reference/src/main.rs:162-168`, studied for behavior
only); walks are the natural pipeline extension of the same
hash-driven-sampling idea to *trajectories*, feeding the skip-gram stage a
tokenizer consumes (DeepWalk, Perozzi et al. 2014, KDD — public method).

Scale shape:
- ``ranked_adjacency`` is ONE hash-shuffle groupBy producing one row per
  vertex ``(v, nbrs sorted-array, deg)``. The whole walk is then
  ``walk_length`` equi-joins of the walk table against it — all in ONE
  lazily-composed plan: identical adjacency subplans across steps collapse
  to a single build via Catalyst's ReusedExchange (and the adjacency is
  cached when ``walk_length > 1`` so the groupBy itself runs once).
- The draw needs only walk-side columns (walk_id, step, cur); the modulus
  ``deg`` and the pick ``element_at(nbrs, pick+1)`` are evaluated AFTER the
  join — so each step is exactly one equi-join on ``cur = v``, no second
  degree-lookup join.
- Hub skew: a mega-hub's adjacency is ONE wide row; the join itself stays
  balanced because walks hash-partition by ``cur``. At true web scale a
  >10⁷-neighbor row should be chunked ``(v, chunk_id, nbrs_chunk)`` with the
  pick routed by ``pick div chunk``; not needed at any tested scale and
  documented rather than speculatively built.
- Walks at sinks (directed mode): the step LEFT-joins, a missing adjacency
  row stalls the walk (path stops growing) — undirected mode (default) has
  no sinks by construction, so every walk reaches full length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def ranked_adjacency(edges: DataFrame, undirected: bool = True) -> DataFrame:
    """One row per vertex: (v, nbrs: sorted distinct neighbor array, deg).

    Sorted-distinct makes ``nbrs[k]`` a deterministic function of the edge
    SET — independent of input row order, duplicates, or partitioning — which
    is what lets a SQL oracle (``list(dst ORDER BY dst)``) replay the walks.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        e.distinct()
        .groupBy(F.col("src").alias("v"))
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .withColumn("deg", F.size("nbrs").cast("long"))
    )


def random_walks(
    edges: DataFrame,
    walk_length: int,
    seed: str = "walk",
    walks_per_start: int = 1,
    starts: DataFrame | None = None,
    undirected: bool = True,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(walk_id, start, path: array, steps) — one deterministic walk per
    (start, replica), ``walk_length`` hash-driven steps.

    Step t draws ``pick = pmod(h(seed:walk_id:t:cur), deg(cur))`` and moves to
    ``nbrs(cur)[pick]``. ``walk_id`` is the start vertex itself when
    ``walks_per_start == 1``, else ``start#replica``.

    ``starts`` (optional single-column DataFrame named ``v``) restricts the
    start set; default = every vertex with at least one edge. ``steps`` <
    ``walk_length`` only in directed mode when the walk stalls at a sink.
    ``checkpoint_every`` breaks the composed plan every k steps for very long
    walks (plan-size relief; off by default — a 10-20 step walk is one plan).
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    adj = ranked_adjacency(edges, undirected=undirected)
    if walk_length > 1:
        adj = adj.cache()

    base = adj.select("v") if starts is None else starts.select("v")
    if walks_per_start == 1:
        w = base.select(
            F.col("v").cast("string").alias("walk_id"),
            F.col("v").alias("start"),
            F.col("v").alias("cur"),
            F.array("v").alias("path"),
        )
    else:
        reps = F.explode(
            F.sequence(F.lit(0), F.lit(int(walks_per_start) - 1))
        ).alias("rep")
        w = base.select("v", reps).select(
            F.concat_ws("#", F.col("v").cast("string"), F.col("rep")).alias("walk_id"),
            F.col("v").alias("start"),
            F.col("v").alias("cur"),
            F.array("v").alias("path"),
        )

    for t in range(1, walk_length + 1):
        a = adj.select(F.col("v").alias("_av"), "nbrs", "deg")
        j = w.join(a, w.cur == F.col("_av"), "left")
        pick = F.pmod(
            portable_hash64(
                F.concat_ws(
                    ":", F.lit(seed), F.col("walk_id"), F.lit(str(t)), F.col("cur")
                )
            ),
            F.col("deg"),
        )
        nxt = F.element_at(F.col("nbrs"), (pick + F.lit(1)).cast("int"))
        w = j.select(
            "walk_id",
            "start",
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(nxt.isNotNull(), F.concat(F.col("path"), F.array(nxt)))
            .otherwise(F.col("path"))
            .alias("path"),
        )
        if checkpoint_every and t % checkpoint_every == 0 and t < walk_length:
            w = w.localCheckpoint(eager=False)

    return w.select(
        "walk_id",
        "start",
        "path",
        (F.size("path") - F.lit(1)).cast("long").alias("steps"),
    )


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, cnt) — positional skip-gram pairs over each walk's
    path, context positions j with 0 < |i - j| <= window (positional, so a
    vertex revisited inside its own window DOES pair with itself — standard
    skip-gram semantics over token streams).

    Pure explode/aggregate: spreads on the scan, one final groupBy — the
    map-side combine absorbs the within-walk repetition before the shuffle.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    e = walks.select("path", F.posexplode("path").alias("i", "center"))
    j = F.explode(
        F.sequence(
            F.greatest(F.col("i") - window, F.lit(0)),
            F.least(F.col("i") + window, F.size("path") - 1),
        )
    ).alias("j")
    ctx = e.select("path", "i", "center", j).where(F.col("j") != F.col("i"))
    return (
        ctx.select(
            "center",
            F.element_at(F.col("path"), (F.col("j") + 1).cast("int")).alias("context"),
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("cnt"))
    )
