"""North-rule plumbing: durable checkpoint/resume + explicit hub salting.

"resumable from checkpoint with per-partition lineage + metrics" and
"partitioning / shuffle / skew handled explicitly" (BASELINE.json north_rule).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.functions.salting import salt_edges
from avgdist_rs_spark.operators.bfs import bfs_csr, bfs_frontier, per_seed_stats
from avgdist_rs_spark.operators.pagerank import pagerank
from avgdist_rs_spark.sources.fixtures import barabasi_graph, star_graph
from avgdist_rs_spark.streaming.superstep import Checkpointer, SuperstepMetrics


@pytest.fixture(scope="module")
def g(spark):
    return barabasi_graph(spark, n=200, m=3, seed=42)


def _seeds_df(spark, ids):
    return spark.createDataFrame(pd.DataFrame({"seed": np.asarray(ids, dtype=np.int64)}))


# ------------------------------------------------------------------ checkpoint
def test_pagerank_durable_checkpoint_and_resume(spark, g, tmp_path):
    ckdir = str(tmp_path / "ck")
    # interrupted run: 4 supersteps, durable every superstep
    pagerank(g, iterations=4, checkpointer=Checkpointer(spark, "pr", ckdir, every=1))
    manifest = os.path.join(ckdir, "pr", "manifest.jsonl")
    lines = [json.loads(x) for x in open(manifest)]
    assert [l["superstep"] for l in lines] == [1, 2, 3, 4]
    assert all(os.path.exists(l["path"]) for l in lines)
    # per-partition lineage: checkpoints are real multi-file parquet state
    assert any(f.endswith(".parquet") for f in os.listdir(lines[-1]["path"]))

    # resume to 10 must equal an uninterrupted 10-superstep run
    resumed = pagerank(
        g,
        iterations=10,
        checkpointer=Checkpointer(spark, "pr", ckdir, every=1),
        resume=True,
    ).toPandas().set_index("v")["rank"]
    full = pagerank(g, iterations=10).toPandas().set_index("v")["rank"]
    assert np.allclose(resumed.sort_index(), full.sort_index(), atol=1e-12)
    # resume really started from superstep 4, not 0
    lines = [json.loads(x) for x in open(manifest)]
    assert [l["superstep"] for l in lines] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]


def test_bfs_frontier_durable_checkpoint(spark, g, tmp_path):
    ck = Checkpointer(spark, "bfs", str(tmp_path / "ck2"), every=2)
    met = SuperstepMetrics(name="bfs")
    seeds = [0, 5, 9]
    vis = bfs_frontier(g, _seeds_df(spark, seeds), checkpointer=ck, metrics=met)
    got = per_seed_stats(vis).toPandas().set_index("seed").sort_index()
    want = (
        bfs_csr(g, np.array(seeds, dtype=np.int64))
        .toPandas()
        .set_index("seed")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, want[got.columns])
    # metrics recorded one row per superstep with wall times
    assert met.total_supersteps >= 2 and met.total_wall_s > 0
    assert met.supersteps_per_min() > 0


# --------------------------------------------------------------------- salting
def test_salt_edges_spreads_hub_adjacency(spark):
    g = star_graph(spark, n=101)  # vertex 0 -> 1..100 hub fan-out
    hub_df = spark.createDataFrame([(0,)], "v long")
    salted = salt_edges(g.edges, hub_df, num_salts=4).toPandas()
    hub_salts = salted[salted.src == 0]["salt"].nunique()
    assert hub_salts == 4  # hub adjacency split across all salts
    assert (salted[salted.src != 0]["salt"] == 0).all()


def test_salted_bfs_equals_unsalted(spark, g):
    seeds = [0, 3, 7]
    plain = per_seed_stats(
        bfs_frontier(g, _seeds_df(spark, seeds))
    ).toPandas().set_index("seed").sort_index()
    salted = per_seed_stats(
        bfs_frontier(g, _seeds_df(spark, seeds), num_salts=4)
    ).toPandas().set_index("seed").sort_index()
    pd.testing.assert_frame_equal(plain, salted)


def test_salted_bfs_with_explicit_hubs_on_star(spark):
    g = star_graph(spark, n=1000)  # 2n+1 = 2001 vertices (reference star)
    hub_df = spark.createDataFrame([(0,)], "v long")
    vis = bfs_frontier(g, _seeds_df(spark, [0]), num_salts=8, hub_df=hub_df)
    stats = per_seed_stats(vis).collect()[0]
    # star fixture: 0 -> spokes -> leaves (reference golden: diameter 2)
    assert stats["dia"] == 2 and stats["reached"] == 2000


def test_bfs_frontier_resume_from_checkpoint(spark, g, tmp_path):
    """Interrupted BFS resumes from the durable checkpoint and matches an
    uninterrupted run (north rule: any BFS superstep is resumable)."""
    ckdir = str(tmp_path / "ckr")
    seeds = [0, 5, 9]
    # interrupted run: stop after 2 supersteps, durable every superstep
    bfs_frontier(
        g,
        _seeds_df(spark, seeds),
        checkpointer=Checkpointer(spark, "bfs", ckdir, every=1),
        max_supersteps=2,
    )
    resumed = per_seed_stats(
        bfs_frontier(
            g,
            _seeds_df(spark, seeds),
            checkpointer=Checkpointer(spark, "bfs", ckdir, every=1),
            resume=True,
        )
    ).toPandas().set_index("seed").sort_index()
    full = per_seed_stats(
        bfs_frontier(g, _seeds_df(spark, seeds))
    ).toPandas().set_index("seed").sort_index()
    pd.testing.assert_frame_equal(resumed, full)


def test_chained_local_checkpoints_stay_flat(spark):
    """Regression for the Spark 4.1.2 chained-localCheckpoint cost blow-up:
    a chain of localCheckpoints (each checkpointed FROM the previous one)
    multiplies its per-cut job cost ~2.5x per link past ~12 links even though
    the logical plan and rdd lineage stay flat. Checkpointer.step resets the
    chain with a Parquet roundtrip every HARD_EVERY cuts; 30 chained cuts of
    a self-join loop must therefore stay near-constant-cost (the unfixed
    chain takes >60s per cut by link 21 — measured before the fix)."""
    import time

    from pyspark.sql import functions as F

    from avgdist_rs_spark.streaming.superstep import Checkpointer

    ckpt = Checkpointer(spark, name="chainflat", every=1)
    par = spark.createDataFrame(
        [(i, (i + 1) % 7) for i in range(7)], "c long, p long"
    ).localCheckpoint(eager=True)
    early, late = [], []
    for j in range(30):
        t0 = time.monotonic()
        g = par.select(F.col("c").alias("_pc"), F.col("p").alias("_pp"))
        jumped = par.join(g, par.p == F.col("_pc"), "left").select(
            "c", F.coalesce("_pp", "p").alias("p")
        )
        par = ckpt.step(jumped, j + 1)
        (early if j < 10 else late).append(time.monotonic() - t0)
    assert par.count() == 7
    # the unfixed blow-up is ~100x by link 25; flat-with-noise is <5x
    assert max(late) < 5 * max(max(early), 0.2), (early, late)
