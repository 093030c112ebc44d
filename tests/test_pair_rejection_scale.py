"""Scale shape of the portable pair-rejection sampler (K3).

Round-2 verdict findings: the sampler collected every distinct drawn source to
the driver (O(n) Python list at the reference's 668M vertices) and ranked
acceptances with a global single-partition ``Window.orderBy(j)``. The reworked
sampler processes the draw window in adaptive increasing-j slices, feeds
sources to BFS as a DataFrame, and selects first-k with a two-phase
per-partition top-k — asserted here the same way ``test_csr_shards`` asserts
the shard build: a real multi-million-vertex run with a driver-RSS ceiling,
plus a plan check that the only global sort ranks the ≤ partitions·k
survivors of the partial top-k, never the full acceptance set.
"""

import contextlib
import io
import resource

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.avgdist import (
    _topk_by,
    sample_pair_rejection_hash,
)
from avgdist_rs_spark.plans.graph import GraphFrame


def test_topk_by_exact_and_partition_bounded(spark):
    """Two-phase selection == global sort selection, on a many-partition DF."""
    n, k = 1_000_000, 10
    df = (
        spark.range(n)
        .select(
            # scrambled but deterministic key
            F.pmod(F.xxhash64(F.col("id")), F.lit(n * 4)).alias("j"),
            F.col("id").alias("payload"),
        )
        .repartition(16)
    )
    got = _topk_by(df, k, "j").orderBy("rank").toPandas()
    want = df.orderBy("j").limit(k).toPandas().reset_index(drop=True)
    assert list(got["j"]) == list(want["j"])
    assert list(got["payload"]) == list(want["payload"])
    assert list(got["rank"]) == list(range(1, k + 1))


def _hub_graph(spark, n: int, hubs: int = 1024) -> GraphFrame:
    """Every vertex points at one of ``hubs`` hub vertices; hubs form a
    de Bruijn doubling graph (i → 2i, 2i+1 mod hubs): out-degree 2, strongly
    connected, diameter log2(hubs) — so reach(v) = hubs at shallow depth with
    LOW expansion volume (frontier × 2, not × log hubs)."""
    verts = spark.range(hubs, n).select(
        F.col("id").alias("src"), F.pmod(F.col("id"), F.lit(hubs)).alias("dst")
    )
    h = spark.range(hubs)
    jumps = h.select(
        F.col("id").alias("src"), F.pmod(F.col("id") * 2, F.lit(hubs)).alias("dst")
    ).union(
        h.select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") * 2 + 1, F.lit(hubs)).alias("dst"),
        )
    )
    return GraphFrame.from_edges(verts.union(jumps), num_nodes=n, dedup=False)


def test_pair_rejection_no_driver_materialization_and_no_global_sort(spark):
    """2M-vertex graph: the sampler must neither collect the drawn-source set
    (an O(n) Python list would be ~160 MB here, multi-GB at reference scale)
    nor globally sort all acceptances in one partition."""
    n, k, hubs = 2_000_000, 8, 16_384
    g = _hub_graph(spark, n, hubs=hubs)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    try:
        hit = sample_pair_rejection_hash(
            g, k, window_factor=100, impl="shards", first_slice=1024
        )
        pdf = hit.orderBy("rank").toPandas()
        assert len(pdf) == k
        assert list(pdf["rank"]) == list(range(1, k + 1))
        # hub graph invariants: a non-hub source reaches its hub + the other
        # hubs (= hubs total), a hub source one fewer, at depth ≤ log2(hubs)+1
        assert pdf["reached"].isin([hubs, hubs - 1]).all()
        assert pdf["dia"].max() <= 2 * int(np.log2(hubs)) + 1  # de Bruijn diameter
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert (rss1 - rss0) // 1024 < 120, "driver-side materialization detected"
        # plan: the ranking Window's input is the per-partition top-k
        # (MapInPandas), i.e. ≤ partitions·k rows — not the raw acceptance set
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            hit.explain("formatted")
        plan = buf.getvalue()
        assert "Window" in plan and "MapInPandas" in plan
        assert plan.index("Window") < plan.index("MapInPandas")  # topk feeds the rank
    finally:
        g.unpersist()


def test_sliced_equals_single_window(spark):
    """First-k-by-j is slice-schedule-independent: forcing many tiny slices
    must reproduce the default schedule's exact output."""
    from avgdist_rs_spark.sources.fixtures import barabasi_graph

    g = barabasi_graph(spark, n=400, m=2, seed=11)
    k = 12
    a = (
        sample_pair_rejection_hash(g, k, window_factor=100)
        .orderBy("rank")
        .toPandas()
    )
    b = (
        sample_pair_rejection_hash(g, k, window_factor=100, first_slice=97)
        .orderBy("rank")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)
