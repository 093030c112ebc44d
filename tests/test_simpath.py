"""SIMPATH parity (reference K8): simple-path enumeration s→t."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.simpath import (
    count_simple_paths,
    simple_paths,
    simple_paths_edges,
)
from avgdist_rs_spark.sources.fixtures import barabasi_graph, barabasi_pairs, cycle3_graph, star_graph


def test_cycle3(spark):
    # labeled fixture (reference data/labeled: a->b->c->a): exactly one a->c path
    g = cycle3_graph(spark)
    paths = simple_paths(g, 0, 2).collect()
    assert len(paths) == 1 and paths[0]["path"] == [0, 1, 2] and paths[0]["hops"] == 2


def test_star_paths(spark):
    # star: center 0 -> spokes -> leaves; exactly one path 0 ~> any leaf
    g = star_graph(spark, n=50)
    leaf = 100  # leaves are the second block of vertices
    assert count_simple_paths(g, 0, leaf) == 1


def test_matches_networkx_on_barabasi(spark):
    g = barabasi_graph(spark, n=60, m=2, seed=7)
    nxg = nx.DiGraph(list(map(tuple, barabasi_pairs(n=60, m=2, seed=7))))
    s, t = 59, 0  # barabasi edges point new->old; 59 has out-edges
    want = list(nx.all_simple_paths(nxg, s, t))
    got = [r["path"] for r in simple_paths(g, s, t).collect()]
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_string_keyed_edges(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")], "src string, dst string"
    )
    got = sorted(r["path"] for r in simple_paths_edges(spark, e, "a", "c").collect())
    assert got == [["a", "b", "c"], ["a", "c"]]


def test_max_frontier_guard(spark):
    g = barabasi_graph(spark, n=60, m=2, seed=7)
    with pytest.raises(RuntimeError, match="max_frontier"):
        simple_paths(g, 59, 0, max_frontier=1)


def test_max_len_bound(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    got = simple_paths_edges(spark, e, "a", "c", max_len=1).collect()
    assert len(got) == 1 and got[0]["path"] == ["a", "c"]


def test_count_dp_matches_enumeration(spark):
    """The set-sharing DP counts exactly what enumeration enumerates."""
    g = barabasi_graph(spark, n=60, m=2, seed=7)
    want = simple_paths(g, 59, 0).count()
    assert count_simple_paths(g, 59, 0) == want
    g.unpersist()


def test_count_dp_string_keys(spark):
    from avgdist_rs_spark.operators.simpath import count_simple_paths_edges

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")], "src string, dst string"
    )
    assert count_simple_paths_edges(spark, e, "a", "c") == 2


def test_count_dp_dense_graph_where_enumeration_explodes(spark):
    """K12: ~9.86M simple paths s→t — enumeration would checkpoint millions of
    path rows per level; the DP's state space is the (tail, set) lattice,
    ~10^4 rows, and finishes in seconds. Count checked against the closed
    form sum_k P(n-2, k)."""
    import math

    from avgdist_rs_spark.plans.graph import GraphFrame

    n = 12
    ids = spark.range(n)
    edges = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    g = GraphFrame.from_edges(edges, num_nodes=n, dedup=False)
    want = sum(math.perm(n - 2, k) for k in range(n - 1))
    assert want > 5_000_000  # enumeration really would explode
    got = count_simple_paths(g, 0, n - 1)
    assert got == want
    g.unpersist()


def test_count_dp_max_states_guard(spark):
    g = barabasi_graph(spark, n=60, m=2, seed=7)
    with pytest.raises(RuntimeError, match="max_states"):
        count_simple_paths(g, 59, 0, max_states=1)
    g.unpersist()
