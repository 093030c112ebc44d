"""Randomized (seeded) cross-validation on arbitrary graph shapes.

Fixture-based goldens pin known values; these sweep random graph topologies
against independent oracles (networkx / pure-python BFS) to catch shape-specific
bugs: self-loops, multi-edges, isolated vertices, disconnected components.
"""

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.avgdist import exact_avgdist
from avgdist_rs_spark.operators.components import connected_components
from avgdist_rs_spark.operators.pagerank import pagerank
from avgdist_rs_spark.operators.triangles import triangle_count
from avgdist_rs_spark.plans.graph import GraphFrame
from tests import oracle


def random_graph(spark, seed: int, n: int = 80, density: float = 2.0):
    rng = np.random.default_rng(seed)
    m = int(n * density)
    pairs = np.column_stack(
        [rng.integers(0, n, m), rng.integers(0, n, m)]
    ).astype(np.int64)
    # deliberately includes self-loops and duplicate edges
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    g = GraphFrame.from_edges(df, num_nodes=n)
    return g, pairs


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_exact_avgdist_matches_python_oracle(spark, seed):
    g, pairs = random_graph(spark, seed)
    got = exact_avgdist(g)
    adj, n = oracle.adjacency(pairs, g.num_nodes)
    dia = s = c = 0
    for v in range(n):
        d, ds, cnt, _ = oracle.bfs(adj, n, v)
        dia = max(dia, d)
        s += ds
        c += cnt
    assert got["diameter"] == dia
    assert got["dist_sum"] == s and got["reached_pairs"] == c
    g.unpersist()


@pytest.mark.parametrize("seed", [4, 5])
def test_cc_matches_networkx(spark, seed):
    g, pairs = random_graph(spark, seed)
    got = {r["v"]: r["component"] for r in connected_components(g).collect()}
    nxg = nx.Graph()
    nxg.add_nodes_from(range(g.num_nodes))
    nxg.add_edges_from(map(tuple, pairs))
    for comp in nx.connected_components(nxg):
        mn = min(comp)
        for v in comp:
            assert got[v] == mn
    g.unpersist()


@pytest.mark.parametrize("seed", [6])
def test_pagerank_matches_numpy_power_iteration(spark, seed):
    g, pairs = random_graph(spark, seed)
    iters = 40
    got = {r["v"]: r["rank"] for r in pagerank(g, iterations=iters).collect()}
    n = g.num_nodes
    edges = sorted({tuple(p) for p in map(tuple, pairs)})
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[b] += r[a] / outdeg[a]
        dangling = 1.0 - contrib.sum()
        r = (1 - 0.85) / n + 0.85 * dangling / n + 0.85 * contrib
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    g.unpersist()


@pytest.mark.parametrize("seed", [7, 8])
def test_triangles_match_networkx(spark, seed):
    g, pairs = random_graph(spark, seed, density=3.0)
    nxg = nx.Graph()
    nxg.add_edges_from((a, b) for a, b in map(tuple, pairs) if a != b)
    want = sum(nx.triangles(nxg).values()) // 3
    assert triangle_count(g) == want
    g.unpersist()


@pytest.mark.parametrize("seed,density", [(9, 1.6), (10, 2.5), (11, 0.8)])
def test_scc_matches_networkx_random_digraphs(spark, seed, density):
    """Priority-order pointer-jump SCC on arbitrary random digraphs (dense
    cores, DAG tails, self-loops, isolated vertices, multi-edges) — the r4
    rewrite's trickiest math, swept at varying densities vs networkx."""
    from avgdist_rs_spark.operators.scc import strongly_connected_components

    g, pairs = random_graph(spark, seed, density=density)
    got = {r["v"]: r["component"] for r in strongly_connected_components(g).collect()}
    nxg = nx.DiGraph()
    nxg.add_nodes_from(range(g.num_nodes))
    nxg.add_edges_from(map(tuple, pairs))
    assert set(got) == set(range(g.num_nodes))
    for comp in nx.strongly_connected_components(nxg):
        mn = min(comp)
        for v in comp:
            assert got[v] == mn, f"seed={seed} v={v}"
    g.unpersist()


@pytest.mark.parametrize("seed", [12, 13])
def test_betweenness_strategies_match_networkx_random(spark, seed):
    """Broadcast-numpy and sharded-lockstep Brandes vs networkx on random
    digraphs, exact mode — σ>1 path diamonds occur naturally at this density."""
    from avgdist_rs_spark.operators.betweenness import betweenness

    g, pairs = random_graph(spark, seed, n=60, density=2.0)
    nxg = nx.DiGraph()
    nxg.add_nodes_from(range(g.num_nodes))
    nxg.add_edges_from((a, b) for a, b in map(tuple, pairs) if a != b)
    want = nx.betweenness_centrality(nxg, normalized=False)
    for strat in ("broadcast", "shards"):
        got = {
            r["v"]: r["bc"]
            for r in betweenness(g, strategy=strat).collect()
        }
        for v in range(g.num_nodes):
            assert got[v] == pytest.approx(want[v], abs=1e-6), f"{strat} v={v}"
    g.unpersist()
