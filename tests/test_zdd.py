"""SIMPATH ZDD parity (reference K8 full mode: to_zdd / bdd_reduce /
zdd_all_sols, lib.rs:488-782): compressed simple-path solution sets."""

import networkx as nx
import pytest

from avgdist_rs_spark.operators.simpath import count_simple_paths_edges
from avgdist_rs_spark.operators.zdd import (
    simpath_zdd_edges,
    simple_paths_zdd_edges,
)


def _edges_df(spark, G):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in G.edges], "src bigint, dst bigint"
    )


def _nx_paths(G, s, t):
    return sorted(tuple(p) for p in nx.all_simple_paths(G, s, t))


@pytest.mark.parametrize("trial,p", [(0, 0.25), (1, 0.4), (2, 0.6), (3, 0.35), (4, 0.5)])
def test_random_graph_parity(spark, trial, p):
    import random

    n = random.Random(trial).randint(5, 10)
    G = nx.gnp_random_graph(n, p, seed=200 + trial)
    if not nx.has_path(G, 0, n - 1):
        pytest.skip("disconnected draw")
    z = simpath_zdd_edges(spark, _edges_df(spark, G), 0, n - 1, chunk_arcs=7)
    want = _nx_paths(G, 0, n - 1)
    assert z.count() == len(want)
    got = sorted(tuple(r["path"]) for r in z.paths(min_prefixes=4).collect())
    assert got == want


def test_grid_4x4_classic_fixture(spark):
    # the classic SIMPATH fixture: 184 corner-to-corner paths on the 4x4 grid
    G = nx.convert_node_labels_to_integers(nx.grid_2d_graph(4, 4), ordering="sorted")
    z = simpath_zdd_edges(spark, _edges_df(spark, G), 0, 15, chunk_arcs=8)
    assert z.count() == 184
    # sharing: the reduced ZDD is ~¼ the number of paths
    assert z.num_nodes < 184
    assert z.paths().count() == 184


def test_grid_5x5_count_only(spark):
    # 8512 corner-to-corner paths on the 5x5 grid — counted, not enumerated
    G = nx.convert_node_labels_to_integers(nx.grid_2d_graph(5, 5), ordering="sorted")
    z = simpath_zdd_edges(spark, _edges_df(spark, G), 0, 24, chunk_arcs=16)
    assert z.count() == 8512


def test_bipartite_compression_vs_set_dp(spark):
    # K5,16-shaped affiliation graph: 282,976 paths in a <10k-node ZDD.
    # Cross-check the count against the independent set-sharing DP
    # (count_simple_paths_edges on the symmetrized digraph counts each
    # undirected path exactly once as its s->t traversal).
    rows = [(f"T{i}", f"U{j}") for i in range(5) for j in range(16)]
    e = spark.createDataFrame(rows, "src string, dst string")
    z = simpath_zdd_edges(spark, e, "T0", "T4", chunk_arcs=32)
    assert z.count() == 282_976
    assert z.num_nodes < 10_000  # the compression IS the operator
    sym = e.union(e.selectExpr("dst AS src", "src AS dst"))
    assert count_simple_paths_edges(spark, sym, "T0", "T4") == 282_976


def test_string_keys_and_path_orientation(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "src string, dst string"
    )
    out = {tuple(r["path"]): r["hops"] for r in
           simple_paths_zdd_edges(spark, e, "a", "d").collect()}
    # undirected: a-c-d and a-b-c-d
    assert out == {("a", "c", "d"): 2, ("a", "b", "c", "d"): 3}


def test_direction_is_ignored(spark):
    # reversed edge rows give the same undirected solution set
    e1 = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    e2 = spark.createDataFrame([("b", "a"), ("c", "b")], "src string, dst string")
    p1 = sorted(tuple(r["path"]) for r in simple_paths_zdd_edges(spark, e1, "a", "c").collect())
    p2 = sorted(tuple(r["path"]) for r in simple_paths_zdd_edges(spark, e2, "a", "c").collect())
    assert p1 == p2 == [("a", "b", "c")]


def test_unreachable_target_raises(spark):
    e = spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    with pytest.raises(ValueError, match="unreachable"):
        simpath_zdd_edges(spark, e, "a", "d")


def test_max_states_guard(spark):
    G = nx.convert_node_labels_to_integers(nx.grid_2d_graph(5, 5), ordering="sorted")
    with pytest.raises(RuntimeError, match="max_states"):
        simpath_zdd_edges(spark, _edges_df(spark, G), 0, 24, chunk_arcs=4, max_states=3)


def test_reduced_zdd_properties(spark):
    # ZDD invariants after reduce: no hi==0 node survives (zero-suppression),
    # no duplicate (level, lo, hi) triple (sharing is maximal per level)
    G = nx.convert_node_labels_to_integers(nx.grid_2d_graph(4, 4), ordering="sorted")
    z = simpath_zdd_edges(spark, _edges_df(spark, G), 0, 15)
    seen = set()
    for lv, nid, lo, hi in z.nodes:
        assert hi != 0
        key = (lv, lo, hi)
        assert key not in seen
        seen.add(key)
    # raw table is strictly larger than the reduced one on this fixture
    assert z.raw_nodes > z.num_nodes
