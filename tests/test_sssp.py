"""Weighted SSSP: networkx Dijkstra parity on identical weights."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.sssp import hash_weights, sssp

nx = pytest.importorskip("networkx")


def py_hash64(s: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def _nx_sssp(weighted, source):
    g = nx.DiGraph()
    for s, d, w in weighted:
        if s == d:
            continue
        # parallel edges: keep the lightest (sssp semantics are min anyway)
        if g.has_edge(s, d):
            g[s][d]["weight"] = min(g[s][d]["weight"], w)
        else:
            g.add_edge(s, d, weight=w)
    return nx.single_source_dijkstra_path_length(g, source, weight="weight")


def test_sssp_hand_case(spark):
    rows = [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0), (3, 0, 1.0),
            (4, 0, 1.0)]  # 4 unreachable FROM 0 (only into 0)
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    src = spark.createDataFrame([(0,)], "v long")
    got = {r["v"]: r["dist"] for r in sssp(e, src).collect()}
    # 0→2 (1) →1 (3) →3 (4); direct 0→1 (10) loses
    assert got == {0: 0.0, 2: 1.0, 1: 3.0, 3: 4.0}


def test_sssp_matches_dijkstra_on_random_graphs(spark):
    rng = np.random.default_rng(23)
    for trial in range(3):
        n, m = 80, 240
        edges = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, n, m), rng.integers(0, n, m))]
        e = spark.createDataFrame(edges, "src long, dst long")
        ew = hash_weights(e)
        weighted = [(r["src"], r["dst"], r["w"]) for r in ew.collect()]
        src = spark.createDataFrame([(0,)], "v long")
        got = {r["v"]: r["dist"] for r in sssp(ew, src).collect()}
        want = _nx_sssp(weighted, 0)
        assert got == want, f"trial {trial}"


def test_sssp_weighted_beats_hop_path(spark):
    """A 5-hop cheap path must beat a 1-hop expensive edge — the case plain
    BFS gets wrong by construction."""
    rows = [(0, 9, 100.0)] + [(i, i + 1, 1.0) for i in range(9)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    src = spark.createDataFrame([(0,)], "v long")
    got = {r["v"]: r["dist"] for r in sssp(e, src).collect()}
    assert got[9] == 9.0


def test_sssp_rejects_negative_weights(spark):
    e = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, w double")
    src = spark.createDataFrame([(0,)], "v long")
    with pytest.raises(ValueError):
        sssp(e, src)


def test_sssp_parallelism_invariant_and_multisource(spark):
    rng = np.random.default_rng(31)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 50, 140), rng.integers(0, 50, 140))]
    ew = hash_weights(spark.createDataFrame(edges, "src long, dst long"))
    src = spark.createDataFrame([(0,), (7,)], "v long")
    a = sorted(map(tuple, sssp(ew, src).collect()))
    b = sorted(map(tuple, sssp(ew.repartition(11), src.repartition(2)).collect()))
    assert a == b
    # multi-source = min over per-source distances
    got = dict(a)
    w_list = [(r["src"], r["dst"], r["w"]) for r in ew.collect()]
    d0, d7 = _nx_sssp(w_list, 0), _nx_sssp(w_list, 7)
    keys = set(d0) | set(d7)
    want = {k: min(d0.get(k, float("inf")), d7.get(k, float("inf"))) for k in keys}
    assert got == want


def test_hash_weights_match_python(spark):
    e = spark.createDataFrame([(3, 5), (5, 3)], "src long, dst long")
    got = {(r["src"], r["dst"]): r["w"] for r in hash_weights(e).collect()}
    for s, d in [(3, 5), (5, 3)]:
        assert got[(s, d)] == float(py_hash64(f"{s}>{d}", "sw:") % 9 + 1)
