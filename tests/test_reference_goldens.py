"""Exact-mode parity against the reference's own datasets + golden outputs.

Inputs are the CSV edge lists checked into the reference's test corpus
(`/root/reference/data/*/{name}.csv` — public datasets: SNAP twitter ego,
wiki-Vote, p2p-Gnutella); expected values are the reference's archived
exact-mode runs (``*-01e-true.out``: ``average of averages: distance D
(norm N) ... diameter E``). ``norm`` = mean·(n−1) = Σdist/Σcount, i.e. our
``exact_avgdist``'s avg_distance.
"""

import os

import pytest

from avgdist_rs_spark.operators.avgdist import exact_avgdist
from avgdist_rs_spark.plans.graph import GraphFrame

CASES = [
    # (csv path, n, m_arcs, exact distance, norm (3dp), diameter)
    ("/root/reference/data/twitter/twitter.csv", 475, 13289, 0.004972894, 2.357, 6),
    ("/root/reference/data/wikipedia-vote-network/wiki.csv", 7115, 103689, 0.000469639, 3.341, 10),
    ("/root/reference/data/gnutella/gnutella.csv", 22687, 54705, 0.000344487, 7.815, 22),
]


@pytest.mark.parametrize("path,n,m,dist,norm,dia", CASES, ids=["twitter", "wiki", "gnutella"])
def test_exact_avgdist_matches_reference_golden(spark, path, n, m, dist, norm, dia):
    if not os.path.exists(path):
        pytest.skip(f"reference dataset not present: {path}")
    edges = spark.read.csv(path, schema="src string, dst string")
    g = GraphFrame.from_any_edges(edges)
    assert g.num_nodes == n, f"|V| mismatch: {g.num_nodes} vs reference {n}"
    r = exact_avgdist(g)
    # reference golden: norm == S/C, distance == norm/(n-1)
    assert round(r["avg_distance"], 3) == norm
    assert r["avg_distance"] / (n - 1) == pytest.approx(dist, abs=1e-9)
    assert r["diameter"] == dia
    g.unpersist()
