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
    # reference's own exact run took 15.1 s single-node; ours ~12.6 s at local[32]
    ("/root/reference/data/enron/enron.csv", 36692, 367662, 0.000109704, 4.025, 13),
]


@pytest.mark.parametrize("path,n,m,dist,norm,dia", CASES, ids=["twitter", "wiki", "gnutella", "enron"])
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


def test_harmonic_matches_law_external_oracle(spark):
    """Per-vertex harmonic vs the reference's LAW/HyperBall golden arrays.

    `wiki.harmonic` holds HyperBall *approximations* (fractional values, run
    on incoming paths — our transposed direction), so the gate is their
    approximation error: exact values must sit within ~1% for essentially
    every vertex, with exact agreement on which vertices score zero.
    """
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from avgdist_rs_spark.operators.bfs import bfs_csr

    base = "/root/reference/data/wikipedia-vote-network"
    if not os.path.exists(f"{base}/wiki.harmonic"):
        pytest.skip("reference golden not present")
    law_nodes = [int(x) for x in open(f"{base}/wiki.nodes").read().split()]
    law_harm = np.array(json.loads(open(f"{base}/wiki.harmonic").read()))
    edges = spark.read.csv(f"{base}/wiki.csv", schema="src string, dst string")
    g = GraphFrame.from_any_edges(edges)
    orig2dense = {r["orig"]: r["id"] for r in g.nodes.collect()}
    law2our = np.array([orig2dense[str(o)] for o in law_nodes], dtype=np.int64)

    cap = bfs_csr(g, np.arange(g.num_nodes, dtype=np.int64), transposed=True, capture=True)
    h = cap.groupBy("v").agg(F.sum(1.0 / F.col("dist")).alias("h")).toPandas()
    ours = np.zeros(g.num_nodes)
    ours[h["v"].to_numpy()] = h["h"].to_numpy()
    mine = ours[law2our][: len(law_harm)]  # golden file is one entry short

    assert (law_harm == 0).sum() == (mine == 0).sum()  # same unreached set
    nz = law_harm > 0
    rel = np.abs(mine[nz] - law_harm[nz]) / law_harm[nz]
    assert rel.mean() < 0.01
    assert np.quantile(rel, 0.99) < 0.01
    assert (rel > 0.05).sum() <= 2  # lone artifacts of the truncated golden
    g.unpersist()


def test_closeness_and_nieminen_match_law_goldens(spark):
    """wiki.closeness / wiki.nieminen — the two LAW golden arrays the
    reference ships that round 1 left unused.

    Decoded semantics (verified empirically against the arrays): on incoming
    paths (our transposed BFS), closeness = 1/Σd printed at 3 decimals
    (0.000 for the large-Σd core), nieminen = reach² − Σd with reach
    including the vertex itself (isolated ⇒ 1² − 0 = 1.000, as the file
    shows). Both are HyperBall approximations, so the gate is approximation
    error, as with the harmonic/lin tests.
    """
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from avgdist_rs_spark.operators.bfs import bfs_csr

    base = "/root/reference/data/wikipedia-vote-network"
    if not os.path.exists(f"{base}/wiki.closeness"):
        pytest.skip("reference golden not present")
    law_nodes = [int(x) for x in open(f"{base}/wiki.nodes").read().split()]
    law_clo = np.array(json.loads(open(f"{base}/wiki.closeness").read()))
    law_nie = np.array(json.loads(open(f"{base}/wiki.nieminen").read()))
    edges = spark.read.csv(f"{base}/wiki.csv", schema="src string, dst string")
    g = GraphFrame.from_any_edges(edges)
    orig2dense = {r["orig"]: r["id"] for r in g.nodes.collect()}
    law2our = np.array([orig2dense[str(o)] for o in law_nodes], dtype=np.int64)

    import numpy as np

    cap = bfs_csr(g, np.arange(g.num_nodes, dtype=np.int64), transposed=True, capture=True)
    agg = cap.groupBy("v").agg(F.sum("dist").alias("ds"), F.count("*").alias("rc")).toPandas()
    ds = np.zeros(g.num_nodes)
    rc = np.zeros(g.num_nodes)
    ds[agg["v"].to_numpy()] = agg["ds"].to_numpy()
    rc[agg["v"].to_numpy()] = agg["rc"].to_numpy()
    m = min(len(law_clo), len(law2our))
    my_ds, my_rc = ds[law2our][:m], rc[law2our][:m]

    with np.errstate(divide="ignore"):
        my_clo = np.where(my_ds > 0, 1.0 / my_ds, 0.0)
    nz = law_clo[:m] > 0
    diff = np.abs(my_clo[nz] - law_clo[:m][nz])
    assert (diff > 2e-3).sum() <= 2  # 3dp print + lone truncated-golden artifact
    assert np.median(diff) < 1e-3
    # the golden's zeros are exactly the 3dp-rounding of large-Σd values
    assert (np.round(my_clo[~nz], 3) != 0).sum() == 0

    my_nie = (my_rc + 1.0) ** 2 - my_ds  # reach includes self
    nie = law_nie[:m]
    big = nie > 1.0
    rel = np.abs(my_nie[big] - nie[big]) / nie[big]
    assert rel.mean() < 0.01 and np.quantile(rel, 0.99) < 0.05
    assert np.array_equal(nie == 1.0, my_nie == 1.0)  # isolated vertices exact
    g.unpersist()


def test_distance_sums_and_reach_match_law_goldens(spark):
    """Per-vertex Σdist and reachable-set size vs wiki.sum_of_distances /
    wiki.reachable_nodes / wiki.lin (HyperBall approximations; LAW's reach
    includes the vertex itself, lin = reach²/dist_sum)."""
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from avgdist_rs_spark.operators.bfs import bfs_csr

    base = "/root/reference/data/wikipedia-vote-network"
    if not os.path.exists(f"{base}/wiki.sum_of_distances"):
        pytest.skip("reference golden not present")
    law_nodes = [int(x) for x in open(f"{base}/wiki.nodes").read().split()]
    law_sod = np.array(json.loads(open(f"{base}/wiki.sum_of_distances").read()))
    law_reach = np.array(json.loads(open(f"{base}/wiki.reachable_nodes").read()))
    law_lin = np.array(json.loads(open(f"{base}/wiki.lin").read()))
    edges = spark.read.csv(f"{base}/wiki.csv", schema="src string, dst string")
    g = GraphFrame.from_any_edges(edges)
    orig2dense = {r["orig"]: r["id"] for r in g.nodes.collect()}
    law2our = np.array([orig2dense[str(o)] for o in law_nodes], dtype=np.int64)[: len(law_sod)]

    cap = bfs_csr(g, np.arange(g.num_nodes, dtype=np.int64), transposed=True, capture=True)
    agg = cap.groupBy("v").agg(
        F.sum("dist").alias("ds"), F.count("*").alias("rc")
    ).toPandas()
    ds = np.zeros(g.num_nodes)
    rc = np.zeros(g.num_nodes)
    ds[agg["v"].to_numpy()] = agg["ds"].to_numpy()
    rc[agg["v"].to_numpy()] = agg["rc"].to_numpy()
    my_sod, my_reach = ds[law2our], rc[law2our] + 1  # LAW reach includes self

    def close(mine, law, zero_val):
        nz = law > zero_val
        rel = np.abs(mine[nz] - law[nz]) / law[nz]
        return rel.mean() < 0.01 and (rel > 0.05).sum() <= 2

    assert close(my_sod, law_sod, 0.0)
    assert close(my_reach, law_reach, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        my_lin = np.where(my_sod > 0, my_reach**2 / np.where(my_sod > 0, my_sod, 1), 1.0)
    assert close(my_lin, law_lin, 1.0)
    g.unpersist()
