"""Semantics of the corpus rollup and the stratified training-mix sampler."""

from pyspark.sql import functions as F


def test_corpus_stats_semantics(spark):
    from avgdist_rs_spark.operators.pipeline import corpus_stats

    en = "the cat and the dog ran to the park and sat on it for fun"
    de = "der hund und die katze sind in den garten mit von zu ist da"
    docs = spark.createDataFrame(
        [(0, en), (1, en + " again today"), (2, de)],
        "doc_id long, text string",
    )
    got = {r["lang_pred"]: r for r in corpus_stats(docs).collect()}
    assert set(got) == {"en", "de"}
    assert got["en"]["n_docs"] == 2 and got["de"]["n_docs"] == 1
    # exact interpolated median of [15, 17] = 16
    assert got["en"]["median_tokens"] == 16.0
    assert got["en"]["total_tokens"] == 32 and got["de"]["total_tokens"] == 14


def test_stratified_sample_fractions(spark):
    from avgdist_rs_spark.operators.pipeline import stratified_sample
    from avgdist_rs_spark.operators.textstats import lang_id

    en = "the cat and the dog ran to the park and sat on it for fun doc "
    docs = spark.createDataFrame(
        [(i, en + str(i)) for i in range(400)], "doc_id long, text string"
    )
    # frac=1 keeps everything, frac=0 would keep nothing; 0.5 lands near half
    full = stratified_sample(docs, {"en": 1.0}).count()
    assert full == 400
    half = stratified_sample(docs, {"en": 0.5}).count()
    assert 140 <= half <= 260
    # deterministic: same call, same sample
    a = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}).collect()}
    assert a == b and len(a) == half
    # absent strata are dropped entirely
    assert stratified_sample(docs, {"de": 1.0}).count() == 0
    # the kept set is a subset of the full stratum with the predicted language
    langs = {r["id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert all(langs[i] == "en" for i in a)


def test_clustering_and_summary_vs_networkx(spark):
    import pytest
    nx = pytest.importorskip("networkx")
    import pandas as pd
    from avgdist_rs_spark.operators.degrees import graph_summary
    from avgdist_rs_spark.operators.triangles import clustering_coefficients
    from avgdist_rs_spark.plans.graph import GraphFrame

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 2), (5, 0), (1, 5)]
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    g = GraphFrame.from_edges(spark.createDataFrame(pdf), num_nodes=7)
    G = nx.Graph(pairs)
    G.add_nodes_from(range(7))
    lcc = nx.clustering(G)
    got = {r["v"]: r for r in clustering_coefficients(g).collect()}
    for v in range(7):
        assert got[v]["lcc"] == pytest.approx(lcc[v], abs=1e-6), f"v={v}"
        assert got[v]["deg"] == G.degree(v)
    s = graph_summary(g).collect()[0]
    assert s["num_nodes"] == 7 and s["num_edges"] == 8
    assert s["triangles"] == sum(nx.triangles(G).values()) // 3
    assert s["transitivity"] == pytest.approx(nx.transitivity(G), abs=1e-6)
    assert s["assortativity"] == pytest.approx(
        nx.degree_assortativity_coefficient(G), abs=1e-6
    )
    g.unpersist()


def test_scc_vs_networkx(spark):
    import pytest
    nx = pytest.importorskip("networkx")
    import pandas as pd
    from avgdist_rs_spark.operators.scc import strongly_connected_components
    from avgdist_rs_spark.plans.graph import GraphFrame

    # two directed cycles bridged one-way, a chain in, a chain out, a
    # self-loop, and isolated vertices
    pairs = [
        (0, 1), (1, 2), (2, 0),          # 3-cycle
        (2, 3), (3, 4), (4, 5), (5, 3),  # bridge into a second 3-cycle
        (6, 0),                          # chain into the first cycle
        (5, 7), (7, 8),                  # chain out
        (9, 9),                          # self-loop
    ]
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    g = GraphFrame.from_edges(spark.createDataFrame(pdf), num_nodes=12, dedup=False)
    got = {r["v"]: r["component"] for r in strongly_connected_components(g).collect()}
    G = nx.DiGraph(pairs)
    G.add_nodes_from(range(12))
    assert set(got) == set(range(12))
    for comp in nx.strongly_connected_components(G):
        label = min(comp)
        for v in comp:
            assert got[v] == label, f"v={v}"
    g.unpersist()


def test_scc_large_cycle_and_dag(spark):
    """A 64-vertex directed cycle (one giant SCC exercising the coloring +
    backward sweep — O(cycle length) supersteps, so kept small) plus a DAG
    tail (trim path)."""
    from pyspark.sql import functions as F
    from avgdist_rs_spark.operators.scc import strongly_connected_components
    from avgdist_rs_spark.plans.graph import GraphFrame

    n = 64
    cyc = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    tail = spark.range(n, n + 20).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    g = GraphFrame.from_edges(cyc.unionAll(tail), num_nodes=n + 21, dedup=False)
    got = {r["v"]: r["component"] for r in strongly_connected_components(g).collect()}
    assert all(got[v] == 0 for v in range(n))
    assert all(got[v] == v for v in range(n, n + 21))
    g.unpersist()


def test_link_prediction_vs_networkx(spark):
    import pytest
    nx = pytest.importorskip("networkx")
    import pandas as pd
    from avgdist_rs_spark.operators.degrees import link_prediction_scores
    from avgdist_rs_spark.plans.graph import GraphFrame

    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (0, 5), (4, 5), (2, 6)]
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    g = GraphFrame.from_edges(spark.createDataFrame(pdf), num_nodes=7)
    G = nx.Graph(pairs)
    got = {
        (r["a"], r["b"]): (r["common"], r["adamic_adar"])
        for r in link_prediction_scores(g, min_common=1).collect()
    }
    want_aa = {(min(u, v), max(u, v)): s for u, v, s in nx.adamic_adar_index(G)}
    want_cn = {
        p: len(list(nx.common_neighbors(G, *p))) for p in want_aa
    }
    expected = {p for p in want_aa if want_cn[p] >= 1}
    assert set(got) == expected
    for p in expected:
        assert got[p][0] == want_cn[p]
        assert got[p][1] == pytest.approx(want_aa[p], abs=1e-6)
    g.unpersist()


def test_betweenness_vs_networkx(spark):
    import pytest
    nx = pytest.importorskip("networkx")
    import pandas as pd
    from avgdist_rs_spark.operators.betweenness import betweenness
    from avgdist_rs_spark.plans.graph import GraphFrame

    # directed: chains, a diamond (sigma > 1), a cycle, a hub
    pairs = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5), (5, 6), (6, 3),
             (1, 7), (7, 8), (2, 8), (8, 9)]
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    g = GraphFrame.from_edges(spark.createDataFrame(pdf), num_nodes=10)
    G = nx.DiGraph(pairs)
    G.add_nodes_from(range(10))
    want = nx.betweenness_centrality(G, normalized=False)
    got = {r["v"]: r["bc"] for r in betweenness(g).collect()}
    for v in range(10):
        assert got[v] == pytest.approx(want[v], abs=1e-6), f"v={v}"
    # sampled with ALL vertices as explicit seeds == exact (scale = 1)
    import numpy as np
    got_s = {r["v"]: r["bc"] for r in betweenness(g, seeds=np.arange(10)).collect()}
    assert got_s == got
    g.unpersist()
