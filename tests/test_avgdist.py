"""Exact-mode golden tests (reference golden outputs) + impl parity + sampler oracle."""

from __future__ import annotations

import numpy as np
import pytest

from avgdist_rs_spark.operators import avgdist as A
from avgdist_rs_spark.operators.bfs import bfs_csr, bfs_frontier, per_seed_stats
from avgdist_rs_spark.sources import fixtures as FX

from . import oracle


def test_star_exact_golden(spark):
    # data/star/result/star-uni-exact.out: average distance 1.333333, diameter 2
    g = FX.star_graph(spark, n=1000)
    r = A.exact_avgdist(g, impl="csr")
    assert r["avg_distance"] == pytest.approx(4000 / 3000, abs=1e-6)
    assert round(r["avg_distance"], 6) == 1.333333
    assert r["diameter"] == 2
    g.unpersist()


def test_cycle3_exact(spark):
    g = FX.cycle3_graph(spark)
    assert g.num_nodes == 3 and g.num_edges == 3
    r = A.exact_avgdist(g, impl="csr")
    assert r["avg_distance"] == pytest.approx(1.5, abs=1e-9)
    assert r["diameter"] == 2
    g.unpersist()


def test_path_exact_closed_form(spark):
    n = 9
    g = FX.path_graph(spark, n=n)
    r = A.exact_avgdist(g, impl="csr")
    S = sum((n - 1 - i) * (n - i) // 2 for i in range(n))
    C = sum(n - 1 - i for i in range(n))
    assert r["avg_distance"] == pytest.approx(S / C, abs=1e-12)
    assert r["diameter"] == n - 1
    g.unpersist()


def test_er1k_exact_golden(spark):
    # data/erdos-renyi/result/1k-0001p-uni-exact.out: 3.706478 / diameter 13
    g = FX.er1k_graph(spark)
    assert g.num_nodes == 1000 and g.num_edges == 950
    r = A.exact_avgdist(g, impl="csr")
    assert round(r["avg_distance"], 6) == 3.706478
    assert r["diameter"] == 13
    g.unpersist()


def test_frontier_vs_csr_parity(spark):
    """The distributed-frontier superstep loop and the broadcast-CSR kernel are
    the same operator: identical per-seed stats on the ER graph."""
    g = FX.er1k_graph(spark)
    seeds = np.array([0, 5, 17, 285, 999], dtype=np.int64)
    a = {
        r["seed"]: (r["dia"], r["dist_sum"], r["reached"])
        for r in bfs_csr(g, seeds).collect()
    }
    import pandas as pd

    seeds_df = spark.createDataFrame(pd.DataFrame({"seed": seeds}), "seed long")
    vis = bfs_frontier(g, seeds_df)
    b = {
        r["seed"]: (r["dia"], r["dist_sum"], r["reached"])
        for r in per_seed_stats(vis).collect()
    }
    for s in seeds:
        assert a[int(s)] == b.get(int(s), (0, 0, 0)), f"seed {s}: {a[int(s)]} vs {b.get(int(s))}"
    g.unpersist()


def test_exact_frontier_small(spark):
    g = FX.star_graph(spark, n=10)
    r = A.exact_avgdist(g, impl="frontier")
    assert r["avg_distance"] == pytest.approx(40 / 30, abs=1e-9)
    assert r["diameter"] == 2
    g.unpersist()


def test_unipairs_sampled_matches_oracle(spark):
    """Seeded pair-rejection estimator == local-Python oracle at equal samples."""
    g = FX.er1k_graph(spark)
    pairs = FX.er1k_pairs()
    k = 25
    rng = np.random.default_rng(7)
    acc = A.sample_pair_rejection(g, k, rng, impl="csr")
    # oracle: same rng consumption → same accepted pairs
    rng2 = np.random.default_rng(7)
    import math

    adj, _ = oracle.adjacency(pairs, 1000)
    accepted = []
    rnd = 0
    while len(accepted) < k:
        need = k - len(accepted)
        batch = min(max(int(math.ceil(need * 4.0)) << (2 * rnd), 16), 2_000_000)
        rnd += 1
        v = rng2.integers(0, 1000, size=batch, dtype=np.int64)
        w = rng2.integers(0, 1000, size=batch, dtype=np.int64)
        ok = v != w
        for vv, ww in zip(v[ok], w[ok]):
            dia, s, c, seen = oracle.bfs(adj, 1000, int(vv))
            if int(ww) in seen and int(ww) != int(vv):
                accepted.append((int(vv), dia, s, c))
    accepted = accepted[:k]
    got = list(zip(acc["v"], acc["dia"], acc["dist_sum"], acc["reached"]))
    want = [(v, d, s, c) for (v, d, s, c) in accepted]
    assert [tuple(map(int, t)) for t in got] == want
    g.unpersist()


def test_coverage_weighted_sampler_matches_oracle(spark):
    g = FX.er1k_graph(spark)
    pairs = FX.er1k_pairs()
    pairs_t = pairs[:, ::-1]
    k = 12
    got = A.sample_coverage_weighted(g, k, np.random.default_rng(3), impl="csr")
    _, _, want = oracle.coverage_weighted_sample(pairs_t, 1000, k, np.random.default_rng(3))
    assert got.tolist() == want.tolist()
    g.unpersist()


def test_main_estimator_exact_norm(spark):
    """main binary exact mode: norm == unipairs exact S/C (star golden 1.333)."""
    g = FX.star_graph(spark, n=100)  # |V|=201
    run = A.avgdist_main(g, slot=10, eps=0.1, truth=True, impl="csr")
    f = run.final
    # exact: one batch, norm = S/C
    assert f["norm"] == pytest.approx(4 / 3, abs=1e-6)
    assert f["diameter_max"] == 2
    g.unpersist()


def test_main_estimator_dummy_sampled(spark):
    g = FX.er1k_graph(spark)
    run = A.avgdist_main(g, slot=20, eps=0.3, dummy=True, seed=11, impl="csr")
    f = run.final
    # seeded oracle replay
    k = A.k_formula(1000, 0.3)
    rng = np.random.default_rng(11)
    pairs = FX.er1k_pairs()
    means = []
    remaining = k
    while remaining > 0:
        cur = min(20, remaining)
        seeds = rng.integers(0, 1000, size=cur, dtype=np.int64)
        st = oracle.seed_stats(pairs, 1000, seeds)
        S = sum(s for _, s, _ in st)
        C = sum(c for _, _, c in st)
        if C > 0:
            means.append(S / (C * 999))
        remaining -= cur
    want = sum(means) / len(means)
    assert f["mean"] == pytest.approx(want, abs=1e-12)
    g.unpersist()


def test_msbfs_equals_per_seed_kernel(spark):
    """Bit-parallel MS-BFS must agree exactly with the per-seed kernel."""
    import numpy as np

    from avgdist_rs_spark.operators import bfs as B
    from avgdist_rs_spark.sources.fixtures import barabasi_graph

    g = barabasi_graph(spark, n=300, m=3, seed=11)
    rng = np.random.default_rng(5)
    seeds = rng.integers(0, g.num_nodes, size=150)  # includes duplicates
    a = B.bfs_csr(g, seeds, ms=False).toPandas().sort_values("seed").reset_index(drop=True)
    b = B.bfs_csr(g, seeds, ms=True).toPandas().sort_values("seed").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.groupby("seed").sum().sort_index(), b.groupby("seed").sum().sort_index()
    )


def test_duplicate_seeds_count_with_multiplicity_on_both_impls(spark):
    """A seed drawn twice contributes twice (reference: one BFS per draw) —
    and the CSR and frontier strategies must agree on it."""
    g = FX.barabasi_graph(spark, n=120, m=2, seed=3)
    dup = np.array([5, 5, 9, 5, 9, 40], dtype=np.int64)
    a = A._seed_stats(g, dup, impl="csr").toPandas()
    b = A._seed_stats(g, dup, impl="frontier").toPandas()
    assert len(a) == len(dup) and len(b) == len(dup)
    key = ["seed", "dia", "dist_sum", "reached"]
    pd_a = a[key].sort_values(key).reset_index(drop=True)
    pd_b = b[key].sort_values(key).reset_index(drop=True)
    assert pd_a.equals(pd_b)
    assert (pd_a["seed"] == 5).sum() == 3 and (pd_a["seed"] == 9).sum() == 2
    g.unpersist()


def test_harmonic_weighted_duplicates(spark):
    """harmonic with a duplicated seed == accumulating that seed's BFS twice."""
    from avgdist_rs_spark.operators.centrality import _capture

    g = FX.cycle3_graph(spark)
    cap = _capture(g, np.array([0, 0, 1], dtype=np.int64), transposed=False, impl="csr")
    rows = cap.toPandas()
    # seed 0 appears once per reached vertex with w=2; seed 1 with w=1
    assert set(rows[rows.seed == 0]["w"]) == {2}
    assert set(rows[rows.seed == 1]["w"]) == {1}
    g.unpersist()


def test_early_stop_saves_bfs_and_matches_prefix(spark):
    """stop_eps ends the batch loop once running std < stop_eps·mean: the
    stopped run's iterations are a bit-identical PREFIX of the full run's
    (early stop changes how many batches exist, never their numbers), and
    strictly fewer seeds are BFS'd (the chunked fused path skips the rest)."""
    g = FX.er1k_graph(spark)
    full = A.avgdist_main(g, slot=10, eps=0.2, dummy=True, seed=7, impl="csr")
    stopped = A.avgdist_main(
        g, slot=10, eps=0.2, dummy=True, seed=7, impl="csr",
        stop_eps=0.2, min_batches=4, fuse_batches=4,
    )
    assert stopped.stopped_early
    nb = len(stopped.iterations)
    assert nb < len(full.iterations)
    assert stopped.iterations == full.iterations[:nb]
    assert stopped.seeds_bfsed < full.seeds_bfsed
    # convergence criterion actually held at the stop point (std error of mean)
    last = stopped.final
    assert last["std"] / np.sqrt(nb) < 0.2 * abs(last["mean"])
    # and the early estimate is a usable approximation of the full-k one
    assert last["norm"] == pytest.approx(full.final["norm"], rel=0.25)
    g.unpersist()


def test_early_stop_zero_eps_never_fires(spark):
    """stop_eps=0 can never satisfy the strict inequality: the run must be
    identical (iteration for iteration) to a no-early-stop run."""
    g = FX.star_graph(spark, n=60)
    run = A.avgdist_main(
        g, slot=10, eps=0.3, dummy=True, seed=3, impl="csr", stop_eps=0.0
    )
    assert not run.stopped_early  # ran the full Hoeffding k
    base = A.avgdist_main(g, slot=10, eps=0.3, dummy=True, seed=3, impl="csr")
    assert run.iterations == base.iterations
    g.unpersist()
