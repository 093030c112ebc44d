"""Sampled-mode centrality estimators vs local-Python oracle at equal seeds.

Exact modes are pinned by goldens/oracles elsewhere; these verify the SAMPLED
paths (the production mode at 10^9+ vertices) reproduce the reference
accumulation exactly when the seed sequence is injected via the shared RNG.
"""

import numpy as np
import pytest

from avgdist_rs_spark.operators.avgdist import k_formula, sample_uniform
from avgdist_rs_spark.operators.centrality import harmonic_centrality
from avgdist_rs_spark.sources import fixtures as FX

from . import oracle


def test_sampled_harmonic_matches_python_oracle(spark):
    g = FX.er1k_graph(spark)
    eps, seed = 0.3, 5
    got = {r["v"]: (r["harmonic"], r["coverage"]) for r in
           harmonic_centrality(g, exact=False, eps=eps, seed=seed).collect()}

    # oracle: same RNG consumption → same seeds (duplicates count twice)
    k = k_formula(1000, eps)
    seeds = sample_uniform(1000, k, np.random.default_rng(seed))
    adj, _ = oracle.adjacency(FX.er1k_pairs(), 1000)
    import collections

    h = collections.defaultdict(float)
    cov = collections.defaultdict(int)
    for s in seeds:
        # forward BFS from the seed; accumulate per reached vertex
        dia, ds, c, seen = oracle.bfs(adj, 1000, int(s))
        from collections import deque

        dist = {int(s): 0}
        q = deque([int(s)])
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, d in dist.items():
            if d > 0:
                h[v] += 1.0 / (1.0 + d)
                cov[v] += 1
    assert set(got) == set(h)
    for v in h:
        assert got[v][0] == pytest.approx(h[v] / k, abs=1e-12)
        assert got[v][1] == cov[v]
    g.unpersist()
