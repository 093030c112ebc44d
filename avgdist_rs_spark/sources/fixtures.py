"""Deterministic graph fixtures mirroring the reference's test corpus (FIXTURES.md).

- ``star_graph``: reference ``data/star/generate.py:4-14`` — center 0 → i for
  i in 1..n, and i → n+i (spokes to leaves). n=1000 ⇒ |V|=2001, exact avg
  distance 1.333333, diameter 2.
- ``cycle3_graph``: reference ``data/labeled/Makefile:3`` — a→b→c→a with string
  ids (exercises id densification). Exact avg 1.5, diameter 2.
- ``path_graph``: 0→1→…→n-1, analytic closed forms (catches off-by-one levels).
- ``er1k_graph``: the reference's checked-in Erdős–Rényi edge list
  (``data/erdos-renyi/1k-0.001p.csv``, 950 edges, public data), declared
  n=1000 — exact avg 3.706478, diameter 13.
- ``barabasi_graph``: seeded preferential-attachment graph for hub-skew tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from ..plans.graph import GraphFrame

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures")


def _from_pairs(spark: SparkSession, pairs: list[tuple[int, int]] | np.ndarray,
                num_nodes: int | None = None) -> GraphFrame:
    pdf = pd.DataFrame(np.asarray(pairs, dtype=np.int64), columns=["src", "dst"])
    return GraphFrame.from_edges(
        spark.createDataFrame(pdf, schema="src long, dst long"), num_nodes=num_nodes
    )


def star_graph(spark: SparkSession, n: int = 1000) -> GraphFrame:
    edges = [(0, i) for i in range(1, n + 1)] + [(i, n + i) for i in range(1, n + 1)]
    return _from_pairs(spark, edges, num_nodes=2 * n + 1)


def cycle3_graph(spark: SparkSession) -> GraphFrame:
    pdf = pd.DataFrame({"src": ["a", "b", "c"], "dst": ["b", "c", "a"]})
    return GraphFrame.from_any_edges(spark.createDataFrame(pdf))


def path_graph(spark: SparkSession, n: int = 8) -> GraphFrame:
    return _from_pairs(spark, [(i, i + 1) for i in range(n - 1)], num_nodes=n)


def er1k_pairs() -> np.ndarray:
    path = os.path.join(FIXTURE_DIR, "er1k.csv")
    return np.loadtxt(path, delimiter=",", dtype=np.int64)


def er1k_graph(spark: SparkSession) -> GraphFrame:
    return _from_pairs(spark, er1k_pairs(), num_nodes=1000)


def barabasi_pairs(n: int = 300, m: int = 3, seed: int = 42) -> np.ndarray:
    """Seeded preferential attachment (our own generator — the reference's
    ``data/barabasi/generate.py`` is unseeded, FIXTURES.md §2.5). Directed
    new-node → target edges; heavy-tailed in-degree (hub-skew tests)."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    edges: list[tuple[int, int]] = []
    for v in range(m, n):
        chosen = set()
        while len(chosen) < m:
            chosen.add(int(repeated[rng.integers(0, len(repeated))]))
        for t in chosen:
            edges.append((v, t))
            repeated.append(t)
        repeated.extend([v] * m)
    return np.asarray(edges, dtype=np.int64)


def barabasi_graph(spark: SparkSession, n: int = 300, m: int = 3, seed: int = 42) -> GraphFrame:
    return _from_pairs(spark, barabasi_pairs(n, m, seed), num_nodes=n)
