"""Random-walk corpus + skip-gram pairs: deterministic replay, invariance,
stall semantics, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.functions.hashing import py_hash64
from avgdist_rs_spark.operators.walks import (
    random_walks,
    ranked_adjacency,
    skipgram_pairs,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
    ("d", "e"), ("e", "f"), ("f", "b"), ("c", "f"),
]


def _py_walks(pairs, walk_length, seed="walk", undirected=True, wps=1):
    """Driver-side replay of the exact operator semantics."""
    adj = {}
    es = set()
    for s, d in pairs:
        if s == d:
            continue
        es.add((s, d))
        if undirected:
            es.add((d, s))
    for s, d in sorted(es):
        adj.setdefault(s, []).append(d)
    out = {}
    for v in sorted(adj):
        for rep in range(wps):
            wid = v if wps == 1 else f"{v}#{rep}"
            cur, path = v, [v]
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    continue
                pick = py_hash64(f"{seed}:{wid}:{t}:{cur}") % len(nbrs)
                cur = nbrs[pick]
                path.append(cur)
            out[wid] = path
    return out


def test_walks_match_python_replay(spark):
    w = random_walks(_edges(spark, PAIRS), walk_length=7).collect()
    exp = _py_walks(PAIRS, 7)
    got = {r["walk_id"]: list(r["path"]) for r in w}
    assert got == exp
    assert all(r["steps"] == 7 and r["start"] == r["path"][0] for r in w)


def test_walks_multi_replica_and_seed(spark):
    e = _edges(spark, PAIRS)
    w = random_walks(e, walk_length=5, walks_per_start=3, seed="s2").collect()
    exp = _py_walks(PAIRS, 5, seed="s2", wps=3)
    assert {r["walk_id"]: list(r["path"]) for r in w} == exp
    # replicas genuinely diverge (the hash keys on walk_id)
    by_start = {}
    for r in w:
        by_start.setdefault(r["start"], set()).add(tuple(r["path"]))
    assert any(len(s) > 1 for s in by_start.values())


def test_walks_partition_invariant(spark):
    e = _edges(spark, PAIRS)
    a = sorted(map(tuple, random_walks(e, 6).select("walk_id", "path").collect()))
    b = sorted(
        map(
            tuple,
            random_walks(e.repartition(7), 6).select("walk_id", "path").collect(),
        )
    )
    assert a == b


def test_directed_walk_stalls_at_sink(spark):
    # chain a->b->c: every directed walk is forced, stalls at c
    e = _edges(spark, [("a", "b"), ("b", "c")])
    w = {
        r["walk_id"]: (list(r["path"]), r["steps"])
        for r in random_walks(e, 5, undirected=False).collect()
    }
    assert w["a"] == (["a", "b", "c"], 2)
    assert w["b"] == (["b", "c"], 1)
    assert "c" not in w  # sinks have no adjacency row -> no start


def test_ranked_adjacency_sorted_distinct(spark):
    e = _edges(spark, [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("a", "a")])
    rows = {r["v"]: (list(r["nbrs"]), r["deg"]) for r in ranked_adjacency(e).collect()}
    assert rows == {"a": (["b", "c"], 2), "b": (["a"], 1), "c": (["a"], 1)}


def test_skipgram_pairs_positional(spark):
    walks = spark.createDataFrame(
        [("w1", "a", ["a", "b", "a", "c"], 3)],
        "walk_id string, start string, path array<string>, steps long",
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=1).collect()
    }
    # positions: a b a c ; window 1 -> (a,b),(b,a)x2,(a,b)... enumerate:
    # i=0 a: j=1 b | i=1 b: j=0 a, j=2 a | i=2 a: j=1 b, j=3 c | i=3 c: j=2 a
    assert got == {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1, ("c", "a"): 1}


def test_skipgram_counts_vs_python(spark):
    e = _edges(spark, PAIRS)
    w = random_walks(e, 6)
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(w, window=2).collect()
    }
    exp = {}
    for path in _py_walks(PAIRS, 6).values():
        for i, c in enumerate(path):
            for j in range(max(0, i - 2), min(len(path) - 1, i + 2) + 1):
                if j != i:
                    exp[(c, path[j])] = exp.get((c, path[j]), 0) + 1
    assert got == exp


def test_walk_plan_single_adjacency_build(spark):
    """The composed multi-step plan reuses ONE adjacency build (cache +
    ReusedExchange), rather than re-running the groupBy per step."""
    e = _edges(spark, PAIRS)
    w = random_walks(e, walk_length=4)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3  # steps hit the cached adjacency


# --- node2vec (second-order biased walks) -----------------------------------

from avgdist_rs_spark.operators.walks import node2vec_walks


def _py_node2vec(pairs, walk_length, seed="n2v", wr=1, wc=4, wo=2):
    """Driver-side replay of the exact second-order semantics: integer
    weights (return/common/outward vs prev), inverse-CDF pick by h % total."""
    es = set()
    for s, d in pairs:
        if s != d:
            es.add((s, d))
            es.add((d, s))
    adj = {}
    for s, d in sorted(es):
        adj.setdefault(s, []).append(d)
    out = {}
    for v in sorted(adj):
        prev, cur, path = None, v, [v]
        for t in range(1, walk_length + 1):
            nbrs = adj[cur]
            h = py_hash64(f"{seed}:{v}:{t}:{cur}")
            if t == 1:
                nxt = nbrs[h % len(nbrs)]
            else:
                pn = set(adj[prev])
                wts = [wr if c == prev else (wc if c in pn else wo) for c in nbrs]
                u = h % sum(wts)
                cum = 0
                for c, wt in zip(nbrs, wts):
                    cum += wt
                    if cum > u:
                        nxt = c
                        break
            prev, cur = cur, nxt
            path.append(cur)
        out[v] = path
    return out


def test_node2vec_matches_python_replay(spark):
    w = node2vec_walks(_edges(spark, PAIRS), walk_length=7).collect()
    exp = _py_node2vec(PAIRS, 7)
    assert {r["walk_id"]: list(r["path"]) for r in w} == exp
    assert all(r["steps"] == 7 and r["start"] == r["path"][0] for r in w)


def test_node2vec_weights_change_walks(spark):
    """The weight plumbing is live: extreme return weight forces backtracking
    (path oscillates), and each weighted variant still matches the replay —
    guards the nested-lambda mis-binding that silently mis-picked before the
    weights/draw/pick were split into separate projections."""
    e = _edges(spark, PAIRS)
    heavy = {
        r["walk_id"]: list(r["path"])
        for r in node2vec_walks(e, 6, w_return=10**6, w_common=1, w_out=1).collect()
    }
    assert heavy == _py_node2vec(PAIRS, 6, wr=10**6, wc=1, wo=1)
    # with overwhelming return weight, steps 2+ backtrack: path[t] == path[t-2]
    for path in heavy.values():
        assert all(path[t] == path[t - 2] for t in range(2, len(path)))
    default = {
        r["walk_id"]: list(r["path"]) for r in node2vec_walks(e, 6).collect()
    }
    assert default != heavy


def test_node2vec_partition_invariant(spark):
    e = _edges(spark, PAIRS)
    a = sorted(map(tuple, node2vec_walks(e, 5).select("walk_id", "path").collect()))
    b = sorted(
        map(
            tuple,
            node2vec_walks(e.repartition(7), 5).select("walk_id", "path").collect(),
        )
    )
    assert a == b


def test_node2vec_rejects_bad_params(spark):
    e = _edges(spark, PAIRS)
    with pytest.raises(ValueError):
        node2vec_walks(e, 0)
    with pytest.raises(ValueError):
        node2vec_walks(e, 3, w_return=0)


def test_node2vec_degree_cap_matches_python_replay(spark):
    """max_deg truncates every adjacency to its sorted prefix — the walk is
    still fully deterministic and engine-portable under the cap."""
    # star-ish hub: h connects to many spokes, spokes chain pairwise
    pairs = [("h", f"s{i}") for i in range(12)] + [
        (f"s{i}", f"s{i+1}") for i in range(0, 11, 2)
    ]
    cap = 4

    def replay():
        es = set()
        for s, d in pairs:
            es.add((s, d)); es.add((d, s))
        adj = {}
        for s, d in sorted(es):
            adj.setdefault(s, []).append(d)
        adj = {v: n[:cap] for v, n in adj.items()}
        out = {}
        for v in sorted(adj):
            prev, cur, path = None, v, [v]
            for t in range(1, 6):
                nbrs = adj[cur]
                h = py_hash64(f"n2v:{v}:{t}:{cur}")
                if t == 1:
                    nxt = nbrs[h % len(nbrs)]
                else:
                    pn = set(adj[prev])
                    wts = [1 if c == prev else (4 if c in pn else 2) for c in nbrs]
                    u = h % sum(wts)
                    cum = 0
                    for c, wt in zip(nbrs, wts):
                        cum += wt
                        if cum > u:
                            nxt = c
                            break
                prev, cur = cur, nxt
                path.append(cur)
            out[v] = path
        return out

    got = {
        r["walk_id"]: list(r["path"])
        for r in node2vec_walks(_edges(spark, pairs), 5, max_deg=cap).collect()
    }
    assert got == replay()
    # the cap is live: hub "h" has 12 neighbors, walks only ever use first 4
    full = {
        r["walk_id"]: list(r["path"])
        for r in node2vec_walks(_edges(spark, pairs), 5).collect()
    }
    assert got != full
