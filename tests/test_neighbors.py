"""k-hop neighborhood sampling semantics (GraphSAGE-style fan-out)."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.neighbors import khop_sample


def py_hash64(s: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
    (1, 6), (1, 7), (2, 6), (2, 8), (3, 9),
    (6, 0), (7, 8), (8, 9), (9, 9),  # 9→9 self-loop must be dropped
    (4, 1), (5, 2),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src long, dst long").cache()


def _py_khop(edge_list, seeds, fanouts, salt="khop:"):
    adj = {}
    for s, d in set(edge_list):
        if s != d:
            adj.setdefault(s, set()).add(d)
    rows = set()
    frontier = {s: {s} for s in seeds}
    for hop, fan in enumerate(fanouts, start=1):
        nxt = {s: set() for s in seeds}
        for s in seeds:
            for p in sorted(frontier[s]):
                cands = sorted(
                    adj.get(p, ()),
                    key=lambda c: (py_hash64(f"{s}:{hop}:{p}:{c}", salt), c),
                )[: int(fan)]
                for c in cands:
                    rows.add((s, hop, p, c))
                    nxt[s].add(c)
        frontier = nxt
    return rows


def test_khop_matches_python_replay(edges):
    import pyspark.sql.types as T

    spark = edges.sparkSession
    seeds = spark.createDataFrame([(0,), (3,)], "seed long")
    got = {
        (r["seed"], r["hop"], r["parent"], r["child"])
        for r in khop_sample(edges, seeds, fanouts=(3, 2)).collect()
    }
    want = _py_khop(EDGES, [0, 3], (3, 2))
    assert got == want
    # fan-out bound holds per (seed, hop, parent)
    from collections import Counter

    cnt = Counter((s, h, p) for s, h, p, _ in got)
    assert all(v <= (3 if h == 1 else 2) for (_, h, _), v in cnt.items())


def test_khop_matches_duckdb_replay(edges):
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(0,), (2,)], "seed long")
    got = sorted(
        tuple(r) for r in khop_sample(edges, seeds, fanouts=(2, 2)).collect()
    )
    el = ", ".join(f"({s}, {d})" for s, d in EDGES)
    h = (
        "(('0x' || substr(md5('khop:' || seed || ':' || {hop} || ':' || parent "
        "|| ':' || child), 1, 15))::BIGINT)"
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH e AS (SELECT DISTINCT * FROM (VALUES {el}) t(src, dst)
                       WHERE src != dst),
            seeds(seed) AS (VALUES (0), (2)),
            h1 AS (
              SELECT seed, 1 AS hop, seed AS parent, dst AS child,
                     row_number() OVER (PARTITION BY seed, seed
                       ORDER BY {h.format(hop=1)}, child) AS rn
              FROM seeds JOIN e ON e.src = seeds.seed
            ),
            p1 AS (SELECT seed, hop, parent, child FROM h1 WHERE rn <= 2),
            f1 AS (SELECT DISTINCT seed, child AS v FROM p1),
            h2 AS (
              SELECT seed, 2 AS hop, v AS parent, dst AS child,
                     row_number() OVER (PARTITION BY seed, v
                       ORDER BY {h.format(hop=2)}, child) AS rn
              FROM f1 JOIN e ON e.src = f1.v
            ),
            p2 AS (SELECT seed, hop, parent, child FROM h2 WHERE rn <= 2)
            SELECT seed::BIGINT, hop, parent::BIGINT, child::BIGINT FROM p1
            UNION ALL
            SELECT seed::BIGINT, hop, parent::BIGINT, child::BIGINT FROM p2
            """
        ).fetchall()
    )
    assert got == want


def test_khop_parallelism_invariant(edges):
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "seed long")
    a = sorted(tuple(r) for r in khop_sample(edges, seeds, (3, 2)).collect())
    b = sorted(
        tuple(r)
        for r in khop_sample(edges.repartition(7), seeds.repartition(3), (3, 2)).collect()
    )
    assert a == b


def test_khop_sink_stops_and_fanout_validates(edges):
    spark = edges.sparkSession
    # vertex 9's only edge is the dropped self-loop: expansion stops there
    seeds = spark.createDataFrame([(9,)], "seed long")
    assert khop_sample(edges, seeds, (4, 4)).count() == 0
    with pytest.raises(ValueError):
        khop_sample(edges, seeds, ())
