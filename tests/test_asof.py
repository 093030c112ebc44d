"""As-of join semantics: inclusive point-in-time enrichment per key."""

import duckdb
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"

# (event_id, ts_s, user_id, value) — hand-built corner cases
LEFT = [
    (10, 100, 1, 1.0),   # right at exactly 100 must match (inclusive)
    (11, 150, 1, 2.0),
    (12, 90, 1, 3.0),    # before any right row → NULL
    (13, 500, 2, 4.0),   # right only for user 1 → NULL
    (14, 205, 1, 5.0),   # two rights at ts=200: larger event_id wins
]
RIGHT = [
    (20, 100, 1, 10.0),
    (21, 120, 1, 11.0),
    (22, 200, 1, 12.0),
    (23, 200, 1, 13.0),
]


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(
        [(i, float(t), u, v) for i, t, u, v in rows],
        "event_id long, ts_s double, user_id long, value double",
    ).select(
        "event_id",
        F.timestamp_seconds("ts_s").alias("ts"),
        "user_id",
        "value",
    )
    return mk(LEFT).cache(), mk(RIGHT).cache()


def test_asof_corner_cases(frames):
    left, right = frames
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"], r["lag_s"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[10] == (20, 10.0, 0)     # inclusive at equal ts
    assert got[11] == (21, 11.0, 30)
    assert got[12] == (None, None, None)
    assert got[13] == (None, None, None)
    assert got[14] == (23, 13.0, 5)     # tie at ts=200 → larger event_id
    assert len(got) == len(LEFT)        # every left row survives


def test_asof_tolerance(frames):
    left, right = frames
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(left, right, on="user_id", tolerance=10).collect()
    }
    assert got[10] == 20    # lag 0 ≤ 10
    assert got[14] == 23    # lag 5 ≤ 10
    assert got[11] is None  # lag 30 > 10 → nulled, row kept


def test_asof_matches_duckdb_lateral(spark):
    """Full-table check on real data with an algorithmically different
    oracle: LEFT JOIN LATERAL (ORDER BY ts DESC, event_id DESC LIMIT 1)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "click")
    got = sorted(
        (r["event_id"], r["asof_event_id"], r["asof_value"], r["lag_s"])
        for r in asof_join(left, right, on="user_id").collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH e AS (SELECT * FROM '{SF}/events.parquet')
            SELECT p.event_id, c.event_id, c.value,
                   CASE WHEN c.event_id IS NULL THEN NULL
                        ELSE floor(epoch(p.ts))::BIGINT - floor(epoch(c.ts))::BIGINT
                   END AS lag_s
            FROM e p
            LEFT JOIN LATERAL (
              SELECT event_id, value, ts FROM e c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts <= p.ts
              ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
            ) c ON true
            WHERE p.event_type = 'purchase'
            """
        ).fetchall()
    )
    assert got == want
    assert any(a is not None for _, a, _, _ in got)


def test_asof_parallelism_invariant(frames):
    left, right = frames
    a = sorted(map(tuple, asof_join(left, right, on="user_id").collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(5), right.repartition(3), on="user_id"
            ).collect(),
        )
    )
    assert a == b
