"""Structured Streaming path: windowed rollups + stateful sessionization
match their batch equivalents exactly."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.sessions import sessionize
from avgdist_rs_spark.streaming.events_stream import (
    run_available_now,
    sessionize_stream,
    stream_events,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Two parquet files written in time order → two micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mid = ev.approxQuantile("event_id", [0.5], 0)[0]
    early = ev.where(F.col("ts") < "2024-01-05")
    late = ev.where(F.col("ts") >= "2024-01-05")
    early.coalesce(1).write.parquet(os.path.join(d, "batch=0"))
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    late.coalesce(1).write.parquet(os.path.join(d, "batch=1"))
    return d


def test_windowed_counts_match_batch(spark, stream_dir):
    s = stream_events(spark, f"{stream_dir}/batch=*")
    run_available_now(windowed_event_counts(s), "win_counts", "complete")
    got = spark.table("win_counts").toPandas()
    ev = spark.read.parquet(f"{stream_dir}/batch=*")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
        .toPandas()
    )
    k = ["window_start", "event_type"]
    g = got.sort_values(k).reset_index(drop=True)
    w = want.sort_values(k).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)


def test_stateful_sessionize_matches_batch(spark, stream_dir):
    s = stream_events(spark, f"{stream_dir}/batch=*", max_files_per_trigger=1)
    run_available_now(sessionize_stream(s), "stream_sessions", "append")
    got = (
        spark.table("stream_sessions")
        .toPandas()
        .set_index("event_id")
        .sort_index()[["user_id", "session_idx", "turn_idx"]]
    )
    ev = spark.read.parquet(f"{stream_dir}/batch=*")
    want = (
        sessionize(ev)
        .select("event_id", "user_id", "session_idx", "turn_idx")
        .toPandas()
        .set_index("event_id")
        .sort_index()[["user_id", "session_idx", "turn_idx"]]
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stateful_sessionize_drops_late_events(spark, tmp_path):
    """An event older than the user's state (out-of-order ACROSS micro-batches)
    is dropped, not silently folded into the current session with a negative
    gap — the documented ordering contract."""
    import datetime as dt

    d = str(tmp_path / "late_src")
    os.makedirs(d, exist_ok=True)

    def mk(rows, sub):
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [dt.datetime(2024, 1, 1, 0, 0, r[1]) for r in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(os.path.join(d, sub))

    mk([(10, 40), (11, 50)], "batch=0")  # state advances to t=50
    time.sleep(1.1)
    mk([(12, 20), (13, 55)], "batch=1")  # event 12 is LATE (t=20 < 50)

    s = stream_events(spark, f"{d}/batch=*", max_files_per_trigger=1)
    run_available_now(sessionize_stream(s), "late_sessions", "append")
    got = spark.table("late_sessions").toPandas().set_index("event_id").sort_index()
    assert list(got.index) == [10, 11, 13]  # 12 dropped
    assert list(got["turn_idx"]) == [0, 1, 2]  # 13 continues the session


def test_stateful_state_survives_query_restart(spark, tmp_path):
    """Restart from checkpointLocation: the second run processes ONLY the new
    micro-batch, with per-user session state carried over — its output equals
    the batch sessionization of the full data restricted to the new events."""
    ck = str(tmp_path / "ck_sessions")
    src = str(tmp_path / "src")  # the source path is part of the checkpoint
    os.makedirs(src, exist_ok=True)
    ev_all = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    early = ev_all.where(F.col("ts") < "2024-01-05")
    late = ev_all.where(F.col("ts") >= "2024-01-05")

    out = str(tmp_path / "out")  # durable sink: memory sink can't recover

    def run():
        q = (
            sessionize_stream(stream_events(spark, src))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).toPandas()

    # phase 1: only the early file exists; drain and stop (the "crash")
    early.coalesce(1).write.mode("append").parquet(src)
    p1 = run()
    # phase 2: new data lands, restart from the SAME checkpoint + source path
    late.coalesce(1).write.mode("append").parquet(src)
    cumulative = run()
    p2 = cumulative[~cumulative.event_id.isin(set(p1.event_id))]

    ev = spark.read.parquet(src)
    want = sessionize(ev).select("event_id", "user_id", "session_idx", "turn_idx").toPandas()
    batch1_ids = set(late.select("event_id").toPandas()["event_id"])
    got = p2.set_index("event_id").sort_index()
    want1 = (
        want[want.event_id.isin(batch1_ids)].set_index("event_id").sort_index()
    )
    assert len(p1) + len(p2) == len(want)
    pd.testing.assert_frame_equal(
        got[["user_id", "session_idx", "turn_idx"]],
        want1[["user_id", "session_idx", "turn_idx"]],
        check_dtype=False,
    )
