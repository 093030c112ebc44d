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


def test_stateful_sessionize_across_three_plus_triggers(spark, tmp_path):
    """The hard part of applyInPandasWithState is state RESUMPTION across
    triggers, which a single availableNow drain of one file never exercises.
    Slice the same fixture into 4 time-ordered files with
    maxFilesPerTrigger=1 (≥4 micro-batches, asserted from query progress) and
    require (a) the streamed output to equal the batch gap rule on the full
    data, and (b) at least one session to SPAN a file boundary — i.e. its
    turn numbering continues from state built in an earlier trigger."""
    d = str(tmp_path / "quarters")
    os.makedirs(d, exist_ok=True)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # Cuts must land INSIDE sessions or no state ever carries across a
    # trigger (measured: sessions in this fixture are short bursts — every
    # time-quartile cut fell between sessions). Take three well-separated
    # multi-event sessions and cut between their 1st and 2nd events.
    sess = (
        sessionize(ev)
        .select("user_id", "session_idx", F.unix_timestamp("ts").alias("tsu"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n"),
            F.min("tsu").alias("t0"),
            F.get(F.sort_array(F.collect_list("tsu")), 1).alias("t1"),
        )
        .where((F.col("n") >= 2) & (F.col("t1") > F.col("t0")))
        .orderBy("t0")
        .toPandas()
    )
    assert len(sess) >= 3
    picks = sess.iloc[[len(sess) // 4, len(sess) // 2, (3 * len(sess)) // 4]]
    qs = sorted(picks["t1"].tolist())
    assert len(set(qs)) == 3
    cuts = [None, *qs, None]
    tsu = F.unix_timestamp("ts")
    for i in range(4):
        part = ev
        if cuts[i] is not None:
            part = part.where(tsu >= cuts[i])
        if cuts[i + 1] is not None:
            part = part.where(tsu < cuts[i + 1])
        part.coalesce(1).write.parquet(os.path.join(d, f"batch={i}"))
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    s = stream_events(spark, f"{d}/batch=*", max_files_per_trigger=1)
    q = (
        sessionize_stream(s)
        .writeStream.format("memory")
        .queryName("multi_trigger_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    assert n_batches >= 4, f"expected >=4 data micro-batches, got {n_batches}"

    got = (
        spark.table("multi_trigger_sessions")
        .toPandas()
        .set_index("event_id")
        .sort_index()[["user_id", "session_idx", "turn_idx"]]
    )
    want = (
        sessionize(spark.read.parquet(f"{d}/batch=*"))
        .select("event_id", "user_id", "session_idx", "turn_idx")
        .toPandas()
        .set_index("event_id")
        .sort_index()[["user_id", "session_idx", "turn_idx"]]
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # state actually carried across a trigger: some session has events on
    # both sides of the first quartile cut (turn_idx continues, same
    # session_idx) — otherwise this test would pass with state wiped per
    # trigger as long as sessions happened to align with file boundaries
    first_cut = qs[0]
    ev_pd = (
        ev.select("event_id", F.unix_timestamp("ts").alias("ts"))
        .toPandas()
        .set_index("event_id")
    )
    joined = got.join(ev_pd)
    spanning = (
        joined.groupby(["user_id", "session_idx"])["ts"]
        .agg(["min", "max"])
        .query("min < @first_cut and max >= @first_cut")
    )
    assert len(spanning) > 0, "no session spans the first file boundary"


# --- streaming exact dedup (built-in streaming aggregation state) -----------


def test_streaming_dedup_matches_batch_across_triggers(spark, tmp_path):
    """Duplicate content split ACROSS micro-batches must merge in the running
    aggregation state: a full availableNow drain equals batch exact_dedup."""
    from avgdist_rs_spark.operators.dedup import exact_dedup
    from avgdist_rs_spark.streaming.docs_stream import dedup_stream, stream_docs

    slices = [
        [(0, "alpha beta gamma"), (1, "unique one"), (2, "delta epsilon")],
        [(3, "alpha beta gamma"), (4, "unique two")],   # dup of 0, other slice
        [(5, "delta epsilon"), (6, "alpha beta gamma")],  # dups of 2 and 0
    ]
    d = str(tmp_path / "docs_stream")
    for i, rows in enumerate(slices):
        pdf = pd.DataFrame(
            [(i_, t, "en", "synth", len(t)) for i_, t in rows],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(d, f"batch={i}")
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    s = stream_docs(spark, f"{d}/batch=*", max_files_per_trigger=1)
    q = (
        dedup_stream(s)
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    assert n_batches >= 3, f"expected >=3 data micro-batches, got {n_batches}"

    got = {
        r["keep_id"]: r["dup_count"]
        for r in spark.table("stream_dedup").collect()
    }
    # cross-trigger merge: the group seeded in slice 0 counts members from
    # slices 1 and 2; the survivor is the global min doc_id
    assert got == {0: 3, 1: 1, 2: 2, 4: 1}

    all_docs = spark.read.parquet(f"{d}/batch=*")
    want = {r["keep_id"]: r["dup_count"] for r in exact_dedup(all_docs).collect()}
    assert got == want


def test_streaming_dedup_on_corpus_single_drain(spark):
    """Whole-corpus drain equals the batch operator on the real fixture."""
    from avgdist_rs_spark.operators.dedup import exact_dedup
    from avgdist_rs_spark.streaming.docs_stream import dedup_stream, stream_docs

    import tempfile

    # the file stream source requires a DIRECTORY; stage via symlink
    d = tempfile.mkdtemp(prefix="doc_stream_corpus_")
    os.symlink(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(d, "documents.parquet"),
    )
    s = stream_docs(spark, d)
    q = (
        dedup_stream(s)
        .writeStream.format("memory")
        .queryName("stream_dedup_corpus")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["keep_id"]: r["dup_count"]
        for r in spark.table("stream_dedup_corpus").collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {r["keep_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert got == want
