"""Structured Streaming surface: the engine's streaming ingest path.

The reference is batch-only (SURVEY.md §2.7); this module covers what a
production transcript pipeline additionally needs: events/turns arriving as a
stream, windowed rollups with late-data watermarks, and *stateful*
sessionization whose results match the batch ``operators.sessions.sessionize``
exactly (tested) — so the same downstream graph derivation applies to a live
feed.

Design: file/Iceberg stream source → watermarked event-time windows (built-in
incremental aggregation) → ``applyInPandasWithState`` only for the genuinely
stateful operator (session assignment needs per-user last-seen state across
micro-batches; nothing built-in expresses "gap > 30 min starts a new id").
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("turn_idx", IntegerType()),
    ]
)

#: per-user state: epoch seconds of last event, current session idx, next turn idx
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_s", LongType()),
        StructField("session_idx", LongType()),
        StructField("next_turn", LongType()),
    ]
)


def stream_events(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source event stream (the sandbox analog of an Iceberg CDC feed)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed rollup with a late-data watermark (incremental)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    drop_late: bool = True,
    state_timeout_minutes: int | None = None,
) -> DataFrame:
    """Stateful streaming sessionization: same semantics as the batch
    ``operators.sessions.sessionize`` (gap > ``gap_minutes`` → new session),
    state = (last event time, session counter, turn counter) per user.

    **Ordering contract**: results equal the batch sessionize only when each
    user's events arrive in event-time order ACROSS micro-batches (within a
    batch we sort). An event older than the user's state (``ts < last_ts``)
    cannot be assigned retroactively in append mode; with ``drop_late=True``
    (default) it is dropped — the streaming analog of a watermark — instead of
    the silent failure mode the naive formulation has (negative gap extends
    the current session and moves ``last_ts`` backwards).

    ``state_timeout_minutes`` bounds state at scale: a user idle that long (in
    processing time) has their state evicted — the next event simply starts a
    fresh session numbering epoch, which is exactly what the gap rule would do
    anyway for any gap beyond the timeout. Without it, per-user state grows
    with the user universe forever.
    """
    gap_s = gap_minutes * 60
    timeout_ms = None if state_timeout_minutes is None else state_timeout_minutes * 60_000
    timeout_conf = (
        GroupStateTimeout.NoTimeout if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def assign(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts, sess, turn = state.get
        else:
            last_ts, sess, turn = None, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])  # event-time order in batch
        ts_s = (batch["ts"].astype("int64") // 1_000_000_000).to_numpy()
        out_id, out_sess, out_turn = [], [], []
        for eid, t in zip(batch["event_id"].to_numpy(), ts_s):
            if drop_late and last_ts is not None and t < last_ts:
                continue  # late arrival: see ordering contract above
            if last_ts is None or (t - last_ts) > gap_s:
                sess += 1
                turn = 0
            else:
                turn += 1
            out_id.append(eid)
            out_sess.append(sess)
            out_turn.append(turn)
            last_ts = int(t)
        if out_id:
            state.update((last_ts, int(sess), int(turn)))
        if timeout_ms is not None and state.exists:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "event_id": pd.array(out_id, dtype="int64"),
                "user_id": user_id,
                "session_idx": pd.array(out_sess, dtype="int64"),
                "turn_idx": pd.array(out_turn, dtype="int32"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def run_available_now(df: DataFrame, query_name: str, output_mode: str) -> None:
    """Drain everything currently available into an in-memory table and stop
    (deterministic test/bench harness for the streaming path)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
