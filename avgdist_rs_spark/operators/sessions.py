"""Sessionization: event streams → conversation-shaped tables → graphs.

The north rule's input is a transcript table; real pipelines *derive* that
shape from raw event logs. ``sessionize`` cuts a user's event stream into
sessions at inactivity gaps (the standard 30-minute web rule), and
``events_to_transcripts`` re-expresses sessions in the canonical
``transcripts`` schema so every graph operator applies unchanged.

Pure window functions (lag + conditional cumulative sum) — one shuffle on
``user_id``, partition-local everything else; exactly mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Events + (session_idx, turn_idx): new session when the gap from the
    previous event of the same user exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    gap_s = gap_minutes * 60
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s),
        1,
    ).otherwise(0)
    out = events.withColumn("_new", new_sess).withColumn(
        "session_idx", F.sum("_new").over(w).cast("long")
    )
    ws = Window.partitionBy(user_col, "session_idx").orderBy(F.col(ts_col), F.col("event_id"))
    return out.withColumn("turn_idx", (F.row_number().over(ws) - 1).cast("int")).drop("_new")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_idx, n_events, started, ended, duration_s)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("started"),
        F.max("ts").alias("ended"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_s"),
    )


def events_to_transcripts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionized events in the canonical transcripts schema:
    conv_id = 'u{user}:s{session}', role = event_type bucket, tool = event_type
    for tool-ish events — so the transcript graph derivation applies as-is."""
    s = sessionize(events, gap_minutes)
    return s.select(
        F.concat_ws(":", F.concat(F.lit("u"), F.col("user_id").cast("string")),
                    F.concat(F.lit("s"), F.col("session_idx").cast("string"))).alias("conv_id"),
        F.col("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(F.col("event_type").isin("click", "purchase"), F.col("event_type")).alias("tool"),
        F.col("ts"),
    )
