"""Transcript source invariants (FIXTURES.md §1) + graph derivation.

The per-row invariant from ``BASELINE.json`` input_hint: per-turn text equality
under stable turn ordering — tested here as bit-identical regeneration under the
same seed at different parallelism.
"""

import pyspark.sql.functions as F
import pytest

from avgdist_rs_spark.operators.avgdist import exact_avgdist
from avgdist_rs_spark.sources.transcripts import (
    reply_edges,
    synth_transcripts,
    tool_edges,
    transcript_graph,
)


@pytest.fixture(scope="module")
def tr(spark):
    df = synth_transcripts(spark, n_convs=200, mean_turns=6, n_tools=8, seed=42).cache()
    df.count()
    return df


def test_schema(tr):
    assert dict(tr.dtypes) == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp",
    }


def test_key_unique_and_dense(tr):
    n = tr.count()
    assert tr.select("conv_id", "turn_idx").distinct().count() == n
    # turn_idx dense 0..len-1 per conversation
    per = tr.groupBy("conv_id").agg(
        F.count("*").alias("cnt"), F.min("turn_idx").alias("mn"), F.max("turn_idx").alias("mx")
    )
    bad = per.where((F.col("mn") != 0) | (F.col("mx") != F.col("cnt") - 1)).count()
    assert bad == 0
    assert per.count() == 200


def test_ts_strictly_increasing(tr):
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = tr.withColumn("prev", F.lag("ts").over(w))
    assert lagged.where(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev"))).count() == 0


def test_tool_only_on_assistant(tr):
    assert tr.where(F.col("tool").isNotNull() & (F.col("role") != "assistant")).count() == 0
    assert tr.where(F.col("tool").isNotNull()).count() > 0


def test_deterministic_across_parallelism(spark, tr):
    again = synth_transcripts(spark, n_convs=200, mean_turns=6, n_tools=8, seed=42).repartition(3)
    assert again.exceptAll(tr).count() == 0 and tr.exceptAll(again).count() == 0


def test_edge_counts(tr):
    n_turns = tr.count()
    n_convs = tr.select("conv_id").distinct().count()
    assert reply_edges(tr).count() == n_turns - n_convs  # len-1 per conversation
    assert tool_edges(tr).count() == tr.where(F.col("tool").isNotNull()).count()


def test_graph_derivation_and_hubs(tr):
    g = transcript_graph(tr)
    n_turns = tr.count()
    n_tools_used = tr.where(F.col("tool").isNotNull()).select("tool").distinct().count()
    assert g.num_nodes == n_turns + n_tools_used
    # tool vertices are in-degree hubs
    indeg = g.edges.groupBy("dst").count()
    top = (
        indeg.join(g.nodes, indeg.dst == g.nodes.id)
        .orderBy(F.desc("count"))
        .select("orig")
        .first()["orig"]
    )
    assert top.startswith("tool:")
    # graph is BFS-able end to end
    res = exact_avgdist(g)
    assert res["diameter"] >= 2 and res["avg_distance"] > 0
