"""Degree-profile operators: sinks (reference K7), degree histogram, hub detection.

``sink`` binary (``src/bin/sink.rs:12-30``): count vertices with out-degree 0.
Spark: ``n − count(distinct src)`` — one aggregate over the edge table; no
full-vertex scan needed (the reference scans all n successor lists).

Hub detection feeds the skew-salting strategy (SURVEY.md §4.3): a degree-profile
pass finds vertices whose adjacency exceeds a threshold; their edges get salted
into S buckets at join time (see operators.salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.graph import GraphFrame


def sink_count(graph: GraphFrame) -> int:
    """Number of vertices with out-degree 0 (reference sink.rs)."""
    with_out = graph.edges.select("src").distinct().count()
    return graph.num_nodes - with_out


def sink_vertices(graph: GraphFrame) -> DataFrame:
    """(v) vertices with no outgoing edge — left-anti join formulation."""
    return graph.vertices().join(
        graph.edges.select(F.col("src").alias("v")).distinct(), "v", "left_anti"
    )


def degree_histogram(graph: GraphFrame, direction: str = "out") -> DataFrame:
    """(degree, cnt): distribution of out/in degrees (isolated vertices → degree 0)."""
    key = "src" if direction == "out" else "dst"
    deg = graph.edges.groupBy(F.col(key).alias("v")).agg(F.count("*").alias("degree"))
    allv = graph.vertices().join(deg, "v", "left").fillna(0, subset=["degree"])
    return allv.groupBy("degree").agg(F.count("*").alias("cnt"))


def hubs(graph: GraphFrame, threshold: int | None = None, direction: str = "out") -> DataFrame:
    """(v, degree) of heavy vertices. Default threshold: 32 × mean degree —
    heavy-tailed graphs (the reference's payment graph) put most edge mass on
    few vertices; these are the keys that skew shuffle joins."""
    key = "src" if direction == "out" else "dst"
    if threshold is None:
        mean = max(graph.num_edges / max(graph.num_nodes, 1), 1.0)
        threshold = int(32 * mean)
    return (
        graph.edges.groupBy(F.col(key).alias("v"))
        .agg(F.count("*").alias("degree"))
        .filter(F.col("degree") > threshold)
    )
