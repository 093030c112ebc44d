"""Triangle counting on the undirected view (north rule; SURVEY.md §7.3).

Canonical-orientation wedge join: symmetrize, keep each undirected edge once as
(a < b), then count closed wedges

    e1(a,b) ⋈ e2(b,c) [a<b<c] ⋈ e3(a,c)

Each triangle {a<b<c} is counted exactly once. Two shuffle joins; the canonical
orientation (low id → high id) is the standard degree/ID-ordering trick that
keeps the wedge fan-out bounded on skewed graphs (a hub's wedges are generated
only from its lower-id endpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.graph import GraphFrame


def canonical_edges(graph: GraphFrame) -> DataFrame:
    """Undirected edges as (a < b), distinct, self-loops dropped."""
    e = graph.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    return e.filter(F.col("a") != F.col("b")).distinct()


def triangle_count(graph: GraphFrame) -> int:
    e = canonical_edges(graph).persist()
    e.count()
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    e3 = e.select(F.col("a"), F.col("b").alias("c"))
    n = wedges.join(e3, ["a", "c"]).count()
    e.unpersist()
    return n


def per_vertex_triangles(graph: GraphFrame) -> DataFrame:
    """(v, triangles) — number of triangles incident to each vertex."""
    e = canonical_edges(graph).persist()
    e.count()
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .select("a", "b", "c")
        .join(e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"])
    )
    out = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("triangles"))
    )
    return out
