"""Explicit hub-vertex skew salting (north rule; SURVEY.md §4.3).

Shuffle joins on vertex id skew badly on heavy-tailed graphs: a hub vertex's
adjacency (10⁶+ edges on the reference's payment graph) lands in one shuffle
partition. AQE's skew-join splitting is the backstop; the north rule demands
explicit salting, which also composes with the superstep loops where AQE is
constrained.

Mechanism for ``left(key) ⋈ edges(src)``:
- a degree-profile pass produces the hub set H (see ``operators.degrees.hubs``);
- hub edge rows are replicated... no — hub edge rows are SPLIT: each hub edge
  gets ``salt = pmod(hash(dst), S)``, non-hub edges salt 0, so a hub's adjacency
  spreads over S partitions;
- left rows keyed on a hub are REPLICATED S times (explode 0..S-1), non-hub
  rows get salt 0;
- join on (key, salt) — identical results, S-way spread of the hot key.

The left side only grows by |left ∩ H| · (S−1) rows — negligible when hubs are
few, which is exactly the skewed case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_edges(edges: DataFrame, hub_df: DataFrame, num_salts: int) -> DataFrame:
    """(src, dst, salt): hub edges split across salts by hash(dst), others salt 0.

    ``hub_df`` must have a single column ``v`` of hub vertex ids (small —
    broadcast).
    """
    hubs = F.broadcast(hub_df.select(F.col("v").alias("src")).distinct())
    marked = edges.join(hubs.withColumn("_is_hub", F.lit(True)), "src", "left")
    return marked.select(
        "src",
        "dst",
        F.when(
            F.col("_is_hub").isNotNull(), F.pmod(F.hash("dst"), F.lit(num_salts))
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("salt"),
    )


def salt_left(left: DataFrame, key: str, hub_df: DataFrame, num_salts: int) -> DataFrame:
    """Replicate hub-keyed rows across all salts; non-hub rows get salt 0."""
    hubs = F.broadcast(hub_df.select(F.col("v").alias(key)).distinct())
    marked = left.join(hubs.withColumn("_is_hub", F.lit(True)), key, "left")
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    return marked.select(
        *[c for c in left.columns],
        F.explode(
            F.when(F.col("_is_hub").isNotNull(), salts).otherwise(F.array(F.lit(0)))
        ).alias("salt"),
    )


def salted_expand(
    frontier: DataFrame, salted: DataFrame, hub_df: DataFrame, num_salts: int
) -> DataFrame:
    """One salted BFS expansion: frontier(seed, v) ⋈ salted edges → (seed, v=dst).

    Equivalent to ``frontier.join(edges, v == src)`` but with hub adjacency
    spread across ``num_salts`` shuffle partitions.
    """
    lf = salt_left(frontier, "v", hub_df, num_salts)
    e = salted.select(
        F.col("src").alias("v"), F.col("dst").alias("_edst"), F.col("salt")
    )
    return lf.join(e, ["v", "salt"]).select("seed", F.col("_edst").alias("v"))
