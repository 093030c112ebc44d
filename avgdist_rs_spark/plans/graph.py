"""GraphFrame: the engine's graph data model.

Reference data model (SURVEY.md §1): an immutable directed graph with dense integer
vertex ids ``0..n``, materialized twice (forward + transposed) for O(1) random access
(``BvGraph::with_basename`` at reference ``src/main.rs:124-125``; transpose importance
``README.md:82``).

Spark-first re-expression:
- ``edges(src long, dst long)``: distinct directed edges, hash-repartitioned on ``src``
  and persisted — the analog of the forward BVGraph. Every superstep join
  (frontier ⋈ edges on vertex) then reuses this partitioning, so after the one-time
  setup shuffle the per-superstep plan only shuffles the (much smaller) frontier.
- ``edges_t``: the transpose, independently repartitioned on its own ``src`` — the
  analog of the ``g-t`` BVGraph (reference walks backward edges for coverage-weighted
  sampling, ``src/main.rs:169``).
- ``nodes(id long, orig string)``: dense-id mapping, the analog of ``*.nodes``
  side files (reference ``data/github/github.nodes``). Dense ids are required for the
  numpy/bitset BFS kernels.
- A broadcast CSR fast path for graphs whose adjacency fits comfortably through
  the driver and in every executor: two int64/int32 numpy arrays (offsets,
  targets) — the moral equivalent of BVGraph+Elias-Fano random access
  (reference ``README.md:58-81``), shipped once per executor via
  ``SparkContext.broadcast``. Gated at ``operators.bfs.DEFAULT_CSR_MAX_EDGES``
  (2e8 edges ≈ 2.4 GB of arrays — a deliberate driver-heap ceiling, NOT the
  2.16e9-edge payment-graph scale).
- **CSR shards** (``csr_shards``): the distributed form — per-vertex-range CSR
  blocks built executor-side with ``applyInPandas`` and kept as a persisted
  DataFrame of binary columns. Nothing ever materializes on the driver, so
  this is the path that covers the payment-graph scale and beyond; BFS gathers
  against the shards with a co-grouped pandas kernel (``operators.bfs``).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _num_partitions_for(spark: SparkSession) -> int:
    return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))


def spread(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-spread a DataFrame to session parallelism when its scan arrived
    narrower (a small parquet file = ONE partition, and every projection
    downstream — shingle explodes, per-word hashing, plane projections, Lloyd
    assignments — inherits it). No-op for well-partitioned inputs, so the
    zero-corpus-shuffle claims of the operators hold where they matter. The
    guard reads the physical partition count: plan-time for plain scans; for
    inputs that already contain exchanges, AQE may materialize the upstream
    stages to answer it — corpus operators apply this at the SCAN, where it
    is free."""
    n = _num_partitions_for(df.sparkSession)
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, F.col(key_col))
    return df


@dataclass
class CSR:
    """Compressed sparse row adjacency: successors(v) = targets[offsets[v]:offsets[v+1]]."""

    offsets: np.ndarray  # int64, len n+1
    targets: np.ndarray  # int64, len m
    num_nodes: int

    def successors(self, v: int) -> np.ndarray:
        return self.targets[self.offsets[v] : self.offsets[v + 1]]


def build_csr(pairs: np.ndarray, num_nodes: int) -> CSR:
    """Build CSR from an (m, 2) int64 array of (src, dst) pairs.

    Targets are stored int32 when ids fit (n < 2^31): the BFS kernel is a
    memory-bound gather loop, so halving target bytes nearly halves the
    bandwidth per edge visit — the Spark-side analog of BVGraph's compressed
    adjacency (reference README.md:58-103)."""
    tdtype = np.int32 if num_nodes < 2**31 else np.int64
    if pairs.size == 0:
        return CSR(np.zeros(num_nodes + 1, dtype=np.int64), np.empty(0, dtype=tdtype), num_nodes)
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    src = pairs[order, 0]
    dst = pairs[order, 1]
    counts = np.bincount(src, minlength=num_nodes)
    offsets = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return CSR(offsets, dst.astype(tdtype, copy=False), num_nodes)


@dataclass
class GraphFrame:
    """Directed graph as co-partitioned forward/transposed edge DataFrames."""

    edges: DataFrame
    edges_t: DataFrame
    num_nodes: int
    num_edges: int
    nodes: Optional[DataFrame] = None  # (id long, orig string) when densified
    _csr_fwd: Optional[object] = field(default=None, repr=False)
    _csr_bwd: Optional[object] = field(default=None, repr=False)

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession

    # ------------------------------------------------------------- constructors
    @staticmethod
    def from_edges(
        edges: DataFrame,
        num_nodes: int | None = None,
        *,
        dedup: bool = True,
        persist: bool = True,
    ) -> "GraphFrame":
        """Build from an integer-id edge DataFrame with columns (src, dst).

        ``num_nodes`` defaults to ``max(id)+1`` (reference semantics: ids are dense
        ``0..n`` and ``--num-nodes`` may exceed the max id, leaving isolated
        vertices — those still count as BFS seeds in exact mode).
        """
        spark = edges.sparkSession
        p = _num_partitions_for(spark)
        e = edges.select(
            F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
        )
        if dedup:
            e = e.distinct()
        e = e.repartition(p, "src")
        et = e.select(F.col("dst").alias("src"), F.col("src").alias("dst")).repartition(p, "src")
        if persist:
            e = e.persist(StorageLevel.MEMORY_AND_DISK)
            et = et.persist(StorageLevel.MEMORY_AND_DISK)
        m = e.count()
        if num_nodes is None:
            mx = e.select(F.max(F.greatest("src", "dst")).alias("mx")).collect()[0]["mx"]
            num_nodes = int(mx) + 1 if mx is not None else 0
        et.count()  # materialize the transpose once; reused every superstep
        return GraphFrame(edges=e, edges_t=et, num_nodes=int(num_nodes), num_edges=int(m))

    @staticmethod
    def dense_ids(verts: DataFrame, key: str = "orig") -> DataFrame:
        """(id, orig): deterministic dense rank 0..n-1 of distinct keys in sorted
        order — WITHOUT a global single-partition window.

        Scalable zipWithIndex: range-partition + sort by key, count rows per
        partition (tiny collect), broadcast the prefix offsets, then global
        rank = partition offset + partition-local row_number. Two shuffles of
        the deduplicated vertex set; every stage is distributed (the classic
        fix for the ``Window.orderBy`` driver bottleneck at 10^9 vertices).
        Ranks depend only on the total key order, not on where range
        boundaries land, so ids are bit-stable across parallelism levels.
        """
        from pyspark.sql.window import Window

        spark = verts.sparkSession
        p = _num_partitions_for(spark)
        vs = (
            verts.select(F.col(key).alias("orig"))
            .distinct()
            .repartitionByRange(p, "orig")
            .sortWithinPartitions("orig")
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        sizes = {r["_pid"]: r["c"] for r in vs.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
        offsets, acc = {}, 0
        for pid in sorted(sizes):
            offsets[pid] = acc
            acc += sizes[pid]
        off_col = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("_pid")] if offsets else F.lit(0)
        w = Window.partitionBy("_pid").orderBy("orig")
        nodes = vs.select(
            (off_col + F.row_number().over(w) - 1).cast("long").alias("id"), "orig"
        )
        return nodes

    @staticmethod
    def from_any_edges(edges: DataFrame, dedup: bool = True) -> "GraphFrame":
        """Build from arbitrarily-typed/keyed edges by densifying vertex ids.

        Analog of ``webgraph from arcs`` hashing string labels to dense ids
        (reference ``data/labeled/Makefile:3-8``): distinct vertex keys are
        ranked in sorted order (deterministic, distributed — see
        :meth:`dense_ids`); the mapping is kept as ``nodes(id, orig)`` — the
        analog of the reference's ``*.nodes`` side files.
        """
        # materialize the (possibly expensive) edge derivation ONCE: the
        # string-keyed projection is consumed three times below (both vertex
        # scans + the id-mapping join) and without the checkpoint each
        # consumer re-runs the full upstream plan (e.g. the transcript
        # sessionize → window → distinct chain behind the session graph)
        se = edges.select(
            F.col("src").cast("string").alias("s_orig"),
            F.col("dst").cast("string").alias("d_orig"),
        ).localCheckpoint(eager=False)
        verts = se.select(F.col("s_orig").alias("orig")).union(
            se.select(F.col("d_orig").alias("orig"))
        )
        nodes = GraphFrame.dense_ids(verts).persist(StorageLevel.MEMORY_AND_DISK)
        n = nodes.count()
        # plain equi-joins: Catalyst/AQE broadcasts when nodes is small and
        # falls back to shuffle joins at 10^9-vertex scale
        e = (
            se
            .join(nodes.withColumnRenamed("orig", "s_orig"), "s_orig")
            .withColumnRenamed("id", "src")
            .join(nodes.withColumnRenamed("orig", "d_orig"), "d_orig")
            .withColumnRenamed("id", "dst")
            .select("src", "dst")
        )
        # pass dedup through: derivations that already emit distinct edges
        # (e.g. transcript/event edge builders) skip a full edge shuffle here
        g = GraphFrame.from_edges(e, num_nodes=n, dedup=dedup)
        g.nodes = nodes
        return g

    # ------------------------------------------------------------- derived views
    def symmetric_edges(self) -> DataFrame:
        """Undirected view: edges ∪ transpose, distinct (for CC / LP / triangles).

        Re-partitioned on ``src`` so superstep joins (labels ⋈ sym on src)
        reuse the edge side's partitioning — only the small label vector
        shuffles per superstep, never the edge table."""
        p = _num_partitions_for(self.spark)
        return self.edges.union(self.edges_t).distinct().repartition(p, "src")

    def out_degrees(self) -> DataFrame:
        """(v, out_degree) for vertices with ≥1 outgoing edge."""
        return self.edges.groupBy(F.col("src").alias("v")).agg(
            F.count("*").alias("out_degree")
        )

    def vertices(self) -> DataFrame:
        """All vertex ids 0..n-1 as a DataFrame (reference full-vertex scan S3)."""
        return self.spark.range(self.num_nodes).select(F.col("id").alias("v"))

    # ------------------------------------------------------------- CSR broadcast
    def _collect_pairs(self, transposed: bool) -> np.ndarray:
        # Arrow collect, not toPandas: no pandas object materialization, the
        # int64 buffers convert zero-copy — roughly halves the driver-side
        # footprint of the (gated) broadcast-CSR build.
        df = self.edges_t if transposed else self.edges
        tbl = df.select("src", "dst").toArrow()
        return np.column_stack(
            [
                tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
                tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
            ]
        )

    def csr_broadcast(self, transposed: bool = False):
        """Broadcast-CSR adjacency (built once, cached). Fast path only — callers
        must gate on graph size (see operators.bfs.DEFAULT_CSR_MAX_EDGES)."""
        attr = "_csr_bwd" if transposed else "_csr_fwd"
        bc = getattr(self, attr)
        if bc is None:
            csr = build_csr(self._collect_pairs(transposed), self.num_nodes)
            bc = self.spark.sparkContext.broadcast(
                {"offsets": csr.offsets, "targets": csr.targets, "n": csr.num_nodes}
            )
            setattr(self, attr, bc)
        return bc

    # ------------------------------------------------------------- bucketed disk
    def save_bucketed(self, name: str, path: str, buckets: int | None = None) -> None:
        """Persist the graph as bucketed+sorted Parquet tables — the engine's
        analog of the reference's preprocessed on-disk BVGraph pair.

        Both orientations are written ``bucketBy(P, 'src') sortBy('src','dst')``
        (external tables under ``path``), so any later job's frontier ⋈ edges
        join reads the edge side pre-hashed: no edge-table Exchange, ever —
        the one-time setup shuffle of `from_edges` moves to preprocessing,
        exactly like ``webgraph from arcs`` + ``transform transpose``
        (reference ``data/*/Makefile``). ``{name}_meta`` carries
        num_nodes/num_edges; ``{name}_nodes`` the dense-id mapping.
        """
        spark = self.spark
        p = buckets or _num_partitions_for(spark)
        for suffix, df in (("edges", self.edges), ("edges_t", self.edges_t)):
            (
                df.write.mode("overwrite")
                .format("parquet")
                .option("path", os.path.join(path, suffix))
                .bucketBy(p, "src")
                .sortBy("src", "dst")
                .saveAsTable(f"{name}_{suffix}")
            )
        if self.nodes is not None:
            (
                self.nodes.write.mode("overwrite")
                .format("parquet")
                .option("path", os.path.join(path, "nodes"))
                .saveAsTable(f"{name}_nodes")
            )
        meta = spark.createDataFrame(
            [(int(self.num_nodes), int(self.num_edges))], "num_nodes long, num_edges long"
        )
        (
            meta.write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(path, "meta"))
            .saveAsTable(f"{name}_meta")
        )

    @staticmethod
    def load_bucketed(spark: SparkSession, name: str) -> "GraphFrame":
        """Reopen a :meth:`save_bucketed` graph. The returned edge DataFrames
        carry the table's bucketing, so superstep joins on ``src`` scan the
        Parquet buckets directly with no Exchange on the edge side."""
        row = spark.table(f"{name}_meta").collect()[0]
        g = GraphFrame(
            edges=spark.table(f"{name}_edges"),
            edges_t=spark.table(f"{name}_edges_t"),
            num_nodes=int(row["num_nodes"]),
            num_edges=int(row["num_edges"]),
        )
        try:
            g.nodes = spark.table(f"{name}_nodes")
        except Exception:
            g.nodes = None
        return g

    # ------------------------------------------------------------- CSR shards
    def shard_bucket_size(self, buckets_per_partition: int = 4) -> int:
        """Vertex-range width of one CSR shard: ~``buckets_per_partition``
        shards per shuffle partition — small enough that one hot range does
        not serialize a stage, large enough that shard rows stay chunky."""
        p = _num_partitions_for(self.spark)
        return max(1, math.ceil(self.num_nodes / (buckets_per_partition * p)))

    def csr_shards(self, transposed: bool = False, bucket_size: int | None = None) -> DataFrame:
        """Distributed CSR: one row per vertex-range bucket, built executor-side.

        ``(bucket, vlo, offsets binary, targets binary)`` where
        ``offsets``/``targets`` are packed numpy buffers (int64 offsets;
        int32 targets when ids fit — same compression rule as the broadcast
        path). The full edge list NEVER visits the driver: the build is one
        shuffle (groupBy bucket) + a per-group pandas kernel, and the result
        is a persisted DataFrame whose rows live on executors. This is the
        CSR that scales past ``DEFAULT_CSR_MAX_EDGES`` — the 2.16e9-edge
        payment-graph regime and the 10^12-turn north star.
        """
        attr = "_shards_bwd" if transposed else "_shards_fwd"
        cached = getattr(self, attr, None)
        if cached is not None:
            built_bsz = getattr(self, attr + "_bsz")
            if bucket_size is not None and bucket_size != built_bsz:
                # a silent mismatch would make gather-side bucket keys disagree
                # with the shard table's (truncated/empty reachability, no error)
                raise ValueError(
                    f"csr_shards already built with bucket_size={built_bsz}; "
                    f"requested {bucket_size} — unpersist() first to rebuild"
                )
            return cached
        df = self.edges_t if transposed else self.edges
        bsz = bucket_size or self.shard_bucket_size()
        n = self.num_nodes
        tdt = "int32" if n < 2**31 else "int64"

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bkt = int(pdf["bucket"].iloc[0])
            vlo = bkt * bsz
            nvb = min(bsz, n - vlo)
            src = pdf["src"].to_numpy(dtype=np.int64) - vlo
            dst = pdf["dst"].to_numpy(dtype=np.int64)
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            counts = np.bincount(src, minlength=nvb)
            offsets = np.zeros(nvb + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            return pd.DataFrame(
                {
                    "bucket": [bkt],
                    "vlo": [vlo],
                    "offsets": [offsets.tobytes()],
                    "targets": [dst.astype(tdt).tobytes()],
                }
            )

        shards = (
            df.withColumn("bucket", F.floor(F.col("src") / bsz).cast("long"))
            .groupBy("bucket")
            .applyInPandas(build, "bucket long, vlo long, offsets binary, targets binary")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        shards.count()
        setattr(self, attr, shards)
        # the build-time bucket width travels WITH the cache: gathers must use
        # this exact value even if spark.sql.shuffle.partitions changes later
        setattr(self, attr + "_bsz", bsz)
        return shards

    def shard_width(self, transposed: bool = False) -> int:
        """Bucket width the cached shard table was built with (builds if absent)."""
        self.csr_shards(transposed=transposed)
        return getattr(self, "_shards_bwd_bsz" if transposed else "_shards_fwd_bsz")

    def unpersist(self) -> None:
        self.edges.unpersist()
        self.edges_t.unpersist()
        if self.nodes is not None:
            self.nodes.unpersist()
        for attr in ("_csr_fwd", "_csr_bwd"):
            bc = getattr(self, attr)
            if bc is not None:
                bc.unpersist()
                setattr(self, attr, None)
        for attr in ("_shards_fwd", "_shards_bwd"):
            df = getattr(self, attr, None)
            if df is not None:
                df.unpersist()
                setattr(self, attr, None)
                setattr(self, attr + "_bsz", None)
