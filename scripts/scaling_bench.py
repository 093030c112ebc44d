"""One scaling-bench run at a single parallelism level. Prints ONE JSON line.

North-rule evidence job: the identical workload on the identical deterministic
input at two parallelism levels (local[8] vs local[32] — no real cluster in
this sandbox) must show throughput scaling efficiency ≥ 0.8 (BASELINE.md §2).

Workloads over the synthetic transcript graph (the north rule's input shape,
seeded, generated distributed — identical bits at any parallelism):
- ``bfs``: multi-source BFS from SEEDS deterministic sources, seed-parallel
  over the broadcast-CSR kernel (supersteps = Σ per-seed BFS levels) — the
  reference's estimator hot loop.
- ``pagerank``: distributed-DataFrame supersteps (shuffle-bound path).
- ``minhash``: MinHash-LSH dedup over the transcripts' text column (the
  pipeline family's hash-CPU-bound path: shingle explode + per-shingle
  hashing map-side, one band-bucket exchange) — scaling evidence for the
  corpus workload class, not just the graph one.

Env: SPARK_GRAFT_CPUS (parallelism), SCALE_CONVS (default 100_000),
SCALE_SEEDS (default 384), SCALE_PR_ITERS (default 6),
SCALE_DOC_TURNS (default 3 — transcripts turns per conv used as docs).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SCALE_CONVS", "20000"))
    n_seeds = int(os.environ.get("SCALE_SEEDS", "32768"))
    pr_iters = int(os.environ.get("SCALE_PR_ITERS", "6"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from avgdist_rs_spark.operators.bfs import bfs_csr
    from avgdist_rs_spark.operators.pagerank import pagerank
    from avgdist_rs_spark.sources.transcripts import synth_transcripts, transcript_graph
    from avgdist_rs_spark.streaming.superstep import SuperstepMetrics

    t0 = time.monotonic()
    tr = synth_transcripts(spark, n_convs=n_convs, mean_turns=8, n_tools=32, seed=42)
    g = transcript_graph(tr, tool_responses=True)
    g.csr_broadcast()  # setup: ship adjacency once (untimed vs workloads)
    setup_s = time.monotonic() - t0

    rng = np.random.default_rng(7)
    seeds = rng.integers(0, g.num_nodes, size=n_seeds)

    # warmup: loads the CSR broadcast into every python worker once (that
    # one-time deserialization would otherwise be charged to the timed run)
    bfs_csr(g, rng.integers(0, g.num_nodes, size=4 * cpus)).count()

    # best-of-N wall: the sandbox is a shared box (background load ±20%);
    # min over trials is the standard noise-robust estimator here
    bfs_s = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        stats = bfs_csr(g, seeds).toPandas()
        bfs_s = min(bfs_s, time.monotonic() - t0)
    bfs_supersteps = int(stats["dia"].sum())
    checksum = int(stats["dist_sum"].sum())

    met = SuperstepMetrics(name="pr")
    t0 = time.monotonic()
    pagerank(g, iterations=pr_iters, metrics=met).count()
    pr_s = time.monotonic() - t0

    # pipeline workload: MinHash-LSH dedup over the transcript text column —
    # doc ids are portable hashes of (conv_id, turn_idx), so the input is the
    # same bits at any parallelism; pair count doubles as the checksum
    from pyspark.sql import functions as F

    from avgdist_rs_spark.functions.hashing import portable_hash64
    from avgdist_rs_spark.operators.dedup import minhash_lsh_pairs

    doc_turns = int(os.environ.get("SCALE_DOC_TURNS", "3"))
    docs = (
        tr.where(F.col("turn_idx") < doc_turns)
        .select(
            portable_hash64(
                F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")),
                salt="sdoc:",
            ).alias("doc_id"),
            F.col("text"),
        )
        .persist()
    )
    n_docs = docs.count()  # materialize input outside the timed region
    mh_s, mh_pairs = float("inf"), -1
    for _ in range(trials):
        t0 = time.monotonic()
        mh_pairs = minhash_lsh_pairs(docs, threshold=0.5).count()
        mh_s = min(mh_s, time.monotonic() - t0)
    docs.unpersist()

    print(
        json.dumps(
            {
                "cpus": cpus,
                "num_nodes": g.num_nodes,
                "num_edges": g.num_edges,
                "setup_s": round(setup_s, 2),
                "bfs_seeds": n_seeds,
                "bfs_supersteps": bfs_supersteps,
                "bfs_wall_s": round(bfs_s, 2),
                "bfs_supersteps_per_min": round(60.0 * bfs_supersteps / bfs_s, 2),
                "bfs_dist_checksum": checksum,
                "pr_iters": pr_iters,
                "pr_wall_s": round(pr_s, 2),
                "pr_supersteps_per_min": round(60.0 * pr_iters / pr_s, 2),
                "mh_docs": n_docs,
                "mh_wall_s": round(mh_s, 2),
                "mh_docs_per_min": round(60.0 * n_docs / mh_s, 2),
                "mh_pairs_checksum": mh_pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
