"""Headline benchmark suite. Prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     SPARK_GRAFT_RUNS   (default 3) — run the whole suite N times and report
     per-query MEDIANS (the committed BENCH.md headline is runs=3 of exactly
     this command, so the driver's run and the headline are the same
     measurement up to shared-box noise). The JSON also carries
     ``loadavg_before``/``loadavg_after`` (1-min load average) so a
     contended run on this shared box is self-labeling.

Covers the north-rule workloads (graph build, PageRank supersteps, connected
components — including a 10k-vertex chain exercising the pointer-jumping
O(log diameter) path — label propagation, the avgdist sampling estimator,
multi-source BFS on both the broadcast-CSR and the distributed-shard
strategies) and the training-data pipeline heavies (MinHash-LSH dedup,
bucketed SimHash pairs, cosine top-k, IVF ANN, sessionization).
``supersteps_per_min`` is reported for the iterative kernels — the
reference's throughput metric (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_suite(spark, sf_dir: str) -> tuple[dict, dict]:
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from avgdist_rs_spark.operators.avgdist import avgdist_main
    from avgdist_rs_spark.operators.bfs import bfs_csr, bfs_frontier, per_seed_stats
    from avgdist_rs_spark.operators.components import connected_components
    from avgdist_rs_spark.operators.dedup import minhash_lsh_pairs, simhash, simhash_pairs
    from avgdist_rs_spark.operators.labelprop import label_propagation
    from avgdist_rs_spark.operators.pagerank import pagerank
    from avgdist_rs_spark.operators.sessions import session_stats
    from avgdist_rs_spark.operators.similarity import (
        cosine_topk,
        embedding_near_dup_pairs,
        ivf_ann,
    )
    from avgdist_rs_spark.operators.simpath import simple_paths_edges
    from avgdist_rs_spark.operators.triangles import triangle_count
    from avgdist_rs_spark.plans.graph import GraphFrame
    from avgdist_rs_spark.streaming.superstep import SuperstepMetrics

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = em._emb(spark, sf_dir)
    events = em._events(spark, sf_dir)

    # UNTIMED warm-up: JVM/codegen spin-up, Python-worker pool start, and the
    # first cold read of every input land here instead of inside the first
    # timed query — the round-2 driver run charged ~13 s of one-time warmth
    # to graph_build (16.5 s single-run vs 3.6 s committed median)
    for df in (docs, emb, events):
        df.count()
    spark.range(1_000_000).repartition(8).select(F.sum(F.col("id"))).collect()
    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).count()

    g = timed("graph_build", lambda: em._graph(spark, sf_dir))

    pr_met = SuperstepMetrics(name="pagerank")
    timed("pagerank_10it", lambda: pagerank(g, iterations=10, metrics=pr_met).count())
    extras["pagerank_supersteps_per_min"] = round(pr_met.supersteps_per_min(), 2)

    cc_met = SuperstepMetrics(name="cc")
    timed("connected_components", lambda: connected_components(g, metrics=cc_met).count())
    extras["cc_supersteps"] = cc_met.total_supersteps
    extras["cc_supersteps_per_min"] = round(cc_met.supersteps_per_min(), 2)

    # large-diameter showcase (the north star's regime): a 10k-hop chain.
    # Plain hash-min needs 10^4 supersteps; pointer jumping converges in
    # O(log diameter) ≈ 15 — the difference between hours and seconds at the
    # reference's 24k-hop payment-graph chains.
    def cc_chain():
        nch = 10_000
        chain_edges = spark.range(nch - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        cg = GraphFrame.from_edges(chain_edges, num_nodes=nch, dedup=False)
        met = SuperstepMetrics(name="cc_chain")
        ncomp = connected_components(cg, metrics=met).select("component").distinct().count()
        assert ncomp == 1
        cg.unpersist()
        return met

    chain_met = timed("cc_chain_10k", cc_chain)
    extras["cc_chain_supersteps"] = chain_met.total_supersteps

    timed("label_propagation_4it", lambda: label_propagation(g, iterations=4).count())

    from avgdist_rs_spark.operators.kcore import k_core

    timed("kcore_2", lambda: k_core(g, k=2).count())

    from avgdist_rs_spark.operators.scc import strongly_connected_components

    timed("scc", lambda: strongly_connected_components(g).count())

    # large-diameter DIRECTED showcase (mirrors cc_chain_10k): a 10k-vertex
    # directed cycle is ONE SCC of diameter 10^4 — the priority-order pointer
    # jump resolves it in ~50 supersteps instead of ~2·10^4
    def scc_cycle():
        nch = 10_000
        cyc_edges = spark.range(nch).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % nch).alias("dst")
        )
        cg = GraphFrame.from_edges(cyc_edges, num_nodes=nch, dedup=False)
        met = SuperstepMetrics(name="scc_cycle")
        ncomp = (
            strongly_connected_components(cg, metrics=met)
            .select("component").distinct().count()
        )
        assert ncomp == 1
        cg.unpersist()
        return met

    scc_met = timed("scc_cycle_10k", scc_cycle)
    extras["scc_cycle_supersteps"] = scc_met.total_supersteps

    from avgdist_rs_spark.operators.betweenness import betweenness

    # force with an AGGREGATE over the score column: .count() lets Catalyst
    # prune the bc-producing side of the final left join, skipping the Brandes
    # kernel entirely (round-3's 1.1 s entry was this undermeasurement)
    bt_seeds = np.random.default_rng(11).integers(0, g.num_nodes, size=2048)
    timed(
        "betweenness_2048",
        lambda: betweenness(g, seeds=bt_seeds).agg(F.sum("bc")).collect(),
    )

    # the past-broadcast-cap strategy: lockstep sharded Brandes (2·diameter
    # DataFrame supersteps against the CSR shard table, no broadcast)
    timed(
        "betweenness_sharded_64",
        lambda: betweenness(g, seeds=bt_seeds[:64], strategy="shards")
        .agg(F.sum("bc"))
        .collect(),
    )

    # sketch path: per-vertex neighbourhood function for ALL vertices at once
    # (the centrality strategy that replaces all-sources BFS past ~10^7 nodes)
    from avgdist_rs_spark.operators.hyperball import hyperball

    hb_met = SuperstepMetrics(name="hyperball")
    timed("hyperball_nf", lambda: hyperball(g, p=8, metrics=hb_met).count())
    extras["hyperball_supersteps"] = hb_met.total_supersteps

    r = timed(
        "avgdist_estimator",
        lambda: avgdist_main(g, slot=64, eps=0.1, dummy=True, seed=42, max_batches=4),
    )
    extras["avgdist_estimate_norm"] = round(float(r.final.get("norm") or 0.0), 6)

    # convergence early-stop (the reference's operational reason for batching):
    # run to std-error convergence instead of a fixed batch cap; the extras
    # record how many of the full Hoeffding-k batches were actually needed
    from avgdist_rs_spark.operators.avgdist import k_formula

    re_ = timed(
        "avgdist_estimator_earlystop",
        lambda: avgdist_main(
            g, slot=64, eps=0.1, dummy=True, seed=42,
            stop_eps=0.05, min_batches=4, fuse_batches=4,
        ),
    )
    extras["earlystop_batches_run"] = len(re_.iterations)
    extras["earlystop_batches_max"] = int(-(-k_formula(g.num_nodes, 0.1) // 64))
    extras["earlystop_seeds_bfsed"] = int(re_.seeds_bfsed)
    extras["earlystop_norm"] = round(float(re_.final.get("norm") or 0.0), 6)

    # the reference main binary's DEFAULT sampler: coverage-weighted (K4) —
    # backward BFS from uniform probes, CDF inversion, forward BFS
    rw = timed(
        "avgdist_estimator_weighted",
        lambda: avgdist_main(g, slot=64, eps=0.1, dummy=False, seed=42, max_batches=1),
    )
    extras["avgdist_weighted_norm"] = round(float(rw.final.get("norm") or 0.0), 6)

    rng = np.random.default_rng(7)
    seeds = rng.integers(0, g.num_nodes, size=2048)
    timed("bfs_2048_sources", lambda: bfs_csr(g, seeds).count())

    # distributed-CSR strategy (the >2e8-edge path): shard build + gather BFS
    seeds_df = spark.createDataFrame(
        [(int(s),) for s in rng.integers(0, g.num_nodes, size=64)], "seed long"
    )
    timed(
        "bfs_sharded_64_sources",
        lambda: per_seed_stats(bfs_frontier(g, seeds_df, shards=True)).count(),
    )

    timed("triangle_count", lambda: triangle_count(g))

    # edge-level peel fixpoint over the same canonical triangle join; support
    # aggregate forces the final peel round's join
    from avgdist_rs_spark.operators.ktruss import k_truss

    timed(
        "ktruss_3",
        lambda: k_truss(g.edges, k=3).agg(F.sum("support")).collect(),
    )
    timed("minhash_lsh_dedup", lambda: minhash_lsh_pairs(docs, threshold=0.8).count())
    # exact-join scale path (SSJoin/PPJoin prefix filter): at THIS corpus size
    # the quadratic co-shingle baseline is faster (the prefix pass pays two
    # extra shuffles for frequency ordering) — the entry tracks the constant;
    # the 10x twin tracks the slope, which is where prefix filtering wins
    from avgdist_rs_spark.operators.dedup import jaccard_pairs

    timed(
        "jaccard_prefix",
        lambda: jaccard_pairs(docs, threshold=0.8, strategy="prefix").count(),
    )
    # aggregate the fingerprint column itself — count() over a join-free
    # projection lets the scan skip computing the hashes altogether
    timed(
        "simhash",
        lambda: simhash(docs).agg(F.expr("bit_xor(simhash)")).collect(),
    )
    timed(
        "simhash_pairs_bucketed",
        lambda: simhash_pairs(docs, bits=32, max_hamming=6).count(),
    )
    timed("cosine_topk", lambda: cosine_topk(emb, k=10, num_queries=32).count())
    timed("sessionize", lambda: session_stats(events).count())

    timed(
        "ivf_ann",
        lambda: ivf_ann(emb, k=10, num_queries=32, num_centroids=16, nprobe=4).count(),
    )
    timed("emb_near_dup", lambda: embedding_near_dup_pairs(emb, threshold=0.4).count())

    # the flagship composed pipeline: exact dedup -> near-dup collapse ->
    # language/quality gates, one plan end-to-end
    from avgdist_rs_spark.operators.pipeline import training_set_select

    timed(
        "training_set_select",
        lambda: training_set_select(docs, lang="en", min_quality=0.6, threshold=0.8).count(),
    )

    ev0_type = events.where(F.col("event_id") == 0).collect()[0]["event_type"]
    timed(
        "simple_paths",
        lambda: simple_paths_edges(
            spark, em.event_edges(events), "E:0", f"H:{ev0_type}", max_len=16
        ).count(),
    )

    # Structured Streaming: one availableNow drain of the events table through
    # the stateful sessionizer (the only family that had no bench presence)
    timed("stream_sessions", lambda: em._q_stream_sessions(spark, sf_dir).count())

    # walk corpus: deterministic DeepWalk walks (L=8 composed equi-joins) +
    # skip-gram extraction; sum(steps)/sum(cnt) force the produced columns
    # (a bare count() lets Catalyst prune the unique-key left joins entirely)
    from avgdist_rs_spark.operators.walks import random_walks, skipgram_pairs

    def run_walks():
        w = random_walks(g.edges, walk_length=8).persist()
        w.agg(F.sum("steps")).collect()  # materialize INSIDE the timing
        return w

    walks_df = timed("random_walks", run_walks)
    timed(
        "skipgram_pairs",
        lambda: skipgram_pairs(walks_df, window=2).agg(F.sum("cnt")).collect(),
    )
    walks_df.unpersist()

    # second-order biased walks (node2vec): the weighted draw is O(deg²) per
    # hub step by nature, bounded by the deterministic sorted-prefix degree
    # cap; sum(steps) forces the pick folds
    from avgdist_rs_spark.operators.walks import node2vec_walks

    timed(
        "node2vec_walks",
        lambda: node2vec_walks(g.edges, walk_length=8, max_deg=64)
        .agg(F.sum("steps"))
        .collect(),
    )

    # quality-filter family: within-doc repetition signals (explode + two
    # keyed groupBys) and eval-set n-gram decontamination (broadcast gram set,
    # training corpus never shuffled) — aggregates force the produced columns
    from avgdist_rs_spark.operators.decontam import contamination
    from avgdist_rs_spark.operators.textstats import repetition_stats

    timed(
        "repetition_stats",
        lambda: repetition_stats(docs)
        .agg(F.sum("n_words"), F.avg("dup_trigram_frac"))
        .collect(),
    )
    timed(
        "contamination",
        lambda: contamination(docs, k=5).agg(F.sum("n_hit"), F.sum("n_grams")).collect(),
    )

    # round-5 additions: packing / sampling / enrichment / tokenizer / MSF
    from avgdist_rs_spark.operators.asof import asof_join
    from avgdist_rs_spark.operators.bpe import bpe_train
    from avgdist_rs_spark.operators.msf import minimum_spanning_forest
    from avgdist_rs_spark.operators.neighbors import khop_sample
    from avgdist_rs_spark.operators.pipeline import pack_sequences

    # two-level distributed prefix scan + explode + manifest groupBy
    timed(
        "pack_sequences",
        lambda: pack_sequences(docs, seq_len=2048)
        .agg(F.sum("n_tokens"), F.max("seq_id"))
        .collect(),
    )
    # GraphSAGE fan-out: 2 hops, (seed,parent)-windowed md5 pick
    khop_seeds = g.edges.select(F.col("src").alias("seed")).distinct().where(
        F.col("seed") % 97 == 0
    )
    timed(
        "khop_sample",
        lambda: khop_sample(g.edges, khop_seeds, fanouts=(4, 3)).count(),
    )
    # as-of join: union-sort carry-forward purchase<-click enrichment
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    timed(
        "asof_join",
        lambda: asof_join(
            ev.where(F.col("event_type") == "purchase"),
            ev.where(F.col("event_type") == "click"),
            on="user_id",
        )
        .agg(F.sum("lag_s"), F.count("*"))
        .collect(),
    )
    # BPE: 8 merges over the word-frequency state (argmax + Arrow rewrite
    # per merge — the per-merge fixed cost IS the measurement)
    timed("bpe_train_8", lambda: bpe_train(docs, num_merges=8).count())
    # weighted SSSP: Bellman-Ford fused superstep, ~1k sources at once —
    # frontier-only relaxation keeps per-superstep work on the improved set
    from avgdist_rs_spark.operators.sssp import hash_weights, sssp

    sssp_seeds = g.edges.select(F.col("src").alias("v")).distinct().where(
        F.col("v") % 97 == 0
    )
    timed(
        "sssp_multisource",
        lambda: sssp(hash_weights(g.edges), sssp_seeds)
        .agg(F.sum("dist"), F.count("*"))
        .collect(),
    )
    # Borůvka MSF over the session graph: O(log n) contraction rounds
    timed(
        "msf",
        lambda: minimum_spanning_forest(g.edges)
        # bit_xor, not sum: 60-bit hash weights overflow ANSI-mode long sums
        .agg(F.count("*").alias("n"), F.expr("bit_xor(w)"))
        .collect(),
    )

    extras["num_nodes"] = g.num_nodes
    extras["num_edges"] = g.num_edges

    # ---- second-scale block: the SAME kernels on a 10× replicated graph ----
    # (10 disjoint id-offset copies of the eg graph — deterministic, no new
    # data needed). Separates per-superstep fixed costs (flat across blocks)
    # from data-bound costs (scale with the block) so per-query regressions
    # at sf0.1 are interpretable. Disable with SPARK_GRAFT_10X=0.
    if os.environ.get("SPARK_GRAFT_10X", "1") != "0":
        n1 = g.num_nodes

        def build10():
            reps = spark.range(10).select(F.col("id").alias("rep"))
            e10 = g.edges.crossJoin(reps).select(
                (F.col("src") + F.col("rep") * n1).alias("src"),
                (F.col("dst") + F.col("rep") * n1).alias("dst"),
            )
            return GraphFrame.from_edges(e10, num_nodes=10 * n1, dedup=False)

        g10 = timed("10x_graph_build", build10)
        timed("10x_pagerank_10it", lambda: pagerank(g10, iterations=10).count())
        timed("10x_connected_components", lambda: connected_components(g10).count())
        timed("10x_label_propagation_4it", lambda: label_propagation(g10, iterations=4).count())
        timed("10x_triangle_count", lambda: triangle_count(g10))
        timed("10x_hyperball_nf", lambda: hyperball(g10, p=8).count())
        timed(
            "10x_avgdist_estimator",
            lambda: avgdist_main(g10, slot=64, eps=0.1, dummy=True, seed=42, max_batches=4),
        )
        seeds10 = np.random.default_rng(7).integers(0, g10.num_nodes, size=2048)
        timed("10x_bfs_2048_sources", lambda: bfs_csr(g10, seeds10).count())
        timed(
            "10x_betweenness_2048",
            lambda: betweenness(g10, seeds=seeds10).agg(F.sum("bc")).collect(),
        )
        timed(
            "10x_random_walks",
            lambda: random_walks(g10.edges, walk_length=8)
            .agg(F.sum("steps"))
            .collect(),
        )
        extras["num_nodes_10x"] = g10.num_nodes
        extras["num_edges_10x"] = g10.num_edges
        g10.unpersist()

        # ---- 10× pipeline family (dedup / ANN / composed pipeline) --------
        # docs: 10 disjoint replicas, each with a per-replica VOWEL ROTATION
        # of the text — a bijective character substitution changes every
        # shingle containing a vowel (cross-replica Jaccard ≈ 0, so pair
        # counts scale like 10 independent corpora) while per-doc length /
        # shingle count / hash workload stay identical. Within a replica the
        # near-dup structure is invariant (token renaming is bijective).
        max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        reps10 = spark.range(10).select(F.col("id").alias("rep"))
        docs10 = (
            docs.crossJoin(reps10)
            .select(
                (F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
                F.expr(
                    "translate(text, 'aeiou', "
                    "substring('aeiouaeiou', cast(rep % 5 as int) + 1, 5))"
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .persist()
        )
        docs10.count()
        timed(
            "10x_minhash_lsh_dedup",
            lambda: minhash_lsh_pairs(docs10, threshold=0.8).count(),
        )
        timed(
            "10x_simhash_pairs_bucketed",
            lambda: simhash_pairs(docs10, bits=32, max_hamming=6).count(),
        )
        timed(
            "10x_training_set_select",
            lambda: training_set_select(
                docs10, lang="en", min_quality=0.6, threshold=0.8
            ).count(),
        )
        timed(
            "10x_jaccard_prefix",
            lambda: jaccard_pairs(docs10, threshold=0.8, strategy="prefix").count(),
        )
        # decontamination slope: the eval gram set grows with the corpus but
        # stays broadcast-small; the big side still never shuffles
        timed(
            "10x_contamination",
            lambda: contamination(docs10, k=5)
            .agg(F.sum("n_hit"), F.sum("n_grams"))
            .collect(),
        )
        # embeddings: id-offset replicas (ANN cost is corpus-size-bound; the
        # query set stays 32, so this isolates the scan/assignment slope)
        max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        emb10 = (
            emb.crossJoin(reps10)
            .select(
                (F.col("vec_id") + F.col("rep") * max_vec).alias("vec_id"),
                "embedding",
            )
            .persist()
        )
        emb10.count()
        timed(
            "10x_ivf_ann",
            lambda: ivf_ann(
                emb10, k=10, num_queries=32, num_centroids=16, nprobe=4
            ).count(),
        )
        docs10.unpersist()
        emb10.unpersist()
    return timings, extras


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"avgdist-rs-spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    all_timings: list[dict] = []
    all_extras: list[dict] = []
    load_before = round(os.getloadavg()[0], 2)
    per_run_loads: list[float] = []
    for _ in range(runs):
        # fresh caches each run so graph_build is really measured
        for gf in list(em._CACHE.values()):
            gf.unpersist()
        em._CACHE.clear()
        spark.catalog.clearCache()
        t, e = run_suite(spark, sf_dir)
        all_timings.append(t)
        all_extras.append(e)
        per_run_loads.append(round(os.getloadavg()[0], 2))

    timings = {
        k: round(statistics.median(t[k] for t in all_timings), 3) for k in all_timings[0]
    }
    extras = {}
    for k in all_extras[0]:
        vals = [e[k] for e in all_extras]
        extras[k] = round(statistics.median(vals), 6) if isinstance(vals[0], float) else vals[0]

    # the 10x block reports separately: "value" stays the sf-dir suite total
    # (comparable round-over-round), "queries_10x"/"value_10x" carry the
    # second-scale measurements of the same kernels
    queries = {k: v for k, v in timings.items() if not k.startswith("10x_")}
    queries_10x = {k[4:]: v for k, v in timings.items() if k.startswith("10x_")}
    total = round(sum(queries.values()), 3)
    out = {
        "metric": "headline suite wall time (graph kernels + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "runs": runs,
        "loadavg_before": load_before,
        "loadavg_after": per_run_loads[-1],
        "loadavg_per_run": per_run_loads,
        **extras,
    }
    if queries_10x:
        out["queries_10x"] = queries_10x
        out["value_10x"] = round(sum(queries_10x.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
