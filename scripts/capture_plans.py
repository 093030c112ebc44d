"""Capture .explain("formatted") plans for the round-6 optimization evidence.

Runs each touched query (or its representative superstep) and writes
``plans/r06/<name>_<suffix>.txt``. For superstep loops the REAL mid-loop plan
is captured by hooking ``Checkpointer.step`` / ``DataFrame.localCheckpoint``
— the plan that is actually submitted every iteration, not a reconstruction.

    python scripts/capture_plans.py --out plans/r06 --suffix after
    PYTHONPATH=/tmp/repo_r05 python scripts/capture_plans.py \
        --repo /tmp/repo_r05 --out plans/r06 --suffix before
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="", help="comma-separated subset")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    os.makedirs(args.out, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    def explain_str(df) -> str:
        return df._jdf.queryExecution().explainString(mode)

    def save(name: str, text: str, header: str = "") -> None:
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            if header:
                f.write(f"== {header}\n")
            f.write(text)
        print(f"wrote {path}", flush=True)

    # ---- superstep-plan hook -------------------------------------------
    import avgdist_rs_spark.streaming.superstep as ss

    captured: list[str] = []
    capturing = [False]
    orig_step = ss.Checkpointer.step

    def hooked_step(self, df, superstep, *a, **kw):
        if capturing[0]:
            captured.append(explain_str(df))
        return orig_step(self, df, superstep, *a, **kw)

    ss.Checkpointer.step = hooked_step

    from contextlib import contextmanager

    @contextmanager
    def capture():
        captured.clear()
        capturing[0] = True
        try:
            yield captured
        finally:
            capturing[0] = False

    def pick(caps: list[str], idx: int) -> tuple[str, str]:
        idx = min(idx, len(caps) - 1)
        return caps[idx], f"checkpointer-cut #{idx + 1} of {len(caps)}"

    import __spark_entry__ as em
    from avgdist_rs_spark.plans.graph import GraphFrame

    g = em._graph(spark, args.sf_dir)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    def q_pagerank():
        from avgdist_rs_spark.operators.pagerank import pagerank

        with capture() as caps:
            pagerank(g, iterations=3).count()
        save("pagerank_superstep", *pick(caps, 2), )

    def q_cc():
        from avgdist_rs_spark.operators.components import connected_components

        nch = 10_000
        ch = spark.range(nch - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        cg = GraphFrame.from_edges(ch, num_nodes=nch, dedup=False)
        with capture() as caps:
            connected_components(cg).count()
        save("cc_jump_superstep", *pick(caps, 6))
        cg.unpersist()

    def q_scc():
        from avgdist_rs_spark.operators.scc import strongly_connected_components

        nch = 10_000
        cy = spark.range(nch).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % nch).alias("dst")
        )
        cg = GraphFrame.from_edges(cy, num_nodes=nch, dedup=False)
        with capture() as caps:
            strongly_connected_components(cg).count()
        save("scc_jump_superstep", *pick(caps, 9))
        cg.unpersist()

    def q_lpa():
        from avgdist_rs_spark.operators.labelprop import label_propagation

        with capture() as caps:
            label_propagation(g, iterations=2).count()
        save("lpa_superstep", *pick(caps, 1))

    def q_kcore():
        from avgdist_rs_spark.operators.kcore import k_core

        with capture() as caps:
            k_core(g, k=2).count()
        save("kcore_superstep", *pick(caps, 1))

    def q_sssp():
        from avgdist_rs_spark.operators.sssp import hash_weights, sssp

        seeds = g.edges.select(F.col("src").alias("v")).distinct().where(
            F.col("v") % 97 == 0
        )
        with capture() as caps:
            sssp(hash_weights(g.edges), seeds).count()
        save("sssp_superstep", *pick(caps, 3))

    def q_msf():
        from avgdist_rs_spark.operators.msf import minimum_spanning_forest

        with capture() as caps:
            minimum_spanning_forest(g.edges).count()
        # cut #3 is round 1's relabel/shrink in both trees
        save("msf_relabel_round", *pick(caps, 2))

    def q_hyperball():
        from avgdist_rs_spark.operators.hyperball import hyperball

        with capture() as caps:
            hyperball(g, p=8).count()
        save("hyperball_superstep", *pick(caps, 1))

    def q_bpe():
        from avgdist_rs_spark.operators.bpe import bpe_train

        with capture() as caps:
            bpe_train(docs, num_merges=3).count()
        save("bpe_merge_state", *pick(caps, 0))

    def q_node2vec():
        from avgdist_rs_spark.operators.walks import node2vec_walks

        df = node2vec_walks(g.edges, walk_length=3, max_deg=64).agg(F.sum("steps"))
        save("node2vec_walks", explain_str(df), "3-step walk aggregate")

    def q_jaccard():
        from avgdist_rs_spark.operators.dedup import jaccard_pairs

        df = jaccard_pairs(docs, threshold=0.8, strategy="prefix")
        save("jaccard_prefix", explain_str(df), "full query plan")

    def q_training():
        from avgdist_rs_spark.operators.pipeline import training_set_select

        df = training_set_select(docs, lang="en", min_quality=0.6, threshold=0.8)
        save("training_set_select", explain_str(df), "full query plan")

    QUERIES = {
        "pagerank_superstep": q_pagerank,
        "cc_jump_superstep": q_cc,
        "scc_jump_superstep": q_scc,
        "lpa_superstep": q_lpa,
        "kcore_superstep": q_kcore,
        "sssp_superstep": q_sssp,
        "msf_relabel_round": q_msf,
        "hyperball_superstep": q_hyperball,
        "bpe_merge_state": q_bpe,
        "node2vec_walks": q_node2vec,
        "jaccard_prefix": q_jaccard,
        "training_set_select": q_training,
    }
    only = {n for n in args.only.split(",") if n}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — capture the rest regardless
            print(f"FAILED {name}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
