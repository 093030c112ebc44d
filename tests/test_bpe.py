"""BPE merge training: exact parity with a from-scratch pure-Python trainer.

The oracle reimplements classic BPE (word-frequency table, most-frequent
adjacent pair, ties by pair ascending, left-to-right non-overlapping apply)
with none of the Spark code shared — merge SEQUENCE and COUNTS must agree
exactly, and encode must agree per document.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.bpe import bpe_encode, bpe_train, word_frequency

SF = "/root/testdata/sf0.001"

DOCS = [
    (0, "low lower lowest low low"),
    (1, "newer newest new new newer"),
    (2, "wider wide widest low"),
    (3, "aaaa aaa aa"),          # overlap: non-overlapping apply matters
    (4, "low newer wide"),
]


def _py_bpe(texts, num_merges):
    wf = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    state = {w: tuple(list(w) + ["</w>"]) for w in wf}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = Counter()
        for w, sym in state.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += wf[w]
        if not pc:
            break
        # max count, ties by pair ascending
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, a, b, n))
        for w, sym in list(state.items()):
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            state[w] = tuple(out)
    return merges, state, wf


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_word_frequency(docs):
    got = {r["word"]: (r["count"], list(r["symbols"]))
           for r in word_frequency(docs).collect()}
    assert got["low"] == (5, ["l", "o", "w", "</w>"])
    assert got["aa"] == (1, ["a", "a", "</w>"])


def test_bpe_train_matches_python(docs):
    got = [tuple(r) for r in bpe_train(docs, num_merges=12).orderBy("rank").collect()]
    want, _, _ = _py_bpe([t for _, t in DOCS], 12)
    assert got == want
    assert len(got) >= 8  # the fixture really trains that deep


def test_bpe_overlap_semantics(spark):
    """'aaaa' under merge (a,a): non-overlapping left-to-right gives
    (aa)(aa), and 'aaa' gives (aa)a — the sequential-apply contract."""
    d = spark.createDataFrame([(0, "aaaa aaaa aaa")], "doc_id long, text string")
    m = bpe_train(d, num_merges=1).collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in m] == [("a", "a", 8)]
    enc = bpe_encode(d, bpe_train(d, num_merges=1)).collect()[0]
    # aaaa -> aa aa </w> = 3; aaaa -> 3; aaa -> aa a </w> = 3; total 9
    assert enc["n_tokens_bpe"] == 9


def test_bpe_encode_matches_python(docs, spark):
    merges = bpe_train(docs, num_merges=12)
    got = {r["id"]: r["n_tokens_bpe"] for r in bpe_encode(docs, merges).collect()}
    _, state, _ = _py_bpe([t for _, t in DOCS], 12)
    want = {
        i: sum(len(state[w]) for w in t.split(" ") if w) for i, t in DOCS
    }
    assert got == want


def test_bpe_on_real_corpus_deterministic(spark):
    """sf0.001 corpus: same merge table at different parallelism, and ranks
    have non-increasing counts (the greedy invariant)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = [tuple(r) for r in bpe_train(d, num_merges=8).orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_train(d.repartition(7), num_merges=8).orderBy("rank").collect()]
    assert a == b and len(a) == 8
    counts = [r[3] for r in a]
    assert counts == sorted(counts, reverse=True)
