"""Sequence packing + quality resampling semantics.

pack_sequences: GPT-style concat-and-chunk — documents laid end to end in
doc_id order, token stream cut every seq_len. Oracled two ways: a pure-Python
replay on synthetic docs, and DuckDB's single-window prefix sum on the
sf0.001 corpus (the Spark side uses the two-level scan, so agreement checks
the distributed prefix sum against the textbook one).

quality_resample: keep iff portable_hash64 mod 1e6 < round(q^alpha * 1e6) —
replayed exactly with the Python md5 twin.
"""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from avgdist_rs_spark.operators.pipeline import pack_sequences, quality_resample

SF = "/root/testdata/sf0.001"


def py_hash64(s: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


DOCS = [
    (0, "a b c d e"),          # 5 tokens
    (1, "f g h"),              # 3
    (2, "i"),                  # 1
    (3, "j k l m n o p q"),    # 8
    (4, "r s"),                # 2
]  # total 19 tokens


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _py_pack(doc_tokens, L):
    """Pure-Python replay of concat-and-chunk packing."""
    seqs = {}
    cum = 0
    for doc_id, n in doc_tokens:
        start, cum = cum, cum + n
        for s in range(start // L, (cum - 1) // L + 1):
            fill = min(cum, (s + 1) * L) - max(start, s * L)
            e = seqs.setdefault(s, [0, 0, doc_id, doc_id])
            e[0] += 1
            e[1] += fill
            e[3] = doc_id
    return {
        s: (nd, nt, fd, ld) for s, (nd, nt, fd, ld) in seqs.items()
    }


def test_pack_sequences_small(docs):
    got = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in pack_sequences(docs, seq_len=4).collect()
    }
    want = _py_pack([(i, len(t.split(" "))) for i, t in DOCS], 4)
    assert got == want
    # conservation + fullness invariants
    assert sum(v[1] for v in got.values()) == 19
    last = max(got)
    assert all(got[s][1] == 4 for s in got if s != last)


def test_pack_sequences_bucket_width_invariant(docs):
    """The two-level scan must give identical manifests no matter how the id
    space is bucketed (bucket_width=2 forces multi-bucket offsets)."""
    a = sorted(pack_sequences(docs, seq_len=4, bucket_width=2).collect())
    b = sorted(pack_sequences(docs, seq_len=4, bucket_width=1 << 20).collect())
    assert a == b


def test_pack_sequences_vs_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in pack_sequences(docs, seq_len=256).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH t AS (
              SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n,
                     sum(len(string_split(text, ' '))::BIGINT)
                       OVER (ORDER BY doc_id) AS cum
              FROM '{SF}/documents.parquet'
            ),
            s AS (
              SELECT doc_id, n, cum, cum - n AS start,
                     unnest(generate_series(((cum - n) // 256)::BIGINT,
                                            ((cum - 1) // 256)::BIGINT))
                       AS seq_id
              FROM t WHERE n > 0
            )
            SELECT seq_id, count(*)::BIGINT AS n_docs,
                   sum(least(cum, (seq_id + 1) * 256)
                       - greatest(start, seq_id * 256))::BIGINT AS n_tokens,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM s GROUP BY seq_id ORDER BY seq_id
            """
        ).fetchall()
    )
    assert got == want


def test_quality_resample_exact_replay(spark):
    from avgdist_rs_spark.operators.textstats import quality_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    alpha = 2
    got = {r["doc_id"]: (r["quality"], r["p_keep"])
           for r in quality_resample(docs, alpha=alpha).collect()}
    q = {r["id"]: r["quality"] for r in quality_score(docs).collect()}
    want = {}
    for doc_id, qv in q.items():
        p = qv * qv
        if py_hash64(str(doc_id), "resample:") % 1_000_000 < round(p * 1_000_000):
            want[doc_id] = (qv, round(p, 6))
    assert got == want
    assert 0 < len(got) < len(q)  # really a resample, not all/none


def test_quality_resample_alpha_sharpness(spark):
    """Higher alpha keeps fewer docs and the kept set is biased upward."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k1 = quality_resample(docs, alpha=1).count()
    k3 = quality_resample(docs, alpha=3).count()
    assert k3 < k1
    with pytest.raises(ValueError):
        quality_resample(docs, alpha=0)
