"""Training-data decontamination: eval-set n-gram overlap over a documents
table (the GPT-3 appendix-C / open-LM-suite method, public: flag any training
document sharing a word k-gram with a held-out evaluation set).

Two pieces, both pure DataFrame plans:

- :func:`eval_split` — a deterministic, engine-portable eval subset: the doc
  ids whose md5 hash lands in one bucket of ``mod`` (the same portable-hash
  projection :mod:`..operators.pipeline` uses for stratified sampling), so
  ANY engine — and the DuckDB oracle — selects the identical split with no
  seed state.
- :func:`contamination` — per TRAINING document (everything outside the eval
  split): total distinct word k-grams, how many also occur anywhere in the
  eval set, the contaminated fraction, and the drop flag.

Scale shape (the 100 TB story): the eval side is tiny by construction
(benchmarks are a few thousand documents against a multi-billion-document
corpus), so its distinct gram-hash set is **broadcast** — the training
corpus is never shuffled at all: grams explode on the scan, the broadcast
hash join filters map-side, and the single exchange is the per-doc count
groupBy keyed on id (map-side combinable). No sort, no repartition of the
big side. ``contaminated`` uses set semantics (distinct grams), matching the
published method; docs shorter than k words have zero grams and report
``n_grams = 0, contam_frac = 0`` (mirrored in the oracle).

Reference seed: the reference engine has no corpus operators — this extends
the pipeline family the same way dedup/ANN do (studied the reference for
graph semantics only; this operator is from the public decontamination
literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def eval_split(
    docs: DataFrame, mod: int = 20, bucket: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic held-out split: rows with h(id) ≡ bucket (mod mod).

    Pure hash projection — no shuffle, no RNG, replayable by any engine.
    """
    if not 0 <= bucket < mod:
        raise ValueError(f"bucket {bucket} outside [0, {mod})")
    h = F.pmod(portable_hash64(F.col(id_col).cast("string"), salt="eval:"), F.lit(mod))
    return docs.where(h == bucket)


def contamination(
    docs: DataFrame,
    k: int = 5,
    mod: int = 20,
    bucket: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, n_hit, contam_frac, contaminated) for every TRAINING doc.

    A training doc is contaminated iff any of its distinct word k-grams occurs
    in any eval-split document. ``contam_frac`` = n_hit / n_grams (0 when the
    doc has no k-gram at all).
    """
    from .dedup import word_shingles

    h = F.pmod(portable_hash64(F.col(id_col).cast("string"), salt="eval:"), F.lit(mod))
    train = docs.where(h != bucket)
    ev = eval_split(docs, mod, bucket, id_col)

    gram_h = portable_hash64(F.col("shingle"), salt="dc:")
    # distinct eval gram hashes: the small, broadcast side
    ev_grams = (
        word_shingles(ev, k, id_col, text_col, distinct=False)
        .select(gram_h.alias("gh"))
        .distinct()
    )
    tr_grams = word_shingles(train, k, id_col, text_col, distinct=True).select(
        "id", gram_h.alias("gh")
    )
    hits = tr_grams.join(
        F.broadcast(ev_grams.withColumn("hit", F.lit(1))), "gh", "left"
    )
    per_doc = hits.groupBy("id").agg(
        F.count("*").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
    )
    # keep zero-gram training docs (shorter than k words) in the report
    out = (
        train.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, F.round(F.col("n_hit") / F.col("n_grams"), 6)
    ).otherwise(F.lit(0.0))
    return out.select(
        "id",
        "n_grams",
        "n_hit",
        frac.alias("contam_frac"),
        (F.col("n_hit") > 0).alias("contaminated"),
    )
