"""Text-analysis operators for training-data pipelines over a documents table.

Language ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting — all pure built-in column expressions (codegen'd,
no UDFs) and all exactly mirrored by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

#: tiny public stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "de": ["der", "die", "und", "das", "in", "zu", "den", "mit", "von", "ist"],
}


def _words(text_col) -> F.Column:
    return F.split(text_col, " ")


#: BPE-ish tokenizer regex: alnum runs + single non-alnum-non-space marks —
#: the usual pre-tokenization shape; dialect-neutral (identical in Java regex
#: and DuckDB RE2, verified)
BPE_ISH_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_distinct_tokens, n_chars, n_bpe_ish) — whitespace
    tokenization plus a BPE-ish regex count (subword-cost proxy)."""
    w = _words(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(
            F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0)")
        ).alias("n_bpe_ish"),
    )


def _stopword_hits(text_col, lang: str) -> F.Column:
    """Count of words in the given language's stopword list."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(_words(text_col), lambda x: F.array_contains(sw, x)))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_pred, hit_ratio) — argmax stopword-hit ratio, tie → 'und'.

    Heuristic language ID: score(L) = stopword hits for L / tokens; prediction
    is the language with the strictly highest score, 'und' when all are zero
    (ties broken by language code ascending).
    """
    t = F.col(text_col)
    n = F.size(_words(t))
    langs = sorted(STOPWORDS)
    scored = docs.select(
        F.col(id_col).alias("id"),
        *[( _stopword_hits(t, L) / n).alias(f"sc_{L}") for L in langs],
    )
    best_score = F.greatest(*[F.col(f"sc_{L}") for L in langs])
    pred = F.lit("und")
    for L in reversed(langs):  # ascending tie-break: earlier lang wins via last when()
        pred = F.when((F.col(f"sc_{L}") == best_score) & (best_score > 0), F.lit(L)).otherwise(pred)
    return scored.select("id", pred.alias("lang_pred"), F.round(best_score, 6).alias("hit_ratio"))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, mean_token_len, distinct_ratio, quality) ∈ [0,1].

    Heuristic quality = mean of three gates a filtering pipeline typically
    applies: length-in-range, mean-token-length-in-range, lexical diversity.
    """
    w = _words(F.col(text_col))
    n = F.size(w)
    mean_len = (F.length(F.col(text_col)) - (n - 1)) / n  # chars minus separators
    distinct_ratio = F.size(F.array_distinct(w)) / n
    g_len = F.when((n >= 5) & (n <= 1000), 1.0).otherwise(0.0)
    g_tok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 1.0).otherwise(0.0)
    g_div = F.when(distinct_ratio >= 0.3, 1.0).otherwise(0.0)
    return docs.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round((g_len + g_tok + g_div) / 3.0, 6).alias("quality"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, dup_word_frac, top_bigram_frac, dup_trigram_frac,
    repetitive) — within-document repetition signals, the Gopher-style
    repetition filters (Rae et al. 2021, public method) re-expressed over a
    whitespace token stream (this corpus has no newlines, so the line-based
    rules become word-n-gram rules):

    - ``dup_word_frac``      = 1 − distinct words / total words (within-row,
      pure column expression — no shuffle at all for this signal),
    - ``top_bigram_frac``    = occurrences of the most frequent word 2-gram
      / total 2-gram occurrences,
    - ``dup_trigram_frac``   = fraction of word-3-gram occurrences whose gram
      appears more than once,
    - ``repetitive``         = any signal past its published-style threshold
      (0.3 / 0.18 / 0.18).

    Scale shape: the n-gram signals are ONE explode + two groupBys keyed
    (id, gram) then (id) — both map-side combinable, both partitioned by the
    same leading key, no data-dependent fan-out beyond the explode itself.
    Docs shorter than the gram width contribute zero occurrences and get
    frac = 0 via the left join (mirrored in the oracle).
    """
    from .dedup import word_shingles

    w = _words(F.col(text_col))
    n = F.size(w)
    base = docs.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_words"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(w)) / n, 6).alias(
            "dup_word_frac"
        ),
    )

    def _gram_agg(k: int, top: bool) -> DataFrame:
        counts = (
            word_shingles(docs, k, id_col, text_col, distinct=False)
            .groupBy("id", "shingle")
            .agg(F.count("*").alias("cnt"))
        )
        num = F.max("cnt") if top else F.sum(F.when(F.col("cnt") > 1, F.col("cnt")))
        return counts.groupBy("id").agg(
            F.round(F.coalesce(num, F.lit(0)) / F.sum("cnt"), 6).alias(
                f"g{k}_frac"
            )
        )

    out = (
        base.join(_gram_agg(2, top=True), "id", "left")
        .join(_gram_agg(3, top=False), "id", "left")
        .select(
            "id",
            "n_words",
            "dup_word_frac",
            F.coalesce(F.col("g2_frac"), F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce(F.col("g3_frac"), F.lit(0.0)).alias("dup_trigram_frac"),
        )
    )
    return out.withColumn(
        "repetitive",
        (
            (F.col("dup_word_frac") > 0.3)
            | (F.col("top_bigram_frac") > 0.18)
            | (F.col("dup_trigram_frac") > 0.18)
        ).cast("boolean"),
    )


def fingerprint(
    docs: DataFrame, k: int = 4, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp) — rolling-hash document fingerprint: min portable hash over the
    doc's word k-grams (winnowing's bottom-1 sketch; equal texts ⇒ equal fp,
    near-equal texts ⇒ equal with prob ≈ overlap)."""
    from .dedup import word_shingles

    sh = word_shingles(docs, k, id_col, text_col)
    return sh.groupBy("id").agg(
        F.min(portable_hash64(F.col("shingle"), salt="fp:")).alias("fp")
    )
