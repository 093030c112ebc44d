"""End-to-end training-set selection: the dedup/quality family acting as ONE
pipeline — what a 100 TB corpus actually runs before tokenization.

Composes the per-operator stages (each independently driver-oracled) into the
canonical decision sequence:

1. **exact dedup** — one hash-shuffle groupBy on the md5 content key; only
   the min-id survivor of each identical text proceeds (``dedup.exact_dedup``
   semantics).
2. **near-dup collapse** — MinHash-LSH pair graph over the survivors →
   connected components → keep only each group's canonical (min-id) doc
   (``dedup.dedup_groups``): transitive A≈B≈C chains collapse to one
   document, never two of three.
3. **quality + language gates** — stopword-heuristic language ID and the
   three-gate quality score (``textstats``), filtering to the target language
   above a quality floor.

Output: one row per SELECTED document — (doc_id, lang_pred, quality,
n_tokens) — the training-set manifest a downstream tokenizer consumes.

Scale shape: every stage is the already-audited scale path — content-key
groupBy (map-side combinable), band-bucket LSH join (never all-pairs),
pointer-jumping components over the (tiny) duplicate-pair graph, and pure
column expressions for the gates. The stages compose as DataFrame plans;
nothing materializes driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_groups
from .textstats import lang_id, quality_score


def corpus_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-language corpus rollup — the monitoring aggregate a pipeline runs
    next to every selection job: (lang_pred, n_docs, total_tokens,
    mean_quality, median_tokens, p90_tokens).

    Pure two-level aggregation (per-doc stats → one groupBy on the language
    key): map-side combinable, one exchange of per-doc skinny rows, exact
    interpolated percentiles (``percentile`` ≡ DuckDB ``quantile_cont``)."""
    from .textstats import lang_id, quality_score

    li = lang_id(docs, id_col, text_col).select("id", "lang_pred")
    qs = quality_score(docs, id_col, text_col).select("id", "n_tokens", "quality")
    return (
        li.join(qs, "id")
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
            F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("median_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.9)"), 6).alias("p90_tokens"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "strat:",
) -> DataFrame:
    """Deterministic per-language sample — the training-mix primitive
    (up/down-weighting strata when composing a corpus).

    A doc with language L is kept iff
    ``portable_hash64(salt || id) mod 1_000_000 < fractions[L] · 1_000_000``
    — a pure projection + filter (no shuffle, no RNG state), reproducible by
    ANY engine with md5, so the sample itself is oracle-verifiable. Strata
    absent from ``fractions`` are dropped. Returns (doc_id, lang_pred).
    """
    from ..functions.hashing import portable_hash64
    from .textstats import lang_id

    li = lang_id(docs, id_col, text_col).select(
        F.col("id").alias(id_col), "lang_pred"
    )
    h = portable_hash64(F.col(id_col).cast("string"), salt=salt)
    bucket = F.pmod(h, F.lit(1_000_000))
    thr = None
    for lang, frac in sorted(fractions.items()):
        cond = (F.col("lang_pred") == lang) & (bucket < int(round(frac * 1_000_000)))
        thr = cond if thr is None else (thr | cond)
    if thr is None:
        raise ValueError("fractions must name at least one stratum")
    return li.where(thr).select(id_col, "lang_pred")


def training_set_select(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.6,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang_pred, quality, n_tokens) for every selected document."""
    # 1. exact dedup: min-id survivor per identical text
    keys = docs.groupBy(F.md5(F.col(text_col)).alias("_ck")).agg(
        F.min(F.col(id_col)).alias(id_col)
    )
    survivors = docs.join(keys.select(id_col), id_col)

    # 2. near-dup collapse among survivors: canonical = its group's min id.
    # The pair graph only ever links survivor ids, so a survivor's component
    # min is itself a survivor — the join below needs no extra filtering.
    groups = dedup_groups(
        survivors, num_hashes, bands, k, threshold, id_col, text_col
    )
    canonical = survivors.join(
        groups.where(F.col(id_col) == F.col("keep_id")).select(id_col), id_col
    )

    # 3. language + quality gates on the canonical set
    li = lang_id(canonical, id_col, text_col).select(
        F.col("id").alias(id_col), "lang_pred"
    )
    qs = quality_score(canonical, id_col, text_col).select(
        F.col("id").alias(id_col), "quality", "n_tokens"
    )
    return (
        li.join(qs, id_col)
        .where((F.col("lang_pred") == lang) & (F.col("quality") >= min_quality))
        .select(id_col, "lang_pred", "quality", "n_tokens")
    )
