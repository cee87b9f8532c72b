"""Text-analysis operators over a documents table: stats, quality scoring,
language-ID heuristic, token counting, fingerprinting.

All pure DataFrame/Catalyst expressions (no Python UDFs): at 100 TB these
run entirely inside WholeStageCodegen on the scan's column-pruned output,
shuffle only for the final aggregate-free projections (i.e. not at all),
and push filters down to parquet/Iceberg.  Every query has a DuckDB oracle
in __spark_entry__.py computing the same formula.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import (
    bpe_ish_count,
    char_shingles,
    token_count,
    tokens,
)

# Tiny deterministic stopword lists (shared with the SQL oracles verbatim).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "mit", "für", "ist", "ein", "nicht", "von"),
    "fr": ("le", "la", "les", "des", "une", "pour", "dans", "est", "que", "et"),
    "es": ("el", "la", "los", "para", "con", "una", "es", "que", "de", "no"),
}


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-document surface statistics."""
    text = F.col("text")
    tok = tokens(text)
    return documents.select(
        "doc_id",
        F.length(text).alias("char_len"),
        token_count(text).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
        bpe_ish_count(text).alias("n_bpe_tokens"),
        F.round(
            F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.length(text), 6
        ).alias("alpha_ratio"),
        F.aggregate(
            tok, F.lit(0), lambda acc, w: F.greatest(acc, F.length(w))
        ).alias("max_token_len"),
    )


def doc_quality(documents: DataFrame, min_score: float | None = None) -> DataFrame:
    """Composite quality score in [0,1]: length saturation, lexical
    diversity, alphabetic density — the standard cheap pre-filter trio for
    training-data pipelines.

    Degenerate documents (zero tokens / zero length) get NULL scores and
    are KEPT unless ``min_score`` is set — dropping rows silently is the
    job of an explicit filter, never of a scoring operator."""
    text = F.col("text")
    tok = tokens(text)
    n_tok = token_count(text).cast("double")
    guarded = lambda c: F.when((n_tok > 0) & (F.length(text) > 0), c)  # noqa: E731
    distinct_ratio = guarded(F.size(F.array_distinct(tok)) / n_tok)
    alpha_ratio = guarded(
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.length(text)
    )
    length_sat = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    score = F.round(0.3 * length_sat + 0.3 * distinct_ratio + 0.4 * alpha_ratio, 6)
    out = documents.select(
        "doc_id",
        score.alias("quality"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
    )
    if min_score is not None:
        out = out.filter(F.col("quality") >= min_score)
    return out


def doc_langid(documents: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic.

    Emits per-language hit counts and the argmax guess ('und' when no list
    scores > 0).  Ties broken by fixed language order en > de > fr > es —
    the same CASE order the oracle uses."""
    tok = tokens(F.col("text"))
    hits = {
        lang: F.size(
            F.filter(tok, lambda w: w.isin(*STOPWORDS[lang]))  # noqa: B023
        ).alias(f"{lang}_hits")
        for lang in STOPWORDS
    }
    df = documents.select("doc_id", *hits.values())
    best = F.greatest(*[F.col(f"{lang}_hits") for lang in STOPWORDS])
    guess = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):
        guess = guess.when(F.col(f"{lang}_hits") == best, F.lit(lang))
    return df.withColumn("lang_guess", guess)


def doc_fingerprint(documents: DataFrame, shingle_k: int = 16) -> DataFrame:
    """Document fingerprints: winnowing-lite min/max over char-k-gram md5s
    plus a 16-bit SimHash over distinct tokens.

    SimHash bit b (0..15) comes from nibble ``b // 4`` of each token's md5
    (hex chars 1-4), bit ``b % 4``; the bit contributes +1/-1 and the
    fingerprint sets bit b when the sum is strictly positive."""
    sh = char_shingles(F.col("text"), shingle_k)
    fps = documents.select(
        "doc_id",
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_fp"),
        F.array_max(F.transform(sh, F.md5)).alias("max_shingle_fp"),
    )
    sim = simhash16(documents)
    return fps.join(sim, "doc_id")


def simhash16(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) with a 16-bit simhash over distinct tokens."""
    toks = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )
    # SQL expr because substring/shiftleft need Column-typed positions here;
    # the DuckDB oracle computes the same strpos/nibble arithmetic.
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
        F.md5("token").alias("h"),
    ).select(
        "doc_id",
        "b",
        F.expr(
            "case when (cast(conv(substring(h, cast(b / 4 as int) + 1, 1), 16, 10) as int)"
            " & shiftleft(1, b % 4)) > 0 then 1 else -1 end"
        ).alias("vote"),
    )
    per_bit = bits.groupBy("doc_id", "b").agg(F.sum("vote").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.expr(
            "cast(sum(case when s > 0 then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end) as bigint)"
        ).alias("simhash")
    )
