"""Text-analysis operators for a training-data pipeline.

First-class components beyond the reference's inventory (per the build
brief): language-ID (character n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + a
BPE-ish regex), and document fingerprinting (rolling hash). All are
built-in column expressions where possible; the n-gram language scorer
is a single vectorized pandas_udf.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny character-trigram profiles per language (deterministic, public
# knowledge: characteristic function words). Good enough as a heuristic
# scorer — the point is the Spark-side shape (vectorized scoring UDF).
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "is ", " of", "to "),
    "de": ("der", "die", "und", "sch", "ein", "ich", "en "),
    "fr": ("les", "ent", "de ", "ion", "que", "eur", " le"),
    "es": ("de ", "que", "los", "ión", "ent", " la", "ado"),
    "zh": (),  # CJK handled by codepoint-range ratio below
}

_BPE_ISH = re.compile(r"\w+|[^\w\s]")  # word-or-punct tokens (GPT-2-style coarse split)


def lang_id_udf():
    """text -> best-guess language code by trigram-profile hit rate +
    CJK codepoint ratio."""

    @F.pandas_udf(T.StringType())
    def _lang(s: pd.Series) -> pd.Series:
        out = []
        for txt in s:
            t = (txt or "").lower()
            if not t:
                out.append("und")
                continue
            cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
            if cjk / max(len(t), 1) > 0.2:
                out.append("zh")
                continue
            best, best_score = "und", 0.0
            for lang, tris in _LANG_PROFILES.items():
                if not tris:
                    continue
                score = sum(t.count(tri) for tri in tris) / max(len(t), 1)
                if score > best_score:
                    best, best_score = lang, score
            out.append(best)
        return pd.Series(out)
    return _lang


def bpe_ish_token_count_udf():
    @F.pandas_udf(T.IntegerType())
    def _cnt(s: pd.Series) -> pd.Series:
        return pd.Series([len(_BPE_ISH.findall(t or "")) for t in s], dtype="int32")
    return _cnt


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-expression quality features (whole-stage-codegen'd):
    whitespace token count, char count, punct ratio, stopword-ish
    ratio, mean word length — plus the UDF-backed BPE-ish count and
    language guess."""
    c = F.col(text_col)
    words = F.split(c, " ")
    stop = F.array([F.lit(w) for w in
                    ("the", "a", "and", "of", "to", "in", "is", "on")])
    n_words = F.size(words)
    return (df
            .withColumn("n_chars_calc", F.length(c))
            .withColumn("n_tokens_ws", n_words)
            .withColumn("n_tokens_bpe", bpe_ish_token_count_udf()(c))
            .withColumn("punct_ratio",
                        F.round(F.length(F.regexp_replace(c, r"[\w\s]+", "")) /
                                F.greatest(F.length(c), F.lit(1)), 6))
            .withColumn("stopword_ratio",
                        F.round(F.size(F.array_intersect(words, stop)) /
                                F.greatest(n_words, F.lit(1)), 6))
            .withColumn("mean_word_len",
                        F.round((F.length(F.regexp_replace(c, r"\s+", "")) /
                                 F.greatest(n_words, F.lit(1))), 6))
            .withColumn("quality_score",
                        F.round(
                            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
                            + (1 - F.col("punct_ratio")) * 0.3
                            + F.least(F.col("mean_word_len") / F.lit(8.0), F.lit(1.0)) * 0.3,
                            6))
            .withColumn("lang_guess", lang_id_udf()(c)))


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        out_col: str = "fingerprint") -> DataFrame:
    """Polynomial rolling hash over words mod 1e9+7 — pure `aggregate`
    expression (exact integer math, no UDF)."""
    return df.withColumn(
        out_col,
        F.expr(f"""
            aggregate(
              transform(split({text_col}, ' '),
                        x -> CAST(conv(substr(md5(CAST(x AS BINARY)),1,15),16,10) AS BIGINT) % 1000000007),
              CAST(0 AS BIGINT),
              (acc, x) -> (acc * 131 + x) % 1000000007)
        """))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction, duplicate-n-gram fraction, and the share of the single
    most frequent n-gram (Rae et al. 2021 use these to drop boiler-
    plate/spam before training).

    Scale shape: grams are xxhash64'd in a codegen expression before
    the explode, so the groupBy shuffles (id, 8-byte hash) — never the
    text; both aggregations are partial-agg friendly HashAggregates.
    Documents shorter than n tokens are omitted (nothing to repeat).
    Returns (id, n_tokens, dup_word_fraction, n_grams,
    dup_ngram_fraction, top_ngram_share).
    """
    from .decontaminate import _gram_terms
    terms = _gram_terms(n)
    grams = F.expr(
        f"CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(0, size(w) - {n}), "
        f"i -> xxhash64(concat_ws(' ', {terms}))) ELSE array() END")
    toks = (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.split(F.col(text_col), " ").alias("w")))
    word = toks.select(
        id_col, F.size("w").alias("n_tokens"),
        F.round((F.size("w") - F.size(F.array_distinct("w"))) /
                F.size("w"), 6).alias("dup_word_fraction"))
    per_gram = (toks.select(id_col, F.explode(grams).alias("gh"))
                .groupBy(id_col, "gh").agg(F.count("*").alias("c")))
    gram_agg = (per_gram.groupBy(id_col)
                .agg(F.sum("c").alias("n_grams"),
                     F.count("*").alias("n_distinct"),
                     F.max("c").alias("max_c"))
                .select(id_col, F.col("n_grams"),
                        F.round((F.col("n_grams") - F.col("n_distinct")) /
                                F.col("n_grams"), 6).alias("dup_ngram_fraction"),
                        F.round(F.col("max_c") / F.col("n_grams"), 6)
                        .alias("top_ngram_share")))
    return word.join(gram_agg, id_col)


# PII scrub patterns (kept RE2-compatible — no backreferences or
# lookaround — so the DuckDB gate twin can run the identical regexes)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    "phone": r"\+\d[\d ]{5,}\d",
}


def pii_redact(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone numbers from a text column —
    the standard pre-training scrub. Pure codegen expressions
    (regexp_count + chained regexp_replace), no UDF; emails are
    replaced first so an address's host part is never half-eaten by
    the IP pattern. Returns (id, redacted, n_emails, n_ips, n_phones).
    """
    c = F.col(text_col)
    counts = [F.regexp_count(c, F.lit(p)).alias(f"n_{k}s")
              for k, p in PII_PATTERNS.items()]
    red = c
    for k, p in PII_PATTERNS.items():
        red = F.regexp_replace(red, p, f"<{k.upper()}>")
    return df.select(F.col(id_col), red.alias("redacted"), *counts)
