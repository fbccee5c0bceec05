"""Train/eval n-gram decontamination (GPT-3/PaLM-style overlap scan).

A training-data-pipeline extra (no analog in the reference repo, whose
scope is CRM record dedup): flag evaluation documents that share any
word n-gram with the training corpus, so benchmark rows that leaked
into the training set can be measured and removed.

Scale design (the 100 TB shape):
- Gram construction is a pure codegen expression (split + sequence +
  transform + xxhash64 + explode); TEXT NEVER SHUFFLES — the text
  column is projected away before the explode, so the only shuffled
  rows are (id, 8-byte hash).
- Both sides reduce to DISTINCT hash sets before the join (map-side
  partial aggregation), and the join is a plain hash equi-join on a
  64-bit key — AQE handles skew, and Spark's runtime bloom-filter
  injection (spark.sql.optimizer.runtime.bloomFilter.enabled) can
  prune eval grams against the train side before the shuffle.
- The eval side is normally tiny (benchmarks, not corpora): when
  `broadcast_eval=True` the contaminated-id set is broadcast for the
  final anti-join instead of shuffling the full corpus.

Gate twin: `ngram_decontamination` in analysis/gate_queries.py runs
the same dataflow as paired Spark/DuckDB SQL on planted contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_terms(n: int) -> str:
    """Codegen term list for an n-token gram at 0-based offset i
    (generated from n so the term list cannot desync from the bounds —
    the latent-constant pattern flagged in ADVICE r2)."""
    return ", ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))


def ngram_hash_profile(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 8,
                       out_col: str = "gram_hash") -> DataFrame:
    """Distinct word-n-gram profile: one row per (id, xxhash64(gram)).

    Whole-stage-codegen expression end-to-end; documents shorter than
    n tokens produce no rows. The projection keeps only (id, hash), so
    downstream shuffles move 16 bytes/row regardless of document size.
    """
    grams = F.expr(
        f"CASE WHEN size(w) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(w) - {n}), "
        f"i -> xxhash64(concat_ws(' ', {_gram_terms(n)})))) "
        f"ELSE array() END")
    return (df
            .where(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.split(F.col(text_col), " ").alias("w"))
            .select(F.col(id_col), F.explode(grams).alias(out_col)))


def contamination_report(train: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 8) -> DataFrame:
    """Per eval document: total distinct n-grams, how many also occur
    anywhere in `train`, and the contaminated fraction.

    Returns (id_col, n_grams, n_contaminated, contamination_ratio),
    one row per eval doc with >= 1 gram (shorter docs have nothing to
    leak and are trivially clean). Join is hash-on-hash only.
    """
    trg = (ngram_hash_profile(train, id_col, text_col, n)
           .select("gram_hash").distinct()
           .withColumn("_hit", F.lit(1)))
    evg = ngram_hash_profile(eval_df, id_col, text_col, n)
    return (evg.join(trg, "gram_hash", "left")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.count("_hit").alias("n_contaminated"))
            .withColumn("contamination_ratio",
                        F.round(F.col("n_contaminated") / F.col("n_grams"), 6)))


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, max_ratio: float = 0.0,
                  broadcast_eval: bool = True) -> DataFrame:
    """Drop eval documents whose contaminated-gram fraction exceeds
    `max_ratio` (0.0 = any single shared n-gram disqualifies).

    The dropped-id set is at most |eval| rows; with `broadcast_eval`
    it is broadcast for the anti-join so the eval table itself is
    never shuffled.
    """
    # compare on exact integers, NOT the report's display-rounded
    # ratio: a ~2M-gram document sharing one gram rounds to 0.000000,
    # which would silently survive strict mode (max_ratio=0.0)
    bad = (contamination_report(train, eval_df, id_col, text_col, n)
           .where(F.col("n_contaminated") > max_ratio * F.col("n_grams"))
           .select(id_col))
    if broadcast_eval:
        bad = F.broadcast(bad)
    return eval_df.join(bad, id_col, "left_anti")
