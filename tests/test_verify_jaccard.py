"""Pair-for-pair equality of the JVM-codegen exact Jaccard
(operators/verify.jaccard_expr over SIGNED_SCHEMA.shingle_hashes)
with the Python string-set kernel (functions/text.jaccard over
functions/text.shingles) it replaced in round 4 (VERDICT r3 #4).

The values must be EXACTLY equal, not approximately: both sides
compute the same integer intersection/union sizes (the hash is
injective on every shingle set that appears here — a 2^-64 collision
is the only divergence source) and one IEEE double division.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.config import DEFAULT_CONFIG
from record_deduplication_spark.functions import text as X
from record_deduplication_spark.operators.verify import jaccard_expr

K = DEFAULT_CONFIG.shingle_k


def _texts(n=120, seed=7):
    """Deterministic mix: exact dups, near-dups (insert/delete/replace),
    disjoint docs, short docs (< k tokens), and empty docs."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(n):
        m = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(vocab, size=m)) if m else "")
    # planted near-dups of the first 20
    for i in range(20):
        toks = texts[i].split()
        if toks:
            j = int(rng.integers(0, len(toks)))
            toks[j] = "edited"
        texts.append(" ".join(toks))
    return texts


def _sh_hashes(norm):
    """THE production kernel shared with _sign_batch — so the equality
    below pins the pipeline's stored representation, not a test-local
    re-implementation that could drift beside it."""
    from record_deduplication_spark.operators.signatures import shingle_hash_set
    return shingle_hash_set(norm, K)


def test_jvm_jaccard_equals_python_kernel_exactly(spark):
    texts = [X.normalize_text(t) for t in _texts()]
    n = len(texts)
    rows = [(i, texts[i], _sh_hashes(texts[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, norm string, sh array<long>")
    a = df.select(F.col("id").alias("id_1"), F.col("sh").alias("sh_1"))
    b = df.select(F.col("id").alias("id_2"), F.col("sh").alias("sh_2"))
    # all i<j pairs of a 140-doc corpus: ~9.7k pairs, covers
    # empty-vs-empty, empty-vs-full, short-doc single shingles
    got = {(r.id_1, r.id_2): r.j for r in
           (a.crossJoin(b).where(F.col("id_1") < F.col("id_2"))
            .select("id_1", "id_2",
                    jaccard_expr(F.col("sh_1"), F.col("sh_2")).alias("j"))
            .collect())}
    assert len(got) == n * (n - 1) // 2
    mism = []
    for i in range(n):
        si = set(X.shingles(X.tokenize(texts[i]), K))
        for j in range(i + 1, n):
            sj = set(X.shingles(X.tokenize(texts[j]), K))
            want = X.jaccard(si, sj)
            if got[(i, j)] != want:
                mism.append((i, j, got[(i, j)], want))
    assert not mism, f"first mismatches: {mism[:5]}"


def test_jaccard_expr_both_empty_is_zero(spark):
    df = spark.createDataFrame(
        [([], []), ([1], []), ([], [1]), ([1, 2], [2, 3])],
        "a array<long>, b array<long>")
    vals = [r.j for r in
            df.select(jaccard_expr(F.col("a"), F.col("b")).alias("j"))
            .collect()]
    assert vals == [0.0, 0.0, 0.0, pytest.approx(1 / 3)]


def test_edges_stage_has_no_python_in_jaccard_plan(spark, monkeypatch):
    """The textish-verify plan up to and including the Jaccard verdict
    must contain no ArrowEvalPython / BatchEvalPython node: Jaccard is
    JVM codegen. The mid-stage checkpoint is bypassed (env toggle, the
    same one jobs/edges_ab.py uses) so the REAL pre-materialization
    plan — not a checkpoint scan — is what the assertion reads; the
    suffix-array UDF applies only to the post-threshold undecided
    subset (the verdict='text' filter prunes that union branch),
    exercised elsewhere."""
    monkeypatch.setenv("SPARK_GRAFT_VERIFY_TEXT_NO_CHECKPOINT", "1")
    from record_deduplication_spark.operators.verify import verify_text
    base = " ".join(f"tok{i}" for i in range(40))
    texts = [base + " dog", base + " cat"]   # jaccard 38/42 ~ 0.905 >= 0.80
    signed = spark.createDataFrame(
        [(str(i), t, f"S{i}", i, _sh_hashes(t))
         for i, t in enumerate(texts)],
        "clip_id string, transcript_norm string, sha_bytes string, "
        "pcm_fp long, shingle_hashes array<long>")
    cands = spark.createDataFrame([("0", "1", ["lsh"])],
                                  "id_1 string, id_2 string, "
                                  "sources array<string>")
    out = verify_text(cands, signed, DEFAULT_CONFIG)
    decided = out.where(F.col("verdict") == "text")
    assert [r.verdict for r in decided.collect()] == ["text"]
    plan = decided._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
