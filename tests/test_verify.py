"""verify_text unit semantics: hash-proxy equality must behave like
column equality (NULL never equal), and verdict/score columns must be
identical to the string-comparison definition on every branch."""

import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.config import DEFAULT_CONFIG
from record_deduplication_spark.operators.verify import verify_text

SIGNED_COLS = ("clip_id string, transcript_norm string, sha_bytes string, "
               "pcm_fp long, shingle_hashes array<long>")


def _shingle_hashes(norm):
    """THE production kernel (operators/signatures.shingle_hash_set),
    not a test-local re-implementation that could drift beside it."""
    from record_deduplication_spark.operators.signatures import shingle_hash_set
    return shingle_hash_set(norm, DEFAULT_CONFIG.shingle_k)


def _signed(spark, rows):
    rows = [(*r, _shingle_hashes(r[1])) for r in rows]
    return spark.createDataFrame(rows, SIGNED_COLS)


def _cands(spark, rows):
    return spark.createDataFrame(rows, "id_1 string, id_2 string, "
                                       "sources array<string>")


def test_exact_requires_equal_sha_and_norm(spark):
    signed = _signed(spark, [
        ("a", "hello world", "S1", 1),
        ("b", "hello world", "S1", 2),     # same sha+norm as a -> exact
        ("c", "hello world", "S2", 3),     # different sha -> not exact
    ])
    cands = _cands(spark, [("a", "b", ["exact"]), ("a", "c", ["exact"])])
    out = {(r.id_1, r.id_2): r.verdict
           for r in verify_text(cands, signed, DEFAULT_CONFIG).collect()}
    assert out[("a", "b")] == "exact"
    assert out[("a", "c")] is None


def test_null_sha_never_exact(spark):
    """xxhash64(NULL) returns the seed, not NULL — the proxy must not
    let two null-sha rows compare equal (old `a = b` semantics)."""
    signed = _signed(spark, [
        ("a", "", None, 1),
        ("b", "", None, 2),
    ])
    cands = _cands(spark, [("a", "b", ["simhash"])])
    rows = verify_text(cands, signed, DEFAULT_CONFIG).collect()
    assert len(rows) == 1 and rows[0].verdict is None


def test_null_norm_never_exact_and_skips_jaccard(spark):
    signed = _signed(spark, [
        ("a", None, "S1", 1),
        ("b", None, "S1", 2),
    ])
    cands = _cands(spark, [("a", "b", ["lsh"])])
    rows = verify_text(cands, signed, DEFAULT_CONFIG).collect()
    assert len(rows) == 1
    assert rows[0].verdict is None and rows[0].jaccard is None


def test_null_sha_textish_pair_not_dropped(spark):
    """exact_ok is NULL when one sha is null; three-valued logic must
    not drop the pair from both the UDF and pass-through branches."""
    signed = _signed(spark, [
        ("a", "the quick brown fox jumps", None, 1),
        ("b", "the quick brown fox jumps", None, 2),
    ])
    cands = _cands(spark, [("a", "b", ["lsh"])])
    rows = verify_text(cands, signed, DEFAULT_CONFIG).collect()
    assert len(rows) == 1
    assert rows[0].verdict == "text"      # jaccard 1.0, not exact


def test_text_verdict_from_jaccard_on_textish_only(spark):
    signed = _signed(spark, [
        ("a", "the quick brown fox jumps", "S1", 1),
        ("b", "the quick brown fox jumps", "S2", 2),   # jaccard 1.0
        ("c", "entirely different words here", "S3", 3),
    ])
    cands = _cands(spark, [
        ("a", "b", ["lsh"]),          # textish -> jaccard -> text
        ("a", "c", ["lsh"]),          # textish, low jaccard -> undecided
        ("b", "c", ["simhash"]),      # not textish -> no jaccard at all
    ])
    out = {(r.id_1, r.id_2): r
           for r in verify_text(cands, signed, DEFAULT_CONFIG).collect()}
    assert out[("a", "b")].verdict == "text"
    assert out[("a", "b")].score == pytest.approx(1.0)
    assert out[("a", "c")].verdict is None
    assert out[("a", "c")].jaccard is not None      # computed, below thr
    assert out[("b", "c")].jaccard is None          # never computed
    # pending rows carry the audio-prefilter columns
    assert {"normh_1", "normh_2", "fp_1", "fp_2"} <= set(out[("b", "c")].asDict())
