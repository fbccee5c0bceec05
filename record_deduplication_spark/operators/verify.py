"""Pairwise verification of candidate pairs -> dup edges.

Reference analog: the similarity stage F1-F4
(/root/reference/src/core/similarity_engine.py:76-121) + the
high-confidence filter M4 (/root/reference/src/core/model_engine.py:259).
Criteria here are the north rule's:

  exact      sha256(bytes) equal AND transcript_norm equal
  text       exact shingle-Jaccard >= cfg.jaccard_threshold
  substring  shared contiguous token run >= L (suffix-array verified)
  audio      fingerprint Hamming <= k AND transcript_norm equal AND
             decoded-PCM allclose at SNR >= cfg.snr_db_min  (per-row
             invariant, BASELINE.json input_hint)

Exact shingle Jaccard is pure JVM codegen over the distinct
shingle-hash arrays carried from the signature scan (no Python at all
in the stage's largest kernel). The remaining Python is vectorized
`pandas_udf` (suffix-array runs, on the small undecided subset only)
or `mapInPandas` (audio — batch-iterates the re-joined binary payloads
of the few surviving candidates; bytes never enter a groupBy/window).

Plan shape: the expensive suffix-array UDF runs only on the row subset
that still needs it (cheap criteria first, then filter+union — NOT a
`when` branch, which would evaluate the UDF over every row of the
batch). UDF stages run on the partitioning the preceding equi-joins
already produced (hash by join key, shuffle_partitions-wide) — no
extra round-robin repartition shuffles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions import audio as A
from ..functions import text as X
from ..functions.suffix_array import longest_common_run

# survivor-id count per In-predicate for the audio payload fetch
# (parquet scan pruning); see verify_audio.
# Capped at 1k: codegen splits a giant In-predicate into thousands of
# chained helper methods and the task thread overflows its stack
# (observed as flaky scala.MatchError(StackOverflowError) at ~5-10k
# literals). Larger survivor sets are fetched as a UNION of up to
# _IDS_PUSHDOWN_BATCHES scans, each with its own <=1k-literal pushed
# In — total IO stays proportional to the matched pages (one giant In
# would read the same pages but risk the codegen stack), and the
# union's scans all run in one stage at full parallelism. Beyond
# batches*max ids the broadcast path takes over: a full scan of the
# bytes column, but bytes still never shuffle.
_IDS_PUSHDOWN_MAX = 1_000
_IDS_PUSHDOWN_BATCHES = 32
# above this many survivor ids, even a broadcast of the narrow id list
# risks Spark's 8 GB broadcast cap / driver heap; degrade to a shuffled
# semi-join instead of crashing (pathological-corpus path only)
_BROADCAST_IDS_MAX = 50_000_000


def jaccard_expr(sh1, sh2):
    """Exact shingle Jaccard as a pure JVM codegen expression over the
    distinct shingle-hash arrays the signature scan already computed
    (operators/signatures.py SIGNED_SCHEMA.shingle_hashes) — replaces
    the r1-r3 Python set-ops UDF that re-tokenized + re-shingled both
    transcripts per pair (VERDICT r3 #4: the edges stage's largest
    Python kernel, and edges was the worst-scaling stage at 1.9x).
    Matches functions/text.jaccard semantics: both-empty -> 0.0.
    Pair-for-pair equality with the string-set kernel is pinned by
    tests/test_verify_jaccard.py."""
    union = F.array_union(sh1, sh2)
    return F.when(
        F.size(union) > 0,
        F.size(F.array_intersect(sh1, sh2)) / F.size(union)
    ).otherwise(F.lit(0.0))


def jaro_winkler_udf():
    """F1: Jaro-Winkler string similarity as an Arrow-vectorized UDF
    (reference: recordlinkage jarowinkler over company names,
    /root/reference/src/core/similarity_engine.py:76-78)."""

    @F.pandas_udf(T.DoubleType())
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([X.jaro_winkler(x or "", y or "")
                          for x, y in zip(a, b)], dtype="float64")
    return _jw


def common_run_udf():
    """Longest shared contiguous token run, via generalized suffix
    array. Takes no config: cfg.substring_min_tokens is applied at the
    verdict comparison, not inside the kernel."""

    @F.pandas_udf(T.IntegerType())
    def _run(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            out.append(longest_common_run(X.tokenize(x or ""), X.tokenize(y or "")))
        return pd.Series(out, dtype="int32")
    return _run


def verify_text(cands: DataFrame, signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Verify exact/text/substring criteria.

    The pair context attached to EVERY candidate is hash-only
    (xxhash64 + independent murmur3 of transcript_norm / sha_bytes +
    the pcm fingerprint): the exact criterion and the audio prefilter
    are pure equality checks, so compact proxies carry them — 96 bits
    (2^-96) for the hard-merging exact verdict, 64 bits for the
    prefilter, where a collision can only ADD a candidate edge for
    downstream verification, never drop one. The shingle-hash arrays
    are joined only onto the textish subset (JVM Jaccard), and the
    transcript strings only onto the yet-smaller undecided subset the
    suffix-array UDF actually reads. Measured at 48k clips
    this cut the stage's shuffled bytes ~8x, and the narrow context is
    broadcast-sized far longer than the string context would be (at
    local bench scale the context joins plan as broadcast hash joins —
    the 790k-row candidate side never shuffles at all)."""
    # NULL-propagating hashes: xxhash64(NULL) is the SEED, not NULL, so
    # a bare hash would make two null-sha (or null-norm) rows compare
    # equal; the when() keeps the old equality semantics (NULL = never
    # equal, like `a = b` on nulls)
    # 96-bit proxies (xxhash64 + independent murmur3-32): the 'exact'
    # verdict is a HARD merge nothing re-verifies downstream, so the
    # 2^-64 single-hash collision bound — material at ~10^15 candidate
    # pairs — is tightened to 2^-96 for 4 extra bytes per side.
    # Candidate-only criteria (the audio prefilter) stay single-hash:
    # there a collision only ADDS a pair the SNR check rejects.
    def _h(c: str):
        return F.when(F.col(c).isNotNull(), F.xxhash64(c))

    def _h2(c: str):
        return F.when(F.col(c).isNotNull(), F.hash(c))
    ctx = signed.select(
        "clip_id",
        _h("transcript_norm").alias("normh"),
        _h2("transcript_norm").alias("normh2"),
        _h("sha_bytes").alias("shah"),
        _h2("sha_bytes").alias("shah2"),
        (F.coalesce(F.col("transcript_norm"), F.lit("")) != "").alias("ne"),
        "pcm_fp")

    def _side(n: str) -> DataFrame:
        return ctx.select(F.col("clip_id").alias(f"id_{n}"),
                          F.col("normh").alias(f"normh_{n}"),
                          F.col("normh2").alias(f"normh2_{n}"),
                          F.col("shah").alias(f"shah_{n}"),
                          F.col("shah2").alias(f"shah2_{n}"),
                          F.col("ne").alias(f"ne_{n}"),
                          F.col("pcm_fp").alias(f"fp_{n}"))
    p = cands.join(_side("1"), "id_1").join(_side("2"), "id_2")

    has = lambda s: F.array_contains(F.col("sources"), s)  # noqa: E731
    textish = has("lsh") | has("substring")
    # coalesce to FALSE: with a null sha/norm on one side the equality
    # is NULL, and a NULL predicate would drop the row from BOTH the
    # needs_udf and ~needs_udf branches (three-valued logic)
    exact_ok = F.coalesce((F.col("shah_1") == F.col("shah_2"))
                          & (F.col("shah2_1") == F.col("shah2_2"))
                          & (F.col("normh_1") == F.col("normh_2"))
                          & (F.col("normh2_1") == F.col("normh2_2")),
                          F.lit(False))
    needs_udf = textish & F.col("ne_1") & F.col("ne_2") & ~exact_ok

    # pairs that need no string UDF pass straight through (narrow rows,
    # no further shuffle); exact pairs score 1.0 via the coalesce below
    # (their Jaccard is 1.0 by definition — not recomputed)
    no_need = (p.where(~needs_udf)
               .withColumn("jaccard", F.lit(None).cast("double"))
               .withColumn("common_run", F.lit(None).cast("int"))
               .withColumn("verdict",
                           F.when(exact_ok, F.lit("exact"))))

    # fetch the distinct shingle-hash arrays for ONLY the textish
    # subset — two equi-joins that shuffle the small side, not the
    # candidate set — and score exact Jaccard fully JVM-side (codegen
    # array_intersect/array_union; no Python worker in this path)
    shs = signed.select("clip_id", "shingle_hashes")
    t = (p.where(needs_udf)
         .join(shs.select(F.col("clip_id").alias("id_1"),
                          F.col("shingle_hashes").alias("sh_1")), "id_1")
         .join(shs.select(F.col("clip_id").alias("id_2"),
                          F.col("shingle_hashes").alias("sh_2")), "id_2")
         .withColumn("jaccard", jaccard_expr(F.col("sh_1"), F.col("sh_2")))
         .drop("sh_1", "sh_2"))
    # materialize once: the three consumers below (text-decided /
    # suffix-array-undecided / audio-pending) otherwise re-run the
    # candidate+context join chain per branch. A 2k-clip e2e best-of-3
    # said removal wins (8.2 vs 8.8 s — one fewer job barrier), but an
    # interleaved A/B at 48k on pinned 8 cores said the OPPOSITE,
    # decisively: with-checkpoint won every matched pair (26.2 vs
    # 117.4, 25.4 vs 30.3, 36.6 vs 56.4 s edges stage; jobs/edges_ab.py)
    # — at real scale the re-run is join work over the full candidate
    # set, not "cheap expression work", and ReusedExchange does not
    # cover the divergent post-join projections. Keep the checkpoint;
    # the env toggle below exists only so the A/B stays re-runnable.
    import os as _os
    if _os.environ.get("SPARK_GRAFT_VERIFY_TEXT_NO_CHECKPOINT") != "1":
        t = t.localCheckpoint(eager=True)

    decided = (t.where(F.col("jaccard") >= cfg.jaccard_threshold)
               .withColumn("verdict", F.lit("text"))
               .withColumn("common_run", F.lit(None).cast("int")))
    rest = t.where(~F.coalesce(F.col("jaccard") >= cfg.jaccard_threshold,
                               F.lit(False)))
    # suffix-array verification only where an L-gram collision suggested
    # it — the transcript STRINGS are joined only onto this last, small
    # undecided subset (the one remaining Python kernel in the stage)
    norms = signed.select("clip_id", "transcript_norm")
    needs_run = (rest.where(has("substring"))
                 .join(norms.select(F.col("clip_id").alias("id_1"),
                                    F.col("transcript_norm").alias("norm_1")),
                       "id_1")
                 .join(norms.select(F.col("clip_id").alias("id_2"),
                                    F.col("transcript_norm").alias("norm_2")),
                       "id_2"))
    no_run = rest.where(~has("substring")).withColumn("common_run",
                                                      F.lit(None).cast("int"))
    ran = (needs_run.withColumn(
        "common_run", common_run_udf()(F.col("norm_1"), F.col("norm_2")))
        .drop("norm_1", "norm_2"))
    undecided = (ran.unionByName(no_run)
                 .withColumn("verdict",
                             F.when(F.col("common_run") >= cfg.substring_min_tokens,
                                    F.lit("substring"))))

    out = no_need.unionByName(decided.unionByName(undecided))
    # score contract (edge_prob01): text -> its jaccard; exact AND
    # substring -> 1.0. A substring pair only exists where jaccard <
    # threshold, so carrying that sub-threshold jaccard as its score
    # would mark every substring dup low-confidence (first ladder rung
    # would cut it; the review report would band it 'not same')
    return out.withColumn(
        "score", F.when(F.col("verdict").isin("exact", "substring"),
                        F.lit(1.0))
                  .otherwise(F.col("jaccard")))


def fetch_payloads(clips: DataFrame, idlist: list) -> DataFrame:
    """Build the survivor-pruned payload scan: a UNION of <=1k-literal
    In-predicate scans, each pushed to parquet for row-group/page
    skipping (a broadcast join never prunes the scan — every byte is
    read and decompressed before the join drops it; measured 5x
    slower and flat across cores at 48k clips). `idlist` must be
    sorted so consecutive ids per scan keep matched pages clustered
    on an id-ordered corpus layout."""
    payload = clips.select("clip_id", "bytes")
    sub = payload.where(F.lit(False))  # empty survivor set
    for i in range(0, len(idlist), _IDS_PUSHDOWN_MAX):
        sub = sub.unionByName(payload.where(
            F.col("clip_id").isin(idlist[i:i + _IDS_PUSHDOWN_MAX])))
    return sub


def verify_audio(pending: DataFrame, clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Audio path for pairs not confirmed by text: Hamming<=k on
    fingerprints AND equal transcript_norm, then re-join `bytes` for
    the surviving few and check SNR in mapInPandas (Arrow batches).

    Returns (id_1, id_2, snr_db, audio_ok).
    """
    pre = (pending
           .where(F.array_contains(F.col("sources"), "simhash"))
           .where(F.col("normh_1") == F.col("normh_2"))  # 64-bit proxy
           #   for transcript equality (see verify_text ctx; a 2^-64
           #   collision only admits a pair the SNR check then rejects)
           .where(F.col("fp_1").isNotNull() & F.col("fp_2").isNotNull())
           # Hamming via JVM-side bit ops: popcount(xor)
           .where(F.bit_count(F.col("fp_1").bitwiseXOR(F.col("fp_2")))
                  <= F.lit(cfg.simhash_hamming_verify))
           .select("id_1", "id_2"))

    # Joining the WHOLE clips table to the pair list by shuffle would
    # move every audio byte across the cluster (the exact thing
    # SURVEY.md §7.3 forbids — measured locally it was the pipeline's
    # single biggest stage). Prune the payload scan to the survivors:
    #
    # * small/medium survivor set (the common case: post-LSH,
    #   post-Hamming, equal transcripts): collect the ids and filter
    #   with pushed In-predicates — row-group/page statistics SKIP
    #   most of the binary column entirely (a broadcast join never
    #   prunes the scan: every byte is still read and decompressed
    #   before the join drops it; measured 5x slower at 48k clips,
    #   and FLAT across core counts because it is scan-bound). Sets
    #   beyond one predicate's literal budget are fetched as a union
    #   of <=1k-literal scans (see _IDS_PUSHDOWN_BATCHES).
    # * very large survivor set (pathological corpus): broadcast
    #   semi-join — full scan, but bytes still never shuffle.
    ids = (pre.select(F.col("id_1").alias("clip_id"))
           .unionByName(pre.select(F.col("id_2").alias("clip_id")))
           .distinct())
    max_ids = _IDS_PUSHDOWN_MAX * _IDS_PUSHDOWN_BATCHES
    id_rows = ids.limit(max_ids + 1).collect()
    if len(id_rows) <= max_ids:
        sub = fetch_payloads(clips, sorted(r.clip_id for r in id_rows))
    elif ids.count() <= _BROADCAST_IDS_MAX:
        sub = clips.select("clip_id", "bytes").join(F.broadcast(ids),
                                                    "clip_id")
    else:
        # truly pathological survivor set (10^8+): a broadcast this
        # size would blow Spark's 8 GB broadcast cap / driver heap.
        # Degrade to a shuffled semi-join — at THIS survivor scale the
        # pair join below co-locates the surviving bytes by key anyway,
        # so the one extra byte exchange is the price of completing
        # instead of crashing
        sub = clips.select("clip_id", "bytes").join(ids, "clip_id")
    # the filtered scan keeps the source's partitioning (hundreds of
    # mostly-emptied splits when ids are scattered); compact to session
    # parallelism BEFORE pinning, or every downstream pass over `sub`
    # pays per-empty-partition task overhead twice (measured: the
    # checkpoint partition count, not the scan, dominated this stage).
    # coalesce, not repartition (r4): both measured within noise on one
    # VM disk (12.7 vs 12.6 s through the SNR join), but coalesce
    # schedules n tasks instead of ~500 mostly-empty map tasks + an
    # exchange, and — decisively at cluster scale — never puts the
    # binary payload on the wire (repartition was this pipeline's only
    # byte-shuffling step)
    n = pre.sparkSession.sparkContext.defaultParallelism
    sub = sub.coalesce(n)
    sub = sub.localCheckpoint(eager=True)  # read twice below; scan clips once
    j = (pre
         .join(sub.select(F.col("clip_id").alias("id_1"), F.col("bytes").alias("bytes_1")), "id_1")
         .join(sub.select(F.col("clip_id").alias("id_2"), F.col("bytes").alias("bytes_2")), "id_2"))

    snr_min = cfg.snr_db_min

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            snrs, oks = [], []
            for b1, b2 in zip(pdf["bytes_1"], pdf["bytes_2"]):
                try:
                    p1, s1 = A.decode_wav(bytes(b1))
                    p2, s2 = A.decode_wav(bytes(b2))
                    ok, s = A.pcm_allclose_snr(p1, s1, p2, s2, snr_min)
                except Exception:
                    ok, s = False, float("-inf")
                snrs.append(s)
                oks.append(ok)
            yield pd.DataFrame({"id_1": pdf["id_1"], "id_2": pdf["id_2"],
                                "snr_db": snrs, "audio_ok": oks})

    schema = T.StructType([
        T.StructField("id_1", T.StringType()),
        T.StructField("id_2", T.StringType()),
        T.StructField("snr_db", T.DoubleType()),
        T.StructField("audio_ok", T.BooleanType()),
    ])
    return j.mapInPandas(_check, schema=schema)


def edge_prob01():
    """Map a verified edge's (verdict, score) onto one [0, 1]
    probability: audio SNR dB -> 1 - 10^(-dB/20) (amplitude accuracy
    of the PCM match: 30 dB -> .968, 40 dB -> .99 — monotone,
    bounded); text -> jaccard; exact/substring -> 1.0 (set by
    verify_text; the coalesce also maps a NULL score to 1.0).
    Single definition shared by the subdivision ladder and the review
    report so the two can never silently diverge."""
    return F.when(
        F.col("verdict") == "audio",
        F.lit(1.0) - F.pow(F.lit(10.0), -F.col("score") / F.lit(20.0))
    ).otherwise(F.coalesce(F.col("score"), F.lit(1.0)))


def build_edges(cands: DataFrame, signed: DataFrame, clips: DataFrame,
                cfg: DedupConfig) -> DataFrame:
    """Full verification -> dup-edge list (id_1, id_2, verdict, score)."""
    # materialize once: three consumers below would otherwise re-run the
    # suffix-array UDF chain per branch
    v = verify_text(cands, signed, cfg).localCheckpoint(eager=True)
    confirmed = v.where(F.col("verdict").isNotNull())
    pending = v.where(F.col("verdict").isNull())
    audio = (verify_audio(pending, clips, cfg)
             .where(F.col("audio_ok"))
             .select("id_1", "id_2",
                     F.lit("audio").alias("verdict"),
                     F.col("snr_db").alias("score")))
    return (confirmed.select("id_1", "id_2", "verdict", "score")
            .unionByName(audio))
