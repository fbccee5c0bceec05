"""Physical-plan quality gates.

Catalyst gives predicate pushdown / column pruning / broadcast for
free ONLY if the dataflow is expressed declaratively — these tests pin
that property so a refactor can't silently regress the 100 TB plan
(scan that reads all columns for a 2-column projection is wrong, etc.).
"""

import re

from pyspark.sql import functions as F

from record_deduplication_spark.analysis.ann import brute_force_topk
from record_deduplication_spark.config import DEFAULT_CONFIG
from record_deduplication_spark.operators.blocking import (
    block_members, generate_candidates)

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .where(F.col("l_quantity") > 45)
          .select("l_orderkey", "l_quantity"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan


def test_column_pruning_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF}/documents.parquet")
          .select("doc_id", "lang"))
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {"doc_id", "lang"}


def test_signature_stage_never_shuffles_bytes(spark, tmpdir_session):
    """The binary payload must be consumed at the scan: no Exchange may
    appear below the signature mapInPandas when the scan is already
    parallel."""
    import os
    from record_deduplication_spark.datagen import write_clips_parquet
    from record_deduplication_spark.operators.signatures import add_signatures
    d = os.path.join(tmpdir_session, "planclips")
    cp, _ = write_clips_parquet(d, n_clips=300, seed=5)
    clips = spark.read.parquet(cp)
    signed = add_signatures(clips, DEFAULT_CONFIG)
    plan = _plan(signed)
    pos_udf = plan.find("MapInPandas")
    pos_ex = plan.find("Exchange")
    assert pos_udf != -1
    # either no exchange at all, or only above the UDF (plan prints top-down:
    # parents first), i.e. exchange index < udf index means exchange is a parent
    assert pos_ex == -1 or pos_ex < pos_udf, plan


def test_ann_broadcasts_query_side(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    plan = _plan(brute_force_topk(emb, q, k=3))
    assert "BroadcastExchange" in plan  # queries broadcast, corpus streams


def test_blocking_join_count_bounded(spark, tmpdir_session):
    """The unified blocking pass serves all 4 block families from ONE
    materialized member table; the tiered pairing adds only the
    members-x-sizes join (once per tier branch, shuffle-reused) — the
    hot tier's chain and representative pairing are WINDOW passes, not
    self-joins, and there is never one join per family."""
    import os
    from record_deduplication_spark.datagen import write_clips_parquet
    from record_deduplication_spark.operators.signatures import add_signatures
    d = os.path.join(tmpdir_session, "planclips2")
    cp, _ = write_clips_parquet(d, n_clips=300, seed=6)
    clips = spark.read.parquet(cp)
    signed = add_signatures(clips, DEFAULT_CONFIG)
    plan = _plan(generate_candidates(signed, DEFAULT_CONFIG))
    join_nodes = re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert 1 <= len(join_nodes) <= 3, plan
    # the RAW member table (explode+xxhash subtree) is localCheckpoint-
    # materialized once; both tier branches and the size agg read that
    # pinned RDD instead of recomputing the explode per consumer (the
    # sized members-x-sizes join is deliberately NOT checkpointed — its
    # (source,bkey) partitioning feeds tier 1's groupBy exchange-free)
    assert "ScanExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_aqe_and_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_block_members_explode_no_early_shuffle(spark, tmpdir_session):
    import os
    from record_deduplication_spark.datagen import write_clips_parquet
    from record_deduplication_spark.operators.signatures import add_signatures
    d = os.path.join(tmpdir_session, "planclips3")
    cp, _ = write_clips_parquet(d, n_clips=200, seed=7)
    clips = spark.read.parquet(cp)
    signed = add_signatures(clips, DEFAULT_CONFIG)
    # member explode itself must be shuffle-free (map-side only)
    plan = _plan(block_members(signed))
    body = plan.split("MapInPandas")[0]
    assert "Exchange" not in body


def test_audio_payload_fetch_pushes_in_predicate(spark, tmpdir_session):
    """verify_audio's survivor payload re-join must reach the parquet
    scan as pushed In(clip_id, ...) filters (row-group/page skipping)
    — never a shuffle of the bytes column, and not a broadcast join
    that still scans every byte (measured 5x slower and flat-scaling
    at 48k clips). Inside verify_audio the fetch is hidden behind an
    eager localCheckpoint, so the plan is asserted on the
    fetch_payloads builder it delegates to, at a size that spans
    multiple <=1000-literal batches."""
    import os
    from record_deduplication_spark.datagen import write_clips_parquet
    from record_deduplication_spark.operators.verify import (
        _IDS_PUSHDOWN_MAX, fetch_payloads)
    d = os.path.join(tmpdir_session, "planclips4")
    cp, _ = write_clips_parquet(d, n_clips=300, seed=8)
    clips = spark.read.parquet(cp)
    known = sorted(r.clip_id for r in clips.select("clip_id").limit(40).collect())
    idlist = known + [f"zz_{i:06d}" for i in range(_IDS_PUSHDOWN_MAX + 50)]
    sub = fetch_payloads(clips, sorted(idlist))
    plan = _plan(sub)
    assert "In(clip_id" in plan, plan[:4000]           # pushed to the scan
    assert "Exchange" not in plan, plan[:4000]         # bytes never shuffle
    # one pushed In-filter per <=1000-id batch (formatted plans print
    # each scan node in both the tree and the detail section, so count
    # the PushedFilters lines, which appear once per scan)
    assert plan.count("In(clip_id") == 2, plan[:4000]
    assert sub.count() == 40                           # real ids all fetched


def test_bucketed_join_is_shuffle_free(spark, tmpdir_session):
    """Corpus bucketed by clip_id + signatures bucketed the same way
    -> the join plans with ZERO Exchange nodes (the 10^12-row strategy
    for the pipeline's repeated clip_id joins). Broadcast is disabled
    for the assertion so the small test tables take the same
    SortMergeJoin path a 100 TB corpus would."""
    from record_deduplication_spark.sources.bucketed import (
        read_bucketed, write_bucketed)
    a = spark.range(0, 5000).selectExpr("cast(id as string) clip_id",
                                        "id * 2 as x")
    b = spark.range(0, 5000).selectExpr("cast(id as string) clip_id",
                                        "id * 3 as y")
    write_bucketed(a, "bkt_clips", n_buckets=8)
    write_bucketed(b, "bkt_signed", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "bkt_clips").join(
            read_bucketed(spark, "bkt_signed"), "clip_id")
        plan = _plan(j)
        assert "Exchange" not in plan, plan[:3000]
        assert "SortMergeJoin" in plan
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_clips")
        spark.sql("DROP TABLE IF EXISTS bkt_signed")


def test_candidates_source_agg_is_codegen_hashagg(spark, tmpdir_session):
    """The per-pair source-set aggregation must stay a whole-stage-
    codegen HashAggregate over the bit_or long — not ObjectHashAggregate
    (collect_set's array buffers, the r2 shape): at 10^12-pair scale
    the object-agg fallback spills and the exchange carries a string
    per input row instead of one long per pair."""
    import os
    from record_deduplication_spark.datagen import write_clips_parquet
    from record_deduplication_spark.operators.signatures import add_signatures
    d = os.path.join(tmpdir_session, "planclips4")
    cp, _ = write_clips_parquet(d, n_clips=200, seed=9)
    clips = spark.read.parquet(cp)
    signed = add_signatures(clips, DEFAULT_CONFIG)
    plan = _plan(generate_candidates(signed, DEFAULT_CONFIG))
    # the FINAL agg sits above the 3-branch pair Union in the printed
    # tree (parents first); tier 1's size-bounded collect_list below
    # the Union is object-agg by design (<= cap members per group)
    top = plan.split("Union")[0]
    assert "ObjectHashAggregate" not in top, top
    assert "HashAggregate" in top, top
