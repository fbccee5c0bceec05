"""Pre-r4 workdir compatibility: stored `signed` tables written before
the r4 layout lack `shingle_hashes`. Resume and run_incremental on such
a workdir must migrate the table in place (text-only recompute from
transcript_norm — no audio re-decode) instead of crashing in the edges
stage, and the REWRITE must stick so CheckpointStore.append (which
aligns new rows to the existing table's columns) cannot silently
re-drop the column on later incremental batches.

Also pins the production signature scan to the canonical kernel: every
`shingle_hashes` value add_signatures emits must equal
shingle_hash_set(transcript_norm) — the same function the Jaccard
equality tests and the migration use — so the stored representation
cannot drift from what the tests verify.
"""

import pyspark.sql.functions as F
import pytest

from record_deduplication_spark.config import DEFAULT_CONFIG
from record_deduplication_spark.datagen import generate_clips
from record_deduplication_spark.operators.signatures import (
    add_signatures, migrate_signed, shingle_hash_set)
from record_deduplication_spark.plans.pipeline import DedupPipeline


@pytest.fixture(scope="module")
def clips(spark):
    pdf, _ = generate_clips(n_clips=400, seed=91)
    return spark.createDataFrame(pdf).localCheckpoint(eager=True)


def _strip_to_pre_r4(pipe):
    """Rewrite the stored signed table without shingle_hashes —
    byte-level simulation of a workdir persisted by r1-r3 code."""
    old = pipe.store.read("signed").drop("shingle_hashes")
    pipe.store.rewrite("signed", old)


def test_scan_matches_canonical_kernel(spark, clips):
    rows = (add_signatures(clips.limit(60), DEFAULT_CONFIG)
            .select("transcript_norm", "shingle_hashes").collect())
    assert any(r.shingle_hashes for r in rows)  # non-vacuous
    for r in rows:
        assert r.shingle_hashes == shingle_hash_set(
            r.transcript_norm, DEFAULT_CONFIG.shingle_k)


def test_migrate_signed_none_when_current(spark, clips):
    signed = add_signatures(clips.limit(10), DEFAULT_CONFIG)
    assert migrate_signed(signed, DEFAULT_CONFIG) is None


def test_resume_migrates_pre_r4_workdir(spark, clips, tmp_path):
    pipe = DedupPipeline(spark, str(tmp_path / "wd"))
    res = pipe.run(clips, resume=False)
    want_clusters = res.clusters.toPandas().sort_values("clip_id") \
                       .reset_index(drop=True)
    want_sh = {r.clip_id: r.shingle_hashes for r in
               pipe.store.read("signed")
                   .select("clip_id", "shingle_hashes").collect()}

    _strip_to_pre_r4(pipe)
    assert "shingle_hashes" not in pipe.store.read("signed").columns
    # resume with edges/clusters dropped: the edges stage must rebuild
    # from the MIGRATED signed table (this is the path that crashed)
    pipe.store.drop("edges")
    pipe.store.drop("clusters")
    res2 = DedupPipeline(spark, str(tmp_path / "wd")).run(clips, resume=True)
    got_clusters = res2.clusters.toPandas().sort_values("clip_id") \
                       .reset_index(drop=True)
    assert want_clusters.equals(got_clusters)
    # the migration rewrote the STORED table (not just the in-flight
    # df) and reproduced the scan's exact values
    got_sh = {r.clip_id: r.shingle_hashes for r in
              pipe.store.read("signed")
                  .select("clip_id", "shingle_hashes").collect()}
    assert got_sh == want_sh


def test_run_incremental_migrates_pre_r4_workdir(spark, clips, tmp_path):
    is_new = F.pmod(F.xxhash64("clip_id"), F.lit(5)) == 0
    old_clips = clips.where(~is_new).localCheckpoint(eager=True)
    new_clips = clips.where(is_new).localCheckpoint(eager=True)

    full = DedupPipeline(spark, str(tmp_path / "full")).run(
        clips, resume=False)
    want = full.clusters.toPandas().sort_values("clip_id") \
               .reset_index(drop=True)

    pipe = DedupPipeline(spark, str(tmp_path / "inc"))
    pipe.run(old_clips, resume=False)
    _strip_to_pre_r4(pipe)
    inc = pipe.run_incremental(new_clips, all_clips=clips)
    got = inc.clusters.toPandas().sort_values("clip_id") \
             .reset_index(drop=True)
    assert want.equals(got)
    # append after migration keeps the r4 schema (the silent-drop trap)
    assert "shingle_hashes" in pipe.store.read("signed").columns
    assert pipe.store.read("signed").where(
        F.col("shingle_hashes").isNull()).count() == 0


def test_checkpoint_rewrite_self_referential(spark, tmp_path):
    """CheckpointStore.rewrite must support a df that READS FROM the
    table being replaced (parquet mode's overwrite would delete source
    files mid-read without the sibling-dir swap), must leave no temp
    dirs behind, and must keep the table readable with the transformed
    content."""
    import os

    from record_deduplication_spark.sources.checkpoint import CheckpointStore
    store = CheckpointStore(spark, str(tmp_path / "wd"))
    src = spark.range(100).withColumnRenamed("id", "v")
    store.write("t", src)
    transformed = store.read("t").withColumn("v2", F.col("v") * 2)
    out = store.rewrite("t", transformed)
    got = {(r.v, r.v2) for r in out.collect()}
    assert got == {(i, 2 * i) for i in range(100)}
    # re-read from a fresh handle (the swap really committed)
    assert store.read("t").count() == 100
    # footer counts stay consistent for the resumed-stage count path
    assert sum(n for _, n in store.partition_rows("t")) == 100
    leftovers = [d for d in os.listdir(str(tmp_path / "wd"))
                 if "__rewrite_" in d or "__old_" in d]
    assert leftovers == []


def test_rewrite_kill_window_repair_and_rollback(spark, tmp_path):
    """rewrite()'s failure contract: a process kill between the two
    renames leaves the committed table in <stage>__old_<tag>; exists()
    must repair it (rename back) so resume sees the pre-rewrite state
    instead of re-paying the stage or hard-failing run_incremental."""
    import os

    from record_deduplication_spark.sources.checkpoint import CheckpointStore
    store = CheckpointStore(spark, str(tmp_path / "wd"))
    store.write("t", spark.range(50).withColumnRenamed("id", "v"))
    final = store.path("t")
    # simulate a kill between rename(final, old) and rename(tmp, final)
    os.rename(final, final + "__old_deadbeef")
    assert not os.path.exists(final)
    assert store.exists("t")          # repair happened here
    assert store.read("t").count() == 50
