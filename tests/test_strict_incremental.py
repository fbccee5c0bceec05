"""Strict incremental fold: pair-for-pair equality with from-scratch.

VERDICT r4 #4: the default incremental path documents a caveat — a
block that crosses the max_block_full_pairs tier boundary (or changes
its salt count) when a batch lands pairs its old x old members
differently than a from-scratch run (chain redundancy, not recall).
`strict=True` closes the gap exactly. These tests PLANT such a block
(size 8 = cap while old, size 12 > cap combined) and assert exact
candidate/edge/cluster equality with a from-scratch run on the
combined corpus.
"""

import os

import numpy as np
import pytest

from record_deduplication_spark.config import DedupConfig
from record_deduplication_spark.functions.audio import encode_wav
from record_deduplication_spark.operators.blocking import (
    generate_candidates, incremental_candidates, incremental_candidates_strict)
from record_deduplication_spark.operators.signatures import add_signatures

# cap=8: the planted 12-member group full-pairs while old (8 members)
# and salts into ceil(12/4)=3 sub-blocks once the 4 new members land
CFG = DedupConfig(max_block_full_pairs=8, hot_block_salt_target=4,
                  hot_block_neighbor_w=2)

_GROUP_TXT = ("alpha bravo charlie delta echo foxtrot golf hotel india "
              "juliet kilo lima")


def _clip(cid: str, transcript: str, pcm_seed: int, sr: int = 8000) -> dict:
    rng = np.random.default_rng(pcm_seed)
    pcm = rng.uniform(-0.5, 0.5, 1600)
    return {"clip_id": cid, "bytes": encode_wav(pcm, sr),
            "sr_hz": sr, "dur_ms": 200, "codec": "pcm_s16le",
            "transcript": transcript}


def _tier_crossing_corpus():
    """12 identical clips (one block per family, size 12) + singletons;
    old = first 8 group members + 4 singletons, new = last 4 + 2."""
    rows = [_clip(f"g{i:03d}", _GROUP_TXT, pcm_seed=1) for i in range(12)]
    words = ("mike november oscar papa quebec romeo sierra tango uniform "
             "victor whiskey xray yankee zulu river mountain valley ocean")
    for i in range(6):
        toks = words.split()[i:i + 9]
        rows.append(_clip(f"s{i:03d}", " ".join(toks), pcm_seed=100 + i))
    old_ids = {f"g{i:03d}" for i in range(8)} | {f"s{i:03d}" for i in range(4)}
    return rows, old_ids


def _trips(pdf) -> set[tuple]:
    return {(a, b, s) for a, b, ss in
            zip(pdf["id_1"], pdf["id_2"], pdf["sources"]) for s in ss}


@pytest.fixture(scope="module")
def crossing(spark):
    rows, old_ids = _tier_crossing_corpus()
    clips = spark.createDataFrame(rows).localCheckpoint(eager=True)
    signed = add_signatures(clips, CFG).localCheckpoint(eager=True)
    from pyspark.sql import functions as F
    is_old = F.col("clip_id").isin(*old_ids)
    return {
        "clips": clips,
        "signed": signed,
        "old": signed.where(is_old).localCheckpoint(eager=True),
        "new": signed.where(~is_old).localCheckpoint(eager=True),
        "old_ids": old_ids,
    }


def test_planted_block_actually_crosses_tier(crossing):
    """Sanity: the group block is full-pair tier while old, hot tier
    combined — otherwise this file tests nothing."""
    n_old = crossing["old"].where(
        crossing["old"].transcript == _GROUP_TXT).count()
    n_all = crossing["signed"].where(
        crossing["signed"].transcript == _GROUP_TXT).count()
    assert n_old <= CFG.max_block_full_pairs < n_all


def test_default_fold_has_the_documented_caveat(spark, crossing):
    """The non-strict fold's union with stored candidates must NOT
    equal from-scratch on this corpus — proving strict mode closes a
    real gap, not a hypothetical one."""
    stored = generate_candidates(crossing["old"], CFG).toPandas()
    inc = incremental_candidates(crossing["new"], crossing["old"],
                                 CFG).toPandas()
    full = generate_candidates(crossing["signed"], CFG).toPandas()
    assert _trips(stored) | _trips(inc) != _trips(full)
    # specifically: the old run's full pairing of the 8-member block
    # has old x old pairs the combined salted pairing does not emit
    assert _trips(stored) - _trips(full)


def test_strict_equals_from_scratch_planted(spark, crossing):
    stored = generate_candidates(crossing["old"], CFG)
    strict = incremental_candidates_strict(
        crossing["new"], crossing["old"], stored, CFG).toPandas()
    full = generate_candidates(crossing["signed"], CFG).toPandas()
    assert _trips(strict) == _trips(full)
    # and as aggregated rows (same source sets per pair)
    s = {(a, b, frozenset(ss)) for a, b, ss in
         zip(strict["id_1"], strict["id_2"], strict["sources"])}
    f = {(a, b, frozenset(ss)) for a, b, ss in
         zip(full["id_1"], full["id_2"], full["sources"])}
    assert s == f


def test_strict_equals_from_scratch_generated(spark):
    """Property run on a generated corpus (organic block overlap across
    families, hot planted group crossing salt counts on a 80/20
    split): strict fold == from-scratch, pair-for-pair."""
    from pyspark.sql import functions as F

    from record_deduplication_spark.datagen import generate_clips

    cfg = DedupConfig(max_block_full_pairs=16, hot_block_salt_target=8,
                      hot_block_neighbor_w=3)
    clips_pdf, _ = generate_clips(n_clips=300, seed=7)
    clips = spark.createDataFrame(clips_pdf).localCheckpoint(eager=True)
    signed = add_signatures(clips, cfg).localCheckpoint(eager=True)
    is_new = F.pmod(F.xxhash64("clip_id"), F.lit(5)) == 0
    new_signed = signed.where(is_new).localCheckpoint(eager=True)
    old_signed = signed.where(~is_new).localCheckpoint(eager=True)

    stored = generate_candidates(old_signed, cfg)
    strict = incremental_candidates_strict(new_signed, old_signed,
                                           stored, cfg).toPandas()
    full = generate_candidates(signed, cfg).toPandas()
    assert _trips(strict) == _trips(full)


def test_pipeline_strict_fold_matches_from_scratch(spark, tmpdir_session):
    """End-to-end: run(old) -> run_incremental(new, strict=True) must
    leave candidates/edges/clusters tables identical to run(old+new)
    in a fresh workdir — verdicts and scores included."""
    import pandas as pd

    from record_deduplication_spark.plans.pipeline import DedupPipeline

    rows, old_ids = _tier_crossing_corpus()
    clips = spark.createDataFrame(rows).localCheckpoint(eager=True)
    from pyspark.sql import functions as F
    is_old = F.col("clip_id").isin(*old_ids)
    old_clips = clips.where(is_old)
    new_clips = clips.where(~is_old)

    wd_inc = os.path.join(tmpdir_session, "strict_inc")
    wd_full = os.path.join(tmpdir_session, "strict_full")
    pipe = DedupPipeline(spark, wd_inc, cfg=CFG)
    pipe.run(old_clips, resume=False)
    res_inc = pipe.run_incremental(new_clips, clips, strict=True)
    res_full = DedupPipeline(spark, wd_full, cfg=CFG).run(clips, resume=False)

    def canon(df, cols):
        pdf = df.toPandas()
        if "sources" in cols:
            pdf = pdf.assign(sources=[",".join(sorted(s))
                                      for s in pdf["sources"]])
        if "score" in cols:
            pdf = pdf.assign(score=pdf["score"].round(9))
        return pdf[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        canon(res_inc.candidates, ["id_1", "id_2", "sources"]),
        canon(res_full.candidates, ["id_1", "id_2", "sources"]))
    pd.testing.assert_frame_equal(
        canon(res_inc.edges, ["id_1", "id_2", "verdict", "score"]),
        canon(res_full.edges, ["id_1", "id_2", "verdict", "score"]))
    pd.testing.assert_frame_equal(
        canon(res_inc.clusters, ["clip_id", "cluster_id"]),
        canon(res_full.clusters, ["clip_id", "cluster_id"]))
    assert res_inc.stats["n_candidates"] == res_full.stats["n_candidates"]
    assert res_inc.stats["n_clusters"] == res_full.stats["n_clusters"]
