"""Oracle vs planted ground truth (SURVEY.md §5 plan item 2)."""

import pandas as pd
import pytest

from record_deduplication_spark.datagen import generate_clips
from record_deduplication_spark.oracle import cluster_pairs, oracle_dedup, pair_recall


@pytest.fixture(scope="module")
def corpus():
    return generate_clips(n_clips=400, seed=42)


def test_datagen_deterministic():
    c1, t1 = generate_clips(n_clips=50, seed=7)
    c2, t2 = generate_clips(n_clips=50, seed=7)
    assert c1["transcript"].tolist() == c2["transcript"].tolist()
    assert all(a == b for a, b in zip(c1["bytes"], c2["bytes"]))
    assert t1.equals(t2)


def test_datagen_schema(corpus):
    clips, truth = corpus
    assert list(clips.columns) == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    assert clips["clip_id"].is_unique
    assert len(clips) == 400
    assert set(truth["clip_id"]) == set(clips["clip_id"])
    # planted structure exists: some multi-member groups, some noise
    sizes = truth[truth.cluster_id >= 0].groupby("cluster_id").size()
    assert (sizes >= 2).all() and len(sizes) > 5
    assert (truth.cluster_id == -1).any()


def test_oracle_recovers_planted_truth(corpus):
    clips, truth = corpus
    res = oracle_dedup(clips)
    # every truth co-membership pair must be co-clustered by the oracle
    recall = pair_recall(res["clusters"], truth)
    assert recall >= 0.99, f"oracle recall vs planted truth {recall}"
    # and the oracle must not merge planted negatives into any group
    truth_pairs = cluster_pairs(truth)
    ours_pairs = cluster_pairs(res["clusters"])
    extra = ours_pairs - truth_pairs
    assert len(extra) <= max(2, len(truth_pairs) // 100), f"false merges: {len(extra)}"


def test_oracle_noise_labels(corpus):
    clips, truth = corpus
    res = oracle_dedup(clips)
    cl = res["clusters"]
    # singleton convention: -1, never a cluster of size 1
    sizes = cl[cl.cluster_id >= 0].groupby("cluster_id").size()
    assert (sizes >= 2).all()
