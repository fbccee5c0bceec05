"""Crash-safe parquet appends: commit-marker manifest (VERDICT r4 #6).

`CheckpointStore.append` in parquet mode moves batch-tagged part files
into the stage dir and commits them with ONE atomic manifest rename. A
crash at any point before that rename must leave the table exactly as
it was (the whole batch vanishes on the next repair) — never a partial
batch.
"""

import os

import pytest

from record_deduplication_spark.sources.checkpoint import CheckpointStore


@pytest.fixture()
def store(spark, tmp_path):
    st = CheckpointStore(spark, str(tmp_path / "wd"))
    st.write("t", spark.range(0, 10).selectExpr("id", "id * 2 AS v"))
    return st


def _ids(st):
    return sorted(r.id for r in st.read("t").collect())


def test_append_commits_and_survives_repair(spark, store):
    store.append("t", spark.range(10, 14).selectExpr("id", "id * 2 AS v"))
    assert _ids(store) == list(range(14))
    # repair is a no-op on a committed batch
    store._repair_unmanifested_appends("t")
    assert store.exists("t")
    assert _ids(store) == list(range(14))
    # partition_rows sees base + appended files
    assert sum(n for _, n in store.partition_rows("t")) == 14


def test_crash_before_manifest_loses_whole_batch(spark, store, monkeypatch):
    """Kill injected between the part-file moves and the manifest
    commit: every moved file must be swept by repair; the table reads
    back exactly as before the append."""
    def boom(stage, tag, names):
        raise RuntimeError("injected crash before commit marker")

    monkeypatch.setattr(store, "_commit_append", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.append("t", spark.range(10, 14).selectExpr("id", "id * 2 AS v"))
    monkeypatch.undo()

    # unmanifested batch files ARE in the dir right now (the torn state)
    d = store.path("t")
    torn = [f for f in os.listdir(d) if f.startswith("part-app-")]
    assert torn, "crash injection did not leave unmanifested files"

    # exists() repairs: the torn batch vanishes, the base table is intact
    assert store.exists("t")
    assert not [f for f in os.listdir(d) if f.startswith("part-app-")]
    assert _ids(store) == list(range(10))
    assert sum(n for _, n in store.partition_rows("t")) == 10

    # the caller re-folds the batch cleanly afterwards
    store.append("t", spark.range(10, 14).selectExpr("id", "id * 2 AS v"))
    assert _ids(store) == list(range(14))


def test_crash_mid_move_loop_loses_whole_batch(spark, store, monkeypatch):
    """Kill injected INSIDE the rename loop (some files moved, some
    not): still all-or-nothing."""
    real_rename = os.rename
    calls = {"n": 0}

    def flaky(src, dst):
        if "part-app-" in dst:
            calls["n"] += 1
            if calls["n"] == 2:
                raise OSError("injected crash mid-move")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky)
    with pytest.raises(OSError, match="injected crash"):
        store.append("t", spark.range(10, 18).selectExpr("id", "id * 2 AS v"))
    monkeypatch.undo()

    assert store.exists("t")  # repair runs
    assert _ids(store) == list(range(10))


def test_multiple_append_batches_tracked_independently(spark, store):
    store.append("t", spark.range(10, 12).selectExpr("id", "id * 2 AS v"))
    store.append("t", spark.range(12, 15).selectExpr("id", "id * 2 AS v"))
    man = store._append_manifest("t")
    assert len(man) == 2
    assert _ids(store) == list(range(15))
