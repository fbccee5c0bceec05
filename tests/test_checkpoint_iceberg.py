"""Iceberg-mode CheckpointStore coverage (VERDICT r2 #3).

This container has no Iceberg jars, so the `use_iceberg` branch of
sources/checkpoint.py cannot run against a real catalog. These tests
monkeypatch `_iceberg_available` and substitute recording fakes for
the Spark surfaces the branch touches (`df.writeTo(...).using/create/
createOrReplace/append`, `spark.read.table`, `spark.catalog
.tableExists`, `spark.sql`, the `.files` metadata table) so the
dispatch, table naming, commit calls, run-id derivation and
partition-lineage reads are all executed and asserted — the ~70 LoC
that had never run before this round.
"""

from types import SimpleNamespace

import pytest

from record_deduplication_spark.sources import checkpoint as cp


# ---------------------------------------------------------------------------
# Recording fakes
# ---------------------------------------------------------------------------

class FakeWriteTo:
    def __init__(self, log, table):
        self.log, self.table = log, table

    def using(self, fmt):
        self.log.append(("using", self.table, fmt))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.table))

    def create(self):
        self.log.append(("create", self.table))

    def append(self):
        self.log.append(("append", self.table))


class FakeDF:
    def __init__(self, log, name="df", collect_rows=None):
        self.log = log
        self.name = name
        self.columns = []
        self._rows = collect_rows or []

    def writeTo(self, table):
        self.log.append(("writeTo", table))
        return FakeWriteTo(self.log, table)

    # read-side chain: select/orderBy/agg are pass-through recorders
    def select(self, *cols):
        self.log.append(("select", self.name, cols))
        return self

    def orderBy(self, *cols):
        self.log.append(("orderBy", self.name, cols))
        return self

    def agg(self, *cols):
        self.log.append(("agg", self.name))
        return self

    def coalesce(self, n):
        self.log.append(("coalesce", self.name, n))
        return self

    def collect(self):
        return self._rows


class FakeSpark:
    def __init__(self):
        self.log = []
        self.tables = {}          # name -> FakeDF returned by read.table
        self.existing = set()     # names where tableExists -> True
        self.read = SimpleNamespace(table=self._read_table)
        self.catalog = SimpleNamespace(tableExists=self._table_exists)

    def _read_table(self, name):
        self.log.append(("read.table", name))
        return self.tables.get(name, FakeDF(self.log, name))

    def _table_exists(self, name):
        self.log.append(("tableExists", name))
        return name in self.existing

    def sql(self, stmt):
        self.log.append(("sql", stmt))
        return FakeDF(self.log, "sql")

    def createDataFrame(self, rows, schema):
        self.log.append(("createDataFrame", len(rows)))
        return FakeDF(self.log, "created")


@pytest.fixture
def iceberg_store(monkeypatch):
    monkeypatch.setattr(cp, "_iceberg_available", lambda spark: True)
    fake = FakeSpark()
    store = cp.CheckpointStore(fake, "catalog.db")
    assert store.use_iceberg
    return fake, store


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def test_namespace_shape_dispatch():
    assert cp._looks_like_namespace("catalog.db")
    assert not cp._looks_like_namespace("/tmp/workdir")
    assert not cp._looks_like_namespace("dir.with.dots/sub")
    assert not cp._looks_like_namespace("plainname")


def test_parquet_mode_selected_without_jars(tmp_path, monkeypatch):
    """Dotted base WITHOUT Iceberg on the classpath must fall back to
    an error-free parquet store only if the base is path-shaped; a
    dotted namespace without jars falls back to parquet mode and then
    requires a local path (makedirs of 'catalog.db' would succeed but
    is a trap) — assert the probe gates the branch."""
    monkeypatch.setattr(cp, "_iceberg_available", lambda spark: False)
    store = cp.CheckpointStore(FakeSpark(), str(tmp_path / "wd"))
    assert not store.use_iceberg
    assert store.path("signed").endswith("signed")


# ---------------------------------------------------------------------------
# Iceberg-mode surface
# ---------------------------------------------------------------------------

def test_iceberg_path_exists_write_read_drop(iceberg_store):
    fake, store = iceberg_store
    assert store.path("signed") == "catalog.db.signed"

    # exists -> catalog.tableExists on the dotted name
    fake.existing.add("catalog.db.signed")
    assert store.exists("signed")
    assert not store.exists("edges")
    assert ("tableExists", "catalog.db.signed") in fake.log

    # write -> writeTo(...).using("iceberg").createOrReplace(), then read
    df = FakeDF(fake.log, "stage_df")
    store.write("signed", df)
    assert ("writeTo", "catalog.db.signed") in fake.log
    assert ("using", "catalog.db.signed", "iceberg") in fake.log
    assert ("createOrReplace", "catalog.db.signed") in fake.log
    assert ("read.table", "catalog.db.signed") in fake.log

    # drop -> DROP TABLE IF EXISTS
    store.drop("signed")
    assert ("sql", "DROP TABLE IF EXISTS catalog.db.signed") in fake.log


def test_iceberg_next_run_id(iceberg_store, spark):
    # the real F.max("run_id") Column is built inside next_run_id and
    # needs an active SparkSession — hence the spark fixture, even
    # though the data path is fully faked
    fake, store = iceberg_store
    # no metrics table yet -> run 1
    assert store.next_run_id() == 1
    # existing metrics with max(run_id)=4 -> 5
    fake.existing.add("catalog.db.metrics")
    fake.tables["catalog.db.metrics"] = FakeDF(
        fake.log, "metrics", collect_rows=[[4]])
    assert store.next_run_id() == 5
    # empty metrics table (max -> None) -> 1
    fake.tables["catalog.db.metrics"] = FakeDF(
        fake.log, "metrics", collect_rows=[[None]])
    assert store.next_run_id() == 1


def test_iceberg_partition_rows_reads_files_metadata(iceberg_store):
    fake, store = iceberg_store
    rows = [SimpleNamespace(file_path="f1", record_count=10),
            SimpleNamespace(file_path="f2", record_count=32)]
    fake.tables["catalog.db.edges.files"] = FakeDF(
        fake.log, "files", collect_rows=rows)
    out = store.partition_rows("edges")
    assert out == [(0, 10), (1, 32)]
    # the read must target the .files METADATA table (no data scan)
    assert ("read.table", "catalog.db.edges.files") in fake.log
    sel = [e for e in fake.log if e[0] == "select" and e[1] == "files"]
    assert sel and sel[0][2] == ("file_path", "record_count")


def test_iceberg_flush_create_then_append(iceberg_store, monkeypatch):
    fake, store = iceberg_store
    # flush builds its rows via local_rows_df (a real-plan local
    # relation) — route it through the fake session's createDataFrame
    # so this test keeps exercising only the create-vs-append logic
    from record_deduplication_spark.sources import checkpoint as cp
    monkeypatch.setattr(
        cp, "local_rows_df",
        lambda spark, rows, schema: spark.createDataFrame(list(rows), schema))
    store.log(run_id=1, stage="signed", ts_start=0.0, rows=10,
              n_partitions=2, extra="x")
    store.log_partitions(1, "signed", [(0, 4), (1, 6)])
    # first flush: neither table exists -> create()
    store.flush()
    assert ("create", "catalog.db.metrics") in fake.log
    assert ("create", "catalog.db.lineage") in fake.log
    assert ("createDataFrame", 1) in fake.log   # one metrics row
    assert ("createDataFrame", 2) in fake.log   # two lineage rows
    # second flush with the tables now existing -> append()
    fake.existing.update({"catalog.db.metrics", "catalog.db.lineage"})
    fake.log.clear()
    store.log(run_id=2, stage="edges", ts_start=0.0, rows=1,
              n_partitions=1)
    store.flush()
    assert ("append", "catalog.db.metrics") in fake.log
    assert ("create", "catalog.db.metrics") not in fake.log
    # flush drains the buffer: a third flush writes nothing
    fake.log.clear()
    store.flush()
    assert not [e for e in fake.log if e[0] == "writeTo"]


def test_parquet_mode_rejects_remote_uri(monkeypatch):
    monkeypatch.setattr(cp, "_iceberg_available", lambda spark: False)
    with pytest.raises(ValueError, match="Iceberg catalog"):
        cp.CheckpointStore(FakeSpark(), "s3://bucket/workdir")


def test_iceberg_append_stage(iceberg_store):
    """append() (the incremental-ingest primitive) must commit a
    snapshot APPEND in Iceberg mode — never createOrReplace — after
    aligning columns to the existing table's order."""
    fake, store = iceberg_store
    existing = FakeDF(fake.log, "existing")
    existing.columns = ["id_1", "id_2", "verdict", "score"]
    fake.tables["catalog.db.edges"] = existing
    new = FakeDF(fake.log, "new_rows")
    new.columns = ["score", "verdict", "id_2", "id_1"]  # out of order

    out = store.append("edges", new)
    assert ("select", "new_rows", ("id_1", "id_2", "verdict", "score")) \
        in fake.log
    assert ("writeTo", "catalog.db.edges") in fake.log
    assert ("append", "catalog.db.edges") in fake.log
    assert ("createOrReplace", "catalog.db.edges") not in fake.log
    assert out is existing  # re-read after commit
