"""Smoke the driver contract exactly as the driver will."""

import importlib
import sys


def _mod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_smoke(spark):
    m = _mod()
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}


def test_queries_oracle_keys_align(spark):
    m = _mod()
    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 15


def test_each_query_runs_sf001(spark):
    m = _mod()
    for name, fn in m.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
