"""Connected components: driver fast path vs distributed star rounds
must agree (and both match known components)."""

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.config import DEFAULT_CONFIG
from record_deduplication_spark.operators.cc import assign_clusters, connected_components

EDGES = [
    ("a", "b"), ("b", "c"),                    # chain -> {a,b,c}
    ("d", "e"),                                # pair
    ("f", "g"), ("g", "h"), ("f", "h"),        # triangle
    ("p1", "p2"), ("p2", "p3"), ("p3", "p4"),
    ("p4", "p5"), ("p5", "p6"),                # long path (diameter test)
]
EXPECTED = {
    frozenset("abc"), frozenset("de"), frozenset("fgh"),
    frozenset(["p1", "p2", "p3", "p4", "p5", "p6"]),
}


def _components(df) -> set[frozenset]:
    rows = df.toPandas()
    return set(map(frozenset,
                   rows.groupby("component")["clip_id"].apply(list).tolist()))


@pytest.mark.parametrize("driver_max", [10_000_000, 0])
def test_cc_both_paths(spark, driver_max):
    cfg = replace(DEFAULT_CONFIG, cc_driver_max_edges=driver_max)
    edges = spark.createDataFrame(EDGES, "id_1 string, id_2 string")
    comps = connected_components(edges, cfg)
    assert _components(comps) == EXPECTED
    # canonical representative = min member
    pdf = comps.toPandas()
    for comp, grp in pdf.groupby("component"):
        assert comp == min(grp["clip_id"].tolist() + [comp])


def test_cc_empty(spark):
    edges = spark.createDataFrame([], "id_1 string, id_2 string")
    assert connected_components(edges, DEFAULT_CONFIG).count() == 0


def test_assign_clusters_noise(spark):
    edges = spark.createDataFrame([("a", "b")], "id_1 string, id_2 string")
    ids = spark.createDataFrame([("a",), ("b",), ("z",)], "clip_id string")
    comps = connected_components(edges, DEFAULT_CONFIG)
    # default contract: string representative ids, NULL noise
    out = assign_clusters(ids, comps).toPandas()
    got = dict(zip(out["clip_id"], out["cluster_id"]))
    assert got["z"] is None and got["a"] == got["b"] == "a"
    # densified opt-in: dense longs, -1 noise
    dense = assign_clusters(ids, comps, densify=True).toPandas()
    got = dict(zip(dense["clip_id"], dense["cluster_id"]))
    assert got["z"] == -1 and got["a"] == got["b"] == 0


def test_assign_clusters_densify_dense_and_deterministic(spark):
    """Densified ids are 0..k-1 (each exactly once per component) and
    stable across re-evaluation — without any global-window plan."""
    edges = spark.createDataFrame(
        [(f"n{2*i}", f"n{2*i+1}") for i in range(25)],
        "id_1 string, id_2 string")
    ids = spark.createDataFrame([(f"n{i}",) for i in range(60)], "clip_id string")
    comps = connected_components(edges, DEFAULT_CONFIG)
    a = assign_clusters(ids, comps, densify=True).toPandas()
    b = assign_clusters(ids, comps, densify=True).toPandas()
    real = sorted(a[a["cluster_id"] >= 0]["cluster_id"].unique())
    assert real == list(range(25))
    assert (a.sort_values("clip_id").reset_index(drop=True)
             .equals(b.sort_values("clip_id").reset_index(drop=True)))


def test_key_cocluster_edges_small_and_hot(spark):
    """C11: same-key records end in one component — both through the
    small-block full-pair tier and the salted-chain hot tier — and
    different keys never connect."""
    from dataclasses import replace
    from record_deduplication_spark.operators.cc import key_cocluster_edges

    rows = ([(f"a{i:02d}", "acme.com") for i in range(20)]       # hot (cap 4)
            + [(f"b{i}", "beta.io") for i in range(3)]           # small
            + [("c0", None), ("c1", "")])                        # no key
    recs = spark.createDataFrame(rows, "clip_id string, dom string")
    cfg = replace(DEFAULT_CONFIG, max_block_full_pairs=4,
                  hot_block_salt_target=8, hot_block_neighbor_w=2)
    edges = key_cocluster_edges(recs, "dom", cfg)
    comps = connected_components(
        edges.select(F.col("id_1"), F.col("id_2")), DEFAULT_CONFIG)
    got = _components(comps)
    assert frozenset(f"a{i:02d}" for i in range(20)) in got
    assert frozenset(["b0", "b1", "b2"]) in got
    assert len(got) == 2  # null/empty keys produce no edges
    # linear edge count, not O(m^2): 20-member hot key stays small
    assert edges.count() < 20 * 6 + 3


def test_address_concat_expr(spark):
    from record_deduplication_spark.functions.columns import address_concat
    df = spark.createDataFrame(
        [("12  Main St", None, "Springfield"), (None, None, None)],
        "street string, unit string, city string")
    out = [r.a for r in df.select(
        address_concat(["street", "unit", "city"]).alias("a")).collect()]
    assert out == ["12 Main St Springfield", ""]


def test_cc_raises_on_nonconvergence(spark):
    """Exhausting cc_max_iters must fail loudly, never return a
    silently-wrong partition."""
    from dataclasses import replace
    import pytest
    from record_deduplication_spark.config import DEFAULT_CONFIG
    from record_deduplication_spark.operators.cc import connected_components
    chain = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i+1:03d}") for i in range(30)],
        "id_1 string, id_2 string")
    cfg = replace(DEFAULT_CONFIG, cc_driver_max_edges=0, cc_max_iters=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, cfg)


def test_uf_helpers_min_root_and_path_compression():
    """The shared union-find (used by BOTH the CC small-graph path and
    the subdivision driver ladder) must keep the engine-wide canonical
    representative: root = lexicographic min member."""
    from record_deduplication_spark.operators.cc import uf_find, uf_union

    parent = {}
    uf_union(parent, "c", "b")
    uf_union(parent, "d", "e")
    uf_union(parent, "b", "e")      # merges both chains
    uf_union(parent, "z", "a")      # separate pair, min root "a"
    roots = {x: uf_find(parent, x) for x in parent}
    assert {roots[x] for x in "bcde"} == {"b"}
    assert roots["z"] == roots["a"] == "a"
    # path compression: every member points straight at its root
    for x in "bcde":
        assert parent[x] == "b"
    # self-union is a no-op, never corrupts the forest
    uf_union(parent, "b", "b")
    assert uf_find(parent, "e") == "b"
