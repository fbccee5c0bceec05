"""Per-partition lineage: every committed stage logs (partition_id,
rows) to the `lineage` table, read from commit metadata (parquet
footers), and the per-partition rows sum to the stage's metric row
count."""

import os

from record_deduplication_spark.datagen import DATAGEN_VERSION, write_clips_parquet
from record_deduplication_spark.plans.pipeline import DedupPipeline


def test_lineage_table_per_partition_rows(spark, tmp_path_factory):
    d = f"data/clips_n300_s11_v{DATAGEN_VERSION}"
    if not os.path.exists(os.path.join(d, "clips.parquet")):
        write_clips_parquet(d, n_clips=300, seed=11)
    clips = spark.read.parquet(os.path.join(d, "clips.parquet"))
    wd = str(tmp_path_factory.mktemp("lineage_wd"))
    pipe = DedupPipeline(spark, wd)
    pipe.run(clips, resume=False)

    lin = pipe.store.lineage().toPandas()
    met = pipe.store.metrics().toPandas().set_index("stage")
    assert set(lin["stage"]) == {"signed", "candidates", "edges", "clusters"}
    for stage, grp in lin.groupby("stage"):
        assert grp["rows"].sum() == met.loc[stage, "rows"], stage
        assert grp["partition_id"].is_unique
        assert len(grp) == met.loc[stage, "n_partitions"]
    # metrics stats JSON carries skew summary
    import json
    stats = json.loads(met.loc["signed", "stats"])
    assert stats["partition_rows_max"] >= stats["partition_rows_min"] >= 0
