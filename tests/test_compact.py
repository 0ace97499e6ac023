"""Small-file compaction: inventory, merge, re-cluster — data
identical before/after, file counts actually drop."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from big_data_spark.io.compact import compact_parquet, parquet_inventory
from big_data_spark.io.readers import read_table
from tests.conftest import SF_SMOKE


def _data_files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if not p.rsplit("/", 1)[-1].startswith(("_", "."))
    ]


@pytest.fixture()
def fragmented(spark, tmp_path):
    """documents shattered into 64 tiny files — the post-streaming-
    sink shape compaction exists for."""
    src = str(tmp_path / "fragmented")
    read_table(spark, SF_SMOKE, "documents").repartition(64).write.parquet(src)
    return src


def test_inventory_counts_fragmentation(spark, fragmented):
    inv = parquet_inventory(spark, fragmented)
    assert inv["n_files"] == 64
    assert inv["n_small_files"] == 64  # all far below 32 MB
    assert inv["total_bytes"] > 0


def test_compact_merges_and_preserves_data(spark, fragmented, tmp_path):
    dst = str(tmp_path / "compacted")
    report = compact_parquet(spark, fragmented, dst)
    assert report["n_output_files"] == 1  # tiny table -> one file
    assert len(_data_files(dst)) == 1
    before = sorted(map(tuple, spark.read.parquet(fragmented).collect()))
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert before == after


def test_compact_cluster_by_colocates_keys(spark, fragmented, tmp_path):
    dst = str(tmp_path / "clustered")
    compact_parquet(
        spark, fragmented, dst, cluster_by=["lang"], sort_within=["doc_id"]
    )
    # Every output file holds full key groups: no lang spans files
    # beyond the hash-partition mapping — with 1 output partition,
    # exactly one file, sorted by doc_id inside.
    files = _data_files(dst)
    assert len(files) == 1
    got = spark.read.parquet(dst)
    ids = [r.doc_id for r in got.collect()]
    # sortWithinPartitions over one partition == globally sorted file
    assert ids == sorted(ids)
    assert got.count() == read_table(spark, SF_SMOKE, "documents").count()


def test_compact_never_clobbers_destination(spark, fragmented, tmp_path):
    dst = str(tmp_path / "exists")
    compact_parquet(spark, fragmented, dst)
    with pytest.raises(Exception):  # mode("error") refuses overwrite
        compact_parquet(spark, fragmented, dst)


def test_compact_rejects_absurd_target(spark, fragmented, tmp_path):
    with pytest.raises(ValueError, match="1 MiB"):
        compact_parquet(
            spark, fragmented, str(tmp_path / "x"), target_file_bytes=1024
        )


def test_compact_empty_source_fails_loudly(spark, tmp_path):
    src = str(tmp_path / "empty")
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no parquet data files"):
        compact_parquet(spark, src, str(tmp_path / "y"))


def test_target_partition_math(spark, fragmented, tmp_path):
    # Force multiple output files: scale the size estimate until
    # ceil(total * ratio / target) lands at 3 — the smoke table is
    # below the 1 MiB target floor on its own.
    inv = parquet_inventory(spark, fragmented)
    ratio = 3.0 * (1 << 20) / inv["total_bytes"]
    report = compact_parquet(
        spark,
        fragmented,
        str(tmp_path / "multi"),
        target_file_bytes=1 << 20,
        size_ratio=ratio,
    )
    assert report["n_output_files"] == 3
    assert len(_data_files(str(tmp_path / "multi"))) == 3
    assert (
        spark.read.parquet(str(tmp_path / "multi")).count()
        == read_table(spark, SF_SMOKE, "documents").count()
    )
