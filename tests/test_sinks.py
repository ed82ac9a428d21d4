"""Production write path: file sizing, partition layout, row-group pruning."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_check_spark.sinks import write_dataset


def _files(path):
    return [f for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
            if os.path.basename(f).startswith("part-")]


def test_write_dataset_bounds_file_size(spark, tmp_path):
    df = spark.range(10_000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    out = str(tmp_path / "d1")
    write_dataset(df, out, sort_by=["id"], rows_per_file=1000, n_tasks=2)
    files = _files(out)
    sizes = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert all(s <= 1000 for s in sizes), sizes
    # 2 tasks x ceil(5000/1000) = 10 files, no small-file explosion
    assert 10 <= len(files) <= 12, len(files)
    assert spark.read.parquet(out).count() == 10_000


def test_write_dataset_partition_dirs_and_roundtrip(spark, tmp_path):
    df = spark.range(600).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("part")
    )
    out = str(tmp_path / "d2")
    write_dataset(df, out, partition_by=["part"], sort_by=["id"], n_tasks=2)
    assert sorted(os.path.basename(p) for p in glob.glob(f"{out}/part=*")) == [
        "part=0", "part=1", "part=2"
    ]
    back = spark.read.parquet(out)
    assert back.count() == 600
    assert back.filter(F.col("part") == "1").count() == 200


def test_write_dataset_files_are_pruning_friendly(spark, tmp_path):
    """Range exchange + local sort: every file carries a tight, mutually
    non-overlapping min/max range on the sort column — the property parquet
    row-group / file skipping needs."""
    df = spark.range(20_000).select(F.col("id")).repartition(8)  # pre-scrambled
    out = str(tmp_path / "d3")
    write_dataset(df, out, sort_by=["id"], rows_per_file=2500, n_tasks=4)
    ranges = []
    for f in _files(out):
        md = pq.ParquetFile(f).metadata
        mins = [md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # disjoint -> a point predicate reads ONE file


def test_write_dataset_guard(spark, tmp_path):
    df = spark.range(10)
    with pytest.raises(ValueError, match="rows_per_file"):
        write_dataset(df, str(tmp_path / "d4"), rows_per_file=0)
