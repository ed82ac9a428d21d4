"""Z-order clustering (functions/zorder.py + sinks.write_dataset zorder_by).

Pins: the Morton interleave against a python bit-twiddling reference,
quantization clamp/NULL routing, guards, and the actual PRUNING payoff —
a z-ordered dataset's parquet footer ranges must let a box predicate on
EITHER column skip most files, where a lexicographic (x, y) sort only
prunes on x.
"""

import glob

import pytest
from pyspark.sql import functions as F

from data_check_spark.functions.zorder import (
    quantize_expr,
    z_value,
    z_value_expr,
)


def _morton_py(vals: list[int], bits: int) -> int:
    z = 0
    n = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_z_value_matches_python_reference(spark):
    df = spark.range(500).select(
        (F.col("id") % 23).alias("x"), (F.col("id") % 17).alias("y")
    )
    got = df.select(
        "x", "y", z_value(["x", "y"], {"x": (0, 22), "y": (0, 16)}, bits=8).alias("z")
    ).collect()
    for r in got:
        qx = (r["x"] - 0) * 255 // 22
        qy = (r["y"] - 0) * 255 // 16
        assert r["z"] == _morton_py([qx, qy], 8), (r["x"], r["y"])


def test_z_value_three_columns(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a bigint, b bigint, c bigint")
    bounds = {"a": (0, 7), "b": (0, 7), "c": (0, 7)}
    got = df.select(z_value(["a", "b", "c"], bounds, bits=3).alias("z")).collect()
    qa, qb, qc = 1 * 7 // 7, 2 * 7 // 7, 3 * 7 // 7
    assert got[0]["z"] == _morton_py([qa, qb, qc], 3)


def test_quantize_clamps_and_null(spark):
    df = spark.createDataFrame(
        [(-100,), (0,), (50,), (100,), (9999,), (None,)], "v bigint"
    )
    out = df.selectExpr(quantize_expr("v", 0, 100, 8) + " as q").collect()
    qs = [r["q"] for r in out]
    assert qs[0] == 0  # clamped low
    assert qs[1] == 0
    assert qs[2] == 50 * 255 // 100
    assert qs[3] == 255
    assert qs[4] == 255  # clamped high
    assert qs[5] == 0  # NULL -> origin


def test_zorder_guards():
    with pytest.raises(ValueError, match="hi > lo"):
        quantize_expr("v", 5, 5)
    with pytest.raises(ValueError, match="bits"):
        quantize_expr("v", 0, 10, bits=40)
    with pytest.raises(ValueError, match="dialect"):
        quantize_expr("v", 0, 10, dialect="mysql")
    with pytest.raises(ValueError, match="columns"):
        z_value_expr(["a"] * 5)


def test_zorder_expr_is_duckdb_portable(spark):
    """The exact same z computation (modulo div spelling) must agree
    value-for-value between engines — the oracle contract."""
    import duckdb

    s_expr = quantize_expr("v", 0, 999, 8, dialect="spark")
    d_expr = quantize_expr("v", 0, 999, 8, dialect="duckdb")
    sz = z_value_expr([s_expr, "(v % 256)"], bits=8)
    dz = z_value_expr([d_expr, "(v % 256)"], bits=8)
    df = spark.range(1000).selectExpr("id as v").selectExpr("v", sz + " as z")
    want = duckdb.sql(
        f"SELECT v, {dz} AS z FROM (SELECT unnest(range(1000)) v) ORDER BY v"
    ).fetchall()
    got = sorted((r["v"], r["z"]) for r in df.collect())
    assert got == [tuple(w) for w in want]


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        ranges.append((min(los), max(his)))
    return ranges


def test_zorder_write_prunes_both_columns(spark, tmp_path):
    from data_check_spark.sinks import write_dataset

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_dataset(
        grid, zpath,
        zorder_by=["x", "y"], zorder_bounds={"x": (0, 63), "y": (0, 63)},
        zorder_bits=6, rows_per_file=256, n_tasks=4,
    )
    write_dataset(grid, spath, sort_by=["x", "y"], rows_per_file=256, n_tasks=4)

    def files_hit(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
        rngs = _file_ranges(path, col)
        return sum(1 for a, b in rngs if a <= hi and b >= lo), len(rngs)

    # box predicate on x: both layouts prune
    zx, zn = files_hit(zpath, "x", 0, 7)
    # box predicate on y ALONE: the x-sorted layout reads (nearly)
    # everything. repartitionByRange samples split points with an
    # RDD-id-derived seed, so each of the 4 range partitions can end with
    # a small remainder file holding only one x's y>=8 tail — allow up to
    # n_tasks such misses instead of exactly one.
    sy, sn = files_hit(spath, "y", 0, 7)
    assert sy >= sn - 4, (sy, sn)
    assert sy * 4 >= sn * 3, (sy, sn)  # still reads >=75% of files
    # …the z-ordered layout skips most files on either column
    zy, _ = files_hit(zpath, "y", 0, 7)
    assert zx <= zn // 2, (zx, zn)
    assert zy <= zn // 2, (zy, zn)
    # round-trip: same rows, z column not persisted
    back = spark.read.parquet(zpath)
    assert back.columns == ["x", "y"] or sorted(back.columns) == ["x", "y"]
    assert back.count() == 64 * 64


def test_zorder_sort_by_mutually_exclusive(spark, tmp_path):
    from data_check_spark.sinks import write_dataset

    df = spark.range(10).selectExpr("id as x", "id as y")
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_dataset(
            df, str(tmp_path / "bad"), sort_by=["x"], zorder_by=["x", "y"]
        )
