"""Zone-map audit (operators/scanstats.py): footer stats + skip logic."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_check_spark.operators.scanstats import (
    parquet_rowgroup_stats,
    pruning_report,
)


@pytest.fixture()
def multi_rg_dir(tmp_path):
    """Two part files, several row groups each, sorted ids — the layout a
    zone map can actually prune."""
    root = tmp_path / "t"
    root.mkdir()
    for part, lo in (("part-0.parquet", 0), ("part-1.parquet", 1000)):
        ids = list(range(lo, lo + 600))
        tbl = pa.table({"id": pa.array(ids, pa.int64()),
                        "noise": pa.array([i % 7 for i in ids], pa.int64())})
        pq.write_table(tbl, str(root / part), row_group_size=200)
    return str(root)


def test_stats_match_footers_and_brute_force(spark, multi_rg_dir):
    stats = parquet_rowgroup_stats(spark, multi_rg_dir, ["id"]).collect()
    # 2 files x 3 row groups (600 rows / 200 per group)
    assert len(stats) == 6
    by_key = {(r["file"], r["row_group"]): r for r in stats}
    for (fname, rg), r in by_key.items():
        lo = (1000 if fname.endswith("1.parquet") else 0) + rg * 200
        assert r["n_rows"] == 200
        assert r["min_v"] == lo and r["max_v"] == lo + 199


def test_pruning_report_skip_logic(spark, multi_rg_dir):
    stats = parquet_rowgroup_stats(spark, multi_rg_dir, ["id"])
    rep = {(r["file"], r["row_group"]): r["would_skip"]
           for r in pruning_report(stats, lo=550, hi=1150).collect()}
    # brute force: a group skips iff [min,max] disjoint from [550,1150]
    for (fname, rg), skip in rep.items():
        lo = (1000 if fname.endswith("1.parquet") else 0) + rg * 200
        expect = lo + 199 < 550 or lo > 1150
        assert skip == expect, (fname, rg)
    # effectiveness: [0,199],[200,399],[1200,1399],[1400,1599] are disjoint
    # from [550,1150] -> 4 of 6 groups skippable
    assert sum(rep.values()) == 4


def test_missing_stats_never_skip(spark, tmp_path):
    p = str(tmp_path / "nostats.parquet")
    tbl = pa.table({"id": pa.array(range(50), pa.int64())})
    pq.write_table(tbl, p, write_statistics=False, row_group_size=25)
    rep = pruning_report(
        parquet_rowgroup_stats(spark, p, ["id"]), lo=0, hi=1
    ).collect()
    assert len(rep) == 2
    assert all(r["min_v"] is None and not r["would_skip"] for r in rep)


def test_guards(spark, tmp_path):
    with pytest.raises(ValueError):
        parquet_rowgroup_stats(spark, "/nonexistent_dir_xyz", ["id"])
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        parquet_rowgroup_stats(spark, str(empty), ["id"])
    with pytest.raises(ValueError):
        parquet_rowgroup_stats(spark, str(empty), [])


def test_plan_no_shuffle_one_python_stage(spark, multi_rg_dir):
    df = parquet_rowgroup_stats(spark, multi_rg_dir, ["id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


def test_scan_pruning_query_refuses_untemplated_non_sf001(monkeypatch):
    """The registered oracle pins a literal sf0.01 path; run verbatim at any
    other sf_dir it would compare footers of DIFFERENT files. The query must
    fail loudly there unless the harness attests it retargeted the path
    (VERDICT r04 item 2)."""
    from data_check_spark.queries import QUERIES

    monkeypatch.delenv("DATA_CHECK_ORACLE_PATH_TEMPLATED", raising=False)
    with pytest.raises(ValueError, match="sf0.01"):
        QUERIES["scan_pruning_lineitem"](None, "/root/testdata/sf0.1")
