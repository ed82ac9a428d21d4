"""Range (interval) join: correctness vs brute force, hash-join plan."""

import datetime as dt

from data_check_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [("p1", 1, _ts("2026-01-05T00:00:00")),
         ("p2", 1, _ts("2026-01-20T00:00:00")),
         ("p3", 2, _ts("2026-01-05T00:00:00")),
         ("p4", 1, _ts("2026-03-01T00:00:00"))],
        "pid string, k int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, "w1", _ts("2026-01-01T00:00:00"), _ts("2026-01-10T00:00:00")),
         (1, "w2", _ts("2026-01-04T00:00:00"), _ts("2026-01-25T00:00:00")),
         (2, "w3", _ts("2026-01-01T00:00:00"), _ts("2026-01-02T00:00:00"))],
        "wk int, wid string, ws timestamp, we timestamp",
    )
    return points, intervals


def test_interval_join_matches_brute_force(spark):
    points, intervals = _frames(spark)
    got = {(r["pid"], r["wid"])
           for r in interval_join(points, intervals, point_key="k",
                                  interval_key="wk", ts="ts", start="ws",
                                  end="we", bucket="7 days").collect()}
    # brute force over the tiny fixtures
    want = set()
    for p in points.collect():
        for w in intervals.collect():
            if p["k"] == w["wk"] and w["ws"] <= p["ts"] <= w["we"]:
                want.add((p["pid"], w["wid"]))
    assert got == want
    assert ("p1", "w1") in got and ("p2", "w2") in got  # spans bucket edges
    assert not any(pid == "p4" for pid, _ in got)       # outside all windows


def test_interval_join_inclusive_boundaries(spark):
    points = spark.createDataFrame(
        [("lo", 1, _ts("2026-01-01T00:00:00")), ("hi", 1, _ts("2026-01-10T00:00:00"))],
        "pid string, k int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, "w", _ts("2026-01-01T00:00:00"), _ts("2026-01-10T00:00:00"))],
        "wk int, wid string, ws timestamp, we timestamp",
    )
    got = {r["pid"] for r in interval_join(points, intervals, point_key="k",
                                           interval_key="wk", ts="ts",
                                           start="ws", end="we",
                                           bucket="1 day").collect()}
    assert got == {"lo", "hi"}


def test_interval_join_plans_hash_join(spark):
    points, intervals = _frames(spark)
    plan = interval_join(points, intervals, point_key="k", interval_key="wk",
                         ts="ts", start="ws", end="we",
                         bucket="7 days")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_interval_join_bucket_unit_case_insensitive(spark):
    points, intervals = _frames(spark)
    import pytest

    upper = interval_join(points, intervals, point_key="k", interval_key="wk",
                          ts="ts", start="ws", end="we", bucket="7 DAYS")
    lower = interval_join(points, intervals, point_key="k", interval_key="wk",
                          ts="ts", start="ws", end="we", bucket="7 days")
    assert sorted(map(tuple, upper.collect())) == sorted(map(tuple, lower.collect()))
    with pytest.raises(ValueError, match="bucket unit"):
        interval_join(points, intervals, point_key="k", interval_key="wk",
                      ts="ts", start="ws", end="we", bucket="7 fortnights")
