"""Snapshot diff: classification, NULL safety, guards."""

import pytest

from data_check_spark.operators.diff import diff_summary, snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b string")


def test_snapshot_diff_classification(spark):
    old = _df(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y"), (4, None, "y")])
    new = _df(spark, [(2, "x", "y"), (3, "X", "y"), (4, None, "y"), (5, "n", "n")])
    got = {r.k: r.change_type for r in
           snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"]).collect()}
    # 1 removed, 2 identical (absent), 3 changed, 4 identical-with-NULL
    # (absent), 5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}
    summary = {r.change_type: r.n_keys for r in diff_summary(
        snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"])).collect()}
    assert summary == {"removed": 1, "changed": 1, "added": 1}


def test_snapshot_diff_null_position_matters(spark):
    # (NULL, "a") vs ("a", NULL) must classify as changed, not identical
    old = _df(spark, [(1, None, "a")])
    new = _df(spark, [(1, "a", None)])
    got = snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"]).collect()
    assert [(r.k, r.change_type) for r in got] == [(1, "changed")]


def test_snapshot_diff_concat_boundaries_matter(spark):
    # ("ab","c") vs ("a","bc") must differ — the unit separator prevents
    # concatenation collisions
    old = _df(spark, [(1, "ab", "c")])
    new = _df(spark, [(1, "a", "bc")])
    got = snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"]).collect()
    assert [(r.k, r.change_type) for r in got] == [(1, "changed")]


def test_snapshot_diff_guards(spark):
    df = _df(spark, [(1, "x", "y")])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, key_cols=[], compare_cols=["a"])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, key_cols=["k"], compare_cols=["k", "a"])


def test_snapshot_diff_fingerprints_fold_before_join(spark):
    old = _df(spark, [(1, "x", "y")])
    new = _df(spark, [(1, "x", "y")])
    plan = (
        snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the md5 fingerprints are computed in Projects BELOW the join (each
    # side's exchange carries (key, fingerprint), never payload columns),
    # and no md5 evaluation remains above it
    head, _, below = plan.partition("Join")
    assert "md5" not in head and below.count("md5") == 2
