"""Functional-dependency operator + engine rule kind `func_dep`."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.engine import run_validation
from data_check_spark.operators.funcdep import fd_violating_keys, func_dep_violations
from data_check_spark.rules.spec import Rule, RuleCatalog


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, contract string, plan string, partition string"
    )


BASE = [
    ("c1", "A", "gold", "p0"),
    ("c2", "A", "gold", "p0"),
    ("c3", "B", "gold", "p1"),
    ("c4", "B", "silver", "p1"),   # B -> {gold, silver}: violates
    ("c5", "C", None, "p1"),       # NULL dependent: ignored by default
    ("c6", "C", "bronze", "p1"),
    ("c7", "  ", "gold", "p2"),    # blank determinant: exempt
    ("c8", "  ", "silver", "p2"),
]


def test_fd_violating_keys(spark):
    keys = fd_violating_keys(_df(spark, BASE), ["contract"], "plan").collect()
    assert [(r.contract, r.n_values) for r in keys] == [("B", 2)]


def test_fd_count_null_dependent(spark):
    keys = fd_violating_keys(
        _df(spark, BASE), ["contract"], "plan", count_null_dependent=True
    ).collect()
    got = {(r.contract, r.n_values) for r in keys}
    assert got == {("B", 2), ("C", 2)}  # NULL now counts as a value


def test_fd_row_grain_locates_every_offender(spark):
    v = func_dep_violations(
        _df(spark, BASE), "FD_PLAN", ["contract"], "plan"
    ).collect()
    got = {(r.clip_id, r.partition, r.observed) for r in v}
    assert got == {
        ("c3", "p1", "det=B; n_values=2"),
        ("c4", "p1", "det=B; n_values=2"),
    }
    assert all(r.rule_id == "FD_PLAN" for r in v)


def test_fd_group_grain_one_row_per_key(spark):
    v = func_dep_violations(
        _df(spark, BASE), "FD_PLAN", ["contract"], "plan", grain="group"
    ).collect()
    assert [(r.clip_id, r.partition, r.observed) for r in v] == [
        ("B", None, "det=B; n_values=2")
    ]


def test_fd_multi_column_determinant(spark):
    df = spark.createDataFrame(
        [("c1", "A", "x", "gold", "p"), ("c2", "A", "y", "gold", "p"),
         ("c3", "A", "y", "silver", "p")],
        "clip_id string, contract string, region string, plan string, partition string",
    )
    keys = fd_violating_keys(df, ["contract", "region"], "plan").collect()
    assert [(r.contract, r.region, r.n_values) for r in keys] == [("A", "y", 2)]
    v = func_dep_violations(df, "FD", ["contract", "region"], "plan").collect()
    assert {(r.clip_id, r.observed) for r in v} == {
        ("c2", "det=A|y; n_values=2"), ("c3", "det=A|y; n_values=2")
    }


def test_fd_guards(spark):
    df = _df(spark, BASE)
    with pytest.raises(ValueError):
        fd_violating_keys(df, [], "plan")
    with pytest.raises(ValueError):
        fd_violating_keys(df, ["plan"], "plan")
    with pytest.raises(ValueError):
        func_dep_violations(df, "FD", ["contract"], "plan", grain="bogus")


def test_fd_engine_rule_kind(spark):
    """func_dep dispatches through the catalog; gate scopes the check."""
    df = _df(spark, BASE)
    catalog = RuleCatalog([
        Rule("FD_CONTRACT_PLAN", "func_dep", "plan", {"determinant": ["contract"]}),
        Rule("FD_GATED", "func_dep", "plan", {"determinant": ["contract"]},
             gate="partition = 'p0'"),  # only p0 in scope -> A is consistent
    ])
    res = run_validation(spark, df, {}, catalog, run_ts="2026-01-01 00:00:00")
    rows = [r for r in res.violations.collect() if r.rule_id != "SCHEMA_MISMATCH"]
    by_rule = {}
    for r in rows:
        by_rule.setdefault(r.rule_id, set()).add(r.clip_id)
    assert by_rule == {"FD_CONTRACT_PLAN": {"c3", "c4"}}
    verdicts = {r["partition"]: r["passed"] for r in res.verdicts.collect()}
    assert verdicts == {"p0": True, "p1": False, "p2": True}


def test_fd_plan_two_phase_no_payload_shuffle(spark):
    """The distinct→count aggregation has a map-side partial, and the row
    join-back is over the tiny violating-key set (broadcast-able)."""
    df = _df(spark, BASE)
    plan = (
        func_dep_violations(df, "FD", ["contract"], "plan")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan or "HashAggregate" in plan
