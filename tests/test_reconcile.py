"""Aggregate reconciliation operator + engine rule kind `reconcile`."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.engine import run_validation
from data_check_spark.operators.referential import (
    aggregate_reconcile,
    reconcile_violations,
)
from data_check_spark.rules.spec import Rule, RuleCatalog


def _parent(spark):
    return spark.createDataFrame(
        [
            ("o1", 10.00, "p0"),   # matches child sum exactly
            ("o2", 20.00, "p0"),   # child sums 19.99 -> delta +1 cent
            ("o3", 5.00, "p1"),    # no child rows at all
            (None, 7.00, "p1"),    # NULL key: exempt (not-null rule owns it)
        ],
        "okey string, total double, partition string",
    )


def _child(spark):
    return spark.createDataFrame(
        [
            ("o1", 4.00), ("o1", 6.00),
            ("o2", 10.00), ("o2", 9.99),
            ("zz", 3.50),            # no parent -> orphan child total
            (None, 1.00),            # NULL key: exempt
        ],
        "ckey string, amount double",
    )


def _recon(spark, **kw):
    return aggregate_reconcile(
        _parent(spark), _child(spark),
        parent_key="okey", child_key="ckey",
        total_col="total", amount_col="amount", **kw,
    )


def test_reconcile_statuses_and_exact_cents(spark):
    got = {r.okey: r for r in _recon(spark).collect()}
    assert set(got) == {"o2", "o3", "zz"}  # o1 balances; NULL keys exempt
    assert (got["o2"].status, got["o2"].parent_cents, got["o2"].child_cents,
            got["o2"].delta_cents) == ("total_mismatch", 2000, 1999, 1)
    assert (got["o3"].status, got["o3"].child_cents) == ("no_child_rows", None)
    assert (got["zz"].status, got["zz"].parent_cents,
            got["zz"].child_cents) == ("orphan_child_total", None, 350)


def test_reconcile_tolerance_boundary(spark):
    # |delta| == tolerance passes; the two structural statuses still fire.
    got = {r.okey: r.status for r in _recon(spark, tolerance_cents=1).collect()}
    assert got == {"o3": "no_child_rows", "zz": "orphan_child_total"}


def test_reconcile_violations_contract(spark):
    rows = {
        r.clip_id: r
        for r in reconcile_violations(
            _parent(spark), _child(spark), "RECON",
            parent_key="okey", child_key="ckey",
            total_col="total", amount_col="amount",
        ).collect()
    }
    assert rows["o2"].observed == "total_mismatch:1"
    assert rows["o2"].partition == "p0"        # parent partition carried
    assert rows["o3"].observed == "no_child_rows:null"
    assert rows["zz"].partition is None        # orphan has no parent row
    assert all(r.rule_id == "RECON" for r in rows.values())


def test_reconcile_engine_rule_kind(spark):
    clips = _parent(spark).withColumnRenamed("okey", "clip_id")
    catalog = RuleCatalog([
        Rule("TOTAL_RECON", "reconcile", "total",
             {"dim": "lines", "dim_key": "ckey", "amount_col": "amount"}),
    ])
    res = run_validation(
        spark, clips, {"lines": _child(spark)}, catalog,
        run_ts="2026-01-01 00:00:00",
    )
    rows = [r for r in res.violations.collect() if r.rule_id == "TOTAL_RECON"]
    assert {r.clip_id for r in rows} == {"o2", "o3", "zz"}
    verdicts = {r["partition"]: r["passed"] for r in res.verdicts.collect()}
    # p0 holds the mismatching o2; p1 holds the childless o3.
    assert verdicts["p0"] is False and verdicts["p1"] is False


def test_reconcile_missing_dim_escalates(spark):
    clips = _parent(spark).withColumnRenamed("okey", "clip_id")
    catalog = RuleCatalog([
        Rule("TOTAL_RECON", "reconcile", "total",
             {"dim": "lines", "dim_key": "ckey", "amount_col": "amount"}),
    ])
    res = run_validation(spark, clips, {}, catalog, run_ts="2026-01-01 00:00:00")
    ids = {r.rule_id for r in res.violations.collect()}
    assert "AUX_MISSING_LINES" in ids and "TOTAL_RECON" not in ids


def test_reconcile_plan_child_folds_before_join(spark):
    """The child side must aggregate (map-side partials) BEFORE the join —
    the exchange carries (key, cents), never child rows — and the keyed
    join must not degrade to a nested loop."""
    plan = (
        _recon(spark)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_reconcile_null_amounts_classified_by_presence(spark):
    # A parent whose stored total is NULL but whose children exist is NOT an
    # orphan-child case (the parent row is present), and a key whose child
    # amounts are all NULL is NOT a no-child-rows case: both are null_amount.
    parent = spark.createDataFrame(
        [("a", None), ("b", 5.00), ("c", None)],
        "okey string, total double",
    )
    child = spark.createDataFrame(
        [("a", 5.00), ("b", None), ("b", None)],
        "ckey string, amount double",
    )
    got = {
        r.okey: r
        for r in aggregate_reconcile(
            parent, child, parent_key="okey", child_key="ckey",
            total_col="total", amount_col="amount",
        ).collect()
    }
    assert got["a"].status == "null_amount"        # parent present, NULL total
    assert got["b"].status == "null_amount"        # children present, NULL sum
    assert got["c"].status == "no_child_rows"      # structurally childless
