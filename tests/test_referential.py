"""Referential operators: anti / semi / orphan / semi∘anti composition
(reference analogs: CHK_0032 dekispart.py:494-501, CHK_0033 503-510,
CHK_0060 968-988)."""

from pyspark.sql import functions as F

from data_check_spark.operators.referential import (
    anti_join_violations,
    orphan_violations,
    semi_anti_violations,
    semi_join_violations,
)


def _fact(spark):
    rows = [("a", "p0"), ("b", "p0"), ("c", "p1"), (None, "p1"), ("", "p1")]
    return spark.createDataFrame(rows, "clip_id string, partition string")


def _dim(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "clip_id string")


def test_anti(spark):
    out = anti_join_violations(_fact(spark), _dim(spark, ["a", "b"]), "FK").collect()
    # c missing from dim; blanks exempt
    assert {(r["clip_id"], r["partition"]) for r in out} == {("c", "p1")}


def test_semi(spark):
    out = semi_join_violations(_fact(spark), _dim(spark, ["a", "zzz"]), "S").collect()
    assert {r["clip_id"] for r in out} == {"a"}


def test_orphan(spark):
    out = orphan_violations(_fact(spark), _dim(spark, ["a", "ghost1", "ghost2"]), "O").collect()
    assert {r["clip_id"] for r in out} == {"ghost1", "ghost2"}
    assert all(r["observed"] == "orphan" for r in out)


def test_semi_anti_composition(spark):
    # in A and not in B → violation (CHK_0060 shape)
    out = semi_anti_violations(
        _fact(spark), _dim(spark, ["a", "b"]), _dim(spark, ["b"]), "X"
    ).collect()
    assert {r["clip_id"] for r in out} == {"a"}


def test_anti_with_gate(spark):
    out = anti_join_violations(
        _fact(spark), _dim(spark, ["a"]), "FK", gate=F.col("partition") == "p0"
    ).collect()
    assert {r["clip_id"] for r in out} == {"b"}


def test_broadcast_strategy_in_plan(spark):
    # small dim → explicit broadcast in the physical plan
    plan_df = anti_join_violations(_fact(spark), _dim(spark, ["a"]), "FK", dim_rows=1)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_transcript_match_blank_keys_exempt(spark):
    """Blank fact keys are exempt from the match rule in BOTH the standalone
    operator and the fused join path — fresh and resume runs must agree."""
    from data_check_spark.operators.audio import transcript_match_violations
    from data_check_spark.operators.referential import fused_dim_checks

    fact = spark.createDataFrame(
        [("", "a", "p0"), ("c1", "b", "p0")],
        "clip_id string, transcript string, partition string",
    )
    dim = spark.createDataFrame(
        [("", "DIFFERENT"), ("c1", "b")],
        "clip_id string, transcript_ref string",
    )
    standalone = transcript_match_violations(fact, dim, "M").collect()
    assert standalone == []  # blank key exempt; c1 matches
    fused = fused_dim_checks(
        fact, dim, fact_key="clip_id", dim_key="clip_id",
        match_rule="M", fact_text="transcript", ref_text="transcript_ref",
    ).collect()
    assert [r for r in fused if r["rule_id"] == "M"] == []
