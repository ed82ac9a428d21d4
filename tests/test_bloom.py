"""Bloom-filter membership pre-filter (operators/bloom.py).

Pins the two exactness contracts (semi ≡ plain semi join, anti ≡ plain
anti join — the Bloom layer may only *reduce* what the exact join sees,
never change the result), the no-false-negative guarantee, NULL routing,
the sizing guards, and the plan shape (pure-JVM probe below the join).
"""

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.bloom import (
    bloom_anti_violations,
    bloom_semi_join,
    build_bloom,
    might_contain,
)


@pytest.fixture(scope="module")
def fact_dim(spark):
    # 2000 fact rows keyed k0000..k0499 (cycled) + NULL/blank keys;
    # dim covers only keys ending in 0..1 (20% selectivity) + NULL.
    fact = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 100 == 99, None)
        .when(F.col("id") % 100 == 98, F.lit("  "))
        .otherwise(F.format_string("k%04d", F.col("id") % 500))
        .alias("fk"),
    )
    dim = spark.range(500).select(
        F.when(F.col("id") % 37 == 0, None)
        .otherwise(F.format_string("k%04d", F.col("id")))
        .alias("dk")
    ).where((F.col("dk").isNull()) | (F.col("dk").substr(-1, 1).isin("0", "1")))
    return fact, dim


def test_no_false_negatives(spark, fact_dim):
    _, dim = fact_dim
    bitmap = build_bloom(dim, "dk", m_bits=1 << 12, k=5)
    misses = (
        dim.where(F.col("dk").isNotNull())
        .where(~might_contain("dk", bitmap, k=5))
        .count()
    )
    assert misses == 0


def test_semi_join_exact(spark, fact_dim):
    fact, dim = fact_dim
    got = bloom_semi_join(
        fact, dim, fact_key="fk", dim_key="dk", m_bits=1 << 12, k=5
    )
    want = fact.join(
        dim.select(F.col("dk")).dropDuplicates(),
        on=fact["fk"] == F.col("dk"),
        how="left_semi",
    )
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in want.collect()
    )
    assert got.count() > 0


def test_semi_prefilter_reduces_rows(spark, fact_dim):
    """The bloom filter alone (before any join) must already drop the bulk
    of the non-member fact rows — that reduction IS the operator's point."""
    fact, dim = fact_dim
    bitmap = build_bloom(dim, "dk", m_bits=1 << 12, k=5)
    survivors = fact.where(might_contain("fk", bitmap, k=5)).count()
    members = bloom_semi_join(
        fact, dim, fact_key="fk", dim_key="dk", m_bits=1 << 12, k=5
    ).count()
    total = fact.count()
    # members ≤ survivors (fp only) and survivors way below the full table
    assert members <= survivors
    assert survivors < total * 0.35  # true selectivity 20% + small fp slack


def test_anti_violations_exact(spark, fact_dim):
    from data_check_spark.functions.blank import is_present

    fact, dim = fact_dim
    got = bloom_anti_violations(
        fact, dim, fact_key="fk", dim_key="dk", m_bits=1 << 12, k=5
    )
    want = fact.filter(is_present("fk")).join(
        dim.select("dk").where(F.col("dk").isNotNull()).dropDuplicates(),
        on=fact["fk"] == F.col("dk"),
        how="left_anti",
    )
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in want.collect()
    )
    assert got.count() > 0


def test_null_and_blank_keys_routed(spark, fact_dim):
    fact, dim = fact_dim
    bitmap = build_bloom(dim, "dk", m_bits=1 << 12, k=5)
    # NULL keys: three-valued NULL from the probe → excluded both ways
    nulls = fact.where(F.col("fk").isNull())
    assert nulls.where(might_contain("fk", bitmap, k=5)).count() == 0
    assert nulls.where(~might_contain("fk", bitmap, k=5)).count() == 0
    # blank keys are exempt from anti violations (is_present convention)
    got = bloom_anti_violations(
        fact, dim, fact_key="fk", dim_key="dk", m_bits=1 << 12, k=5
    )
    assert got.where(F.col("fk").isNull() | (F.trim("fk") == "")).count() == 0


def test_sizing_guards(spark, fact_dim):
    _, dim = fact_dim
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(dim, "dk", m_bits=100)
    with pytest.raises(ValueError, match="MAX_INLINE_BITS"):
        build_bloom(dim, "dk", m_bits=1 << 30)
    with pytest.raises(ValueError, match="k must be"):
        build_bloom(dim, "dk", k=0)


def test_plan_pure_jvm_probe_below_join(spark, fact_dim):
    fact, dim = fact_dim
    df = bloom_semi_join(fact, dim, fact_key="fk", dim_key="dk", m_bits=1 << 12, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "forall" in plan  # the bloom probe is present…
    assert "BatchEvalPython" not in plan and "pythonUDF" not in plan  # …and JVM-only
    # probe filter sits BELOW the verify join (toString prints top-down)
    join_at = min(
        i
        for i in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
        if i >= 0
    )
    assert plan.index("forall") > join_at
