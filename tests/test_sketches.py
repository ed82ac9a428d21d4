"""HLL cardinality sketches: accuracy and mergeability."""

from pyspark.sql import functions as F

from data_check_spark.operators.sketches import (
    approx_distinct_by,
    merge_sketches,
    partition_sketches,
)

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_accuracy(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = orders.select("o_custkey").distinct().count()
    est = approx_distinct_by(orders, "o_custkey").collect()[0]["n_distinct_est"]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_partition_sketches_merge_to_global(spark):
    """Per-partition sketches persisted once re-merge to the global estimate
    WITHOUT rescanning rows — the incremental-rollup contract."""
    from data_check_spark import datagen

    clips = datagen.clips_df(spark, 5000, with_bytes=False).drop("_gen_id", "_viol")
    clips = clips.filter(F.col("clip_id").isNotNull())
    exact = clips.select("clip_id").distinct().count()
    sk = partition_sketches(clips, "clip_id")
    assert sk.count() == clips.select("partition").distinct().count()
    merged = merge_sketches(sk)
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_sketch_shuffle_is_small(spark):
    """The aggregation plan carries sketches, not keys: partial HLL agg
    appears below the exchange (map-side sketch build)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = (
        approx_distinct_by(orders, "o_custkey", by="o_orderstatus")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hll_sketch_agg" in plan
    assert plan.index("ObjectHashAggregate") < plan.index("Exchange")


def test_heavy_hitters_exact_above_threshold(spark):
    from data_check_spark.operators.sketches import heavy_hitters

    # 20k rows: 'hot' 5%, 'warm' 3.5%, 18.3k unique fillers — far more
    # distinct keys than the MG budget, so candidate eviction really runs.
    rows = (
        [("hot",)] * 1000 + [("warm",)] * 700 + [(f"u{i}",) for i in range(18300)]
    )
    df = spark.createDataFrame(rows, "key string").repartition(8)
    got = heavy_hitters(df, "key", threshold_ppm=30000, budget=128).collect()
    assert [(r.key, r.n_rows, r.rank) for r in got] == [("hot", 1000, 1), ("warm", 700, 2)]
    assert got[0].share_ppm == 50000 and got[1].share_ppm == 35000


def test_heavy_hitters_matches_exact_groupby(spark):
    from data_check_spark.operators.sketches import heavy_hitters
    from pyspark.sql import functions as F

    # key k = floor(sqrt(id % 400)) has share (2k+1)/400 — a known ramp, so
    # the 5% threshold keeps exactly k >= 10.
    df = spark.range(30000).select(
        F.floor(F.sqrt(F.col("id") % 400)).cast("string").alias("key")
    ).repartition(6)
    total = df.count()
    exact = {
        r.key: r.n
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
        if r.n * 1_000_000 >= total * 50000
    }
    got = {
        r.key: r.n_rows
        for r in heavy_hitters(df, "key", threshold_ppm=50000, budget=64).collect()
    }
    assert got == exact and len(exact) >= 10


def test_heavy_hitters_budget_guard(spark):
    from data_check_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], "key string")
    import pytest as _pt

    with _pt.raises(ValueError):
        heavy_hitters(df, "key", threshold_ppm=100, budget=64)


def test_heavy_hitters_null_keys_count_in_total_only(spark):
    from data_check_spark.operators.sketches import heavy_hitters

    rows = [("hot",)] * 50 + [(None,)] * 50
    df = spark.createDataFrame(rows, "key string")
    got = heavy_hitters(df, "key", threshold_ppm=100000, budget=64).collect()
    # hot is 50 of 100 total rows (nulls included in the denominator)
    assert [(r.key, r.n_rows, r.share_ppm) for r in got] == [("hot", 50, 500000)]
