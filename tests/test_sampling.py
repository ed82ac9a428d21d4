"""Deterministic sampling: reproducibility, rate accuracy, shuffle-free plan."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.sampling import (
    _rate_threshold,
    deterministic_sample,
    sample_mark,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("zh"), F.lit("de")), (F.col("id") % 3 + 1).cast("int")
        ).alias("lang"),
    )


def test_rate_threshold_exact_hex():
    assert _rate_threshold(0.5) == "80000000"
    assert _rate_threshold(0.25) == "40000000"
    assert _rate_threshold(0.0) == "00000000"
    assert _rate_threshold(1.0) == "g"  # sorts after every hex hash → keep all
    with pytest.raises(ValueError):
        _rate_threshold(1.5)


def test_deterministic_and_rate(spark, ids):
    a = {r["doc_id"] for r in deterministic_sample(ids, id_col="doc_id", rate=0.2).collect()}
    b = {r["doc_id"] for r in deterministic_sample(ids, id_col="doc_id", rate=0.2).collect()}
    assert a == b  # pure function of (seed, id)
    # binomial(10000, 0.2): sd ~= 40; allow 5 sd
    assert abs(len(a) - 2000) < 200
    other = {
        r["doc_id"]
        for r in deterministic_sample(ids, id_col="doc_id", rate=0.2, seed="z9").collect()
    }
    assert other != a
    # nested rates: a higher-rate sample with the same seed is a superset
    sup = {r["doc_id"] for r in deterministic_sample(ids, id_col="doc_id", rate=0.5).collect()}
    assert a <= sup


def test_rate_one_keeps_everything(spark, ids):
    assert deterministic_sample(ids, id_col="doc_id", rate=1.0).count() == 10_000
    assert deterministic_sample(ids, id_col="doc_id", rate=0.0).count() == 0


def test_stratified_rates(spark, ids):
    out = stratified_sample(
        ids, id_col="doc_id", strata_col="lang", rates={"en": 0.6, "zh": 0.1}
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_per = 10_000 / 3
    assert abs(got["en"] - 0.6 * n_per) < 150
    assert abs(got["zh"] - 0.1 * n_per) < 100
    assert "de" not in got  # default_rate=0 drops unlisted strata
    # stratum membership respected: the kept en-rows are exactly the uniform
    # en-sample at the same seed+rate
    en_uniform = {
        r["doc_id"]
        for r in deterministic_sample(
            ids.filter(F.col("lang") == "en"), id_col="doc_id", rate=0.6
        ).collect()
    }
    en_strat = {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
    assert en_strat == en_uniform


def test_sampling_plan_is_shuffle_free(spark, ids):
    plan = (
        stratified_sample(ids, id_col="doc_id", strata_col="lang", rates={"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sample_mark_matches_python_md5(spark):
    import hashlib

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["keep"]
        for r in df.select("doc_id", sample_mark("doc_id", 0.3, seed="s7").alias("keep")).collect()
    }
    thr = _rate_threshold(0.3)
    for i in range(50):
        want = hashlib.md5(f"s7:{i}".encode()).hexdigest()[:8] < thr
        assert got[i] == want
