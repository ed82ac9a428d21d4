"""Distribution-drift rule: shifted partitions flagged, clean ones not."""

import numpy as np
from pyspark.sql import functions as F

from data_check_spark.operators.drift import (
    drift_violations,
    global_digest,
    make_baseline,
    partition_digests,
)
from data_check_spark.operators import tdigest as td


def _table(spark, shift_parts=()):
    rng = np.random.default_rng(42)
    rows = []
    for p in [f"p{i}" for i in range(6)]:
        shift = 8000 if p in shift_parts else 0
        for v in rng.normal(5000 + shift, 800, 400):
            rows.append((p, float(v)))
    return spark.createDataFrame(rows, "partition string, dur_ms double")


def test_partition_digests(spark):
    df = _table(spark)
    out = partition_digests(df, "dur_ms").collect()
    assert len(out) == 6
    for r in out:
        assert r["n"] == 400
        d = td.deserialize(bytes(r["tdigest"]))
        assert 4000 < td.quantile(d, 0.5) < 6000


def test_global_digest_treeaggregate(spark):
    df = _table(spark)
    g, n = global_digest(df, "dur_ms")
    assert n == 2400
    assert 4500 < td.quantile(g, 0.5) < 5500


def test_drift_flags_shifted_partition(spark):
    clean = _table(spark)
    baseline = make_baseline(spark, clean, ["dur_ms"])
    current = _table(spark, shift_parts={"p2", "p4"})
    out = drift_violations(current, baseline, "DRIFT", "dur_ms", threshold=0.25).collect()
    assert {r["partition"] for r in out} == {"p2", "p4"}
    assert all(r["clip_id"] is None for r in out)


def test_drift_clean_passes(spark):
    clean = _table(spark)
    baseline = make_baseline(spark, clean, ["dur_ms"])
    out = drift_violations(_table(spark), baseline, "DRIFT", "dur_ms", threshold=0.25).collect()
    assert out == []


def test_drift_global_fallback(spark):
    # partition absent from baseline → compared against __global__
    clean = _table(spark)
    baseline = make_baseline(spark, clean, ["dur_ms"]).filter(
        (F.col("partition") != "p5") | (F.col("partition") == "__global__")
    )
    shifted = _table(spark, shift_parts={"p5"})
    out = drift_violations(shifted, baseline, "DRIFT", "dur_ms", threshold=0.25).collect()
    assert {r["partition"] for r in out} == {"p5"}


def test_drift_no_baseline_at_all_flags(spark):
    # missing baseline row AND no __global__ → NULL qdist → flagged (fail-closed)
    current = _table(spark)
    empty = make_baseline(spark, current, ["dur_ms"]).filter(F.lit(False))
    out = drift_violations(current, empty, "DRIFT", "dur_ms").collect()
    assert len(out) == 6
