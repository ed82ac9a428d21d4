"""Generator properties: determinism, planted buckets, skew, dim relations."""

from pyspark.sql import functions as F

from data_check_spark.datagen import (
    HOT_PARTITION,
    N_PARTITIONS,
    clips_df,
    rows_for_sf,
    transcripts_df,
)

N = 8000


def test_deterministic(spark):
    a = clips_df(spark, N, with_bytes=True).orderBy("_gen_id").limit(50).collect()
    b = clips_df(spark, N, with_bytes=True).orderBy("_gen_id").limit(50).collect()
    for ra, rb in zip(a, b):
        assert ra == rb


def test_planted_violation_classes_present(spark):
    df = clips_df(spark, N, with_bytes=False).cache()
    assert df.filter(F.col("clip_id").isNull()).count() > 0
    assert df.filter(F.col("clip_id") == "").count() > 0
    assert df.filter(F.col("sr_hz") == 0).count() > 0
    assert df.filter(F.col("sr_hz") == 7000).count() > 0
    assert df.filter(F.col("dur_ms") > 3_600_000).count() > 0
    assert df.filter(F.col("codec") == "wav?").count() > 0
    assert df.filter(F.col("transcript").startswith("★")).count() > 0
    df.unpersist()


def test_skewed_partitions(spark):
    counts = {
        r["partition"]: r["n"]
        for r in clips_df(spark, N, with_bytes=False)
        .groupBy("partition").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(counts) == N_PARTITIONS
    med = sorted(counts.values())[len(counts) // 2]
    assert counts[HOT_PARTITION] > 10 * med


def test_transcripts_dim_relations(spark):
    clips = clips_df(spark, N, with_bytes=False)
    dim = transcripts_df(spark, N)
    # orphans exist (dim keys not in clips)
    fact_keys = clips.select("clip_id")
    orphans = dim.join(fact_keys, "clip_id", "left_anti")
    assert orphans.count() > 0
    # most well-formed clips match their dim text byte-for-byte
    joined = clips.join(dim, "clip_id").select(
        (F.col("transcript") == F.col("transcript_ref")).alias("eq")
    )
    frac = joined.filter("eq").count() / max(joined.count(), 1)
    assert frac > 0.95


def test_rows_for_sf():
    assert rows_for_sf(0.001) == 10_000
    assert rows_for_sf(0.1) == 1_000_000
    assert rows_for_sf(0.0000001) == 1000  # floor
