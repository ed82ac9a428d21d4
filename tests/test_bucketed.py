"""Co-located bucketed joins: the shuffle-free layout for repeated runs."""

from pyspark.sql import functions as F

from data_check_spark.sources.bucketed import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Fact and dim bucketed by the same key/count join WITHOUT any
    Exchange — the layout the nightly 10^12-row validation re-runs on."""
    from data_check_spark import datagen

    clips = (
        datagen.clips_df(spark, 2000, with_bytes=False)
        .drop("_gen_id", "_viol", "bytes")
        .filter(F.col("clip_id").isNotNull())
    )
    tr = datagen.transcripts_df(spark, 2000)
    write_bucketed(clips, "b_clips", key="clip_id", buckets=8)
    write_bucketed(tr, "b_transcripts", key="clip_id", buckets=8)
    try:
        # hint("merge"): at test scale AQE would broadcast instead; the
        # 10^12-row case is SMJ, which is where bucketing pays off.
        j = read_table(spark, "b_clips").hint("merge").join(
            read_table(spark, "b_transcripts"), "clip_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # and it actually runs
        assert j.count() > 0
        # grouping on the bucket key is also exchange-free
        agg = read_table(spark, "b_clips").groupBy("clip_id").count()
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_clips")
        spark.sql("DROP TABLE IF EXISTS b_transcripts")
