"""End-to-end ASR-prep job: dedup, VAD rejects, labeled window plan."""

import json

import pyspark.sql.functions as F

from jobs.asr_prep_job import main


def _clips(spark):
    """Synthetic clip table: three distinct recordings (one duplicated at a
    different gain), one undecodable payload, one NULL-bytes row."""
    from data_check_spark.operators.audio import synth_two_burst_pcm

    params = spark.createDataFrame(
        [
            ("c1", 128, 256, 128, 300, 1000),
            ("c2", 0, 512, 64, 100, 2000),
            ("c1dup", 128, 256, 128, 300, 3000),   # c1's geometry, louder
            ("c3", 64, 128, 64, 200, 1500),
        ],
        "clip_id string, lead long, w1 long, gap long, w2 long, amp long",
    ).withColumn("k", F.lit(8))
    pcm = synth_two_burst_pcm(params).select("clip_id", "bytes")
    extra = spark.createDataFrame(
        [("bad", bytearray(b"odd")), ("nul", None)],
        "clip_id string, bytes binary",
    )
    transcripts = spark.createDataFrame(
        [("c1", "the quick brown fox"), ("c2", "hello world"),
         ("c1dup", "the quick brown fox"), ("c3", "one two three four five"),
         ("bad", "ghost words"), ("nul", None)],
        "clip_id string, transcript string",
    )
    return pcm.unionByName(extra).join(transcripts, "clip_id")


def test_asr_prep_job_end_to_end(spark, tmp_path):
    clips_path = str(tmp_path / "clips")
    out = str(tmp_path / "out")
    _clips(spark).write.parquet(clips_path)

    rc = main([
        "--input", clips_path, "--output-dir", out,
        "--window-samples", "256", "--min-samples", "32", "--dedup",
    ])
    assert rc == 0
    manifest = json.load(open(f"{out}/manifest.json"))
    assert manifest["clips_in"] == 6
    assert manifest["acoustic_dups_dropped"] == 1        # c1dup collapses into c1
    assert manifest["rejects"] == 2                      # bad (odd bytes) + nul

    rejects = {r["clip_id"] for r in spark.read.parquet(f"{out}/rejects").collect()}
    assert rejects == {"bad", "nul"}

    windows = spark.read.parquet(f"{out}/windows")
    ids = {r["clip_id"] for r in windows.select("clip_id").distinct().collect()}
    assert ids == {"c1", "c2", "c3"}
    assert manifest["windows"] == windows.count() > 0

    toks = spark.read.parquet(f"{out}/tokens")
    c1_words = [r["token"] for r in
                toks.filter("clip_id = 'c1'").orderBy("token_idx").collect()]
    assert c1_words == ["the", "quick", "brown", "fox"]
    # every placed token lands inside its clip's voiced extent
    assert toks.filter("start_sample > end_sample").count() == 0
    # window labels reference real token indices
    lab = windows.filter("n_tokens > 0")
    assert lab.filter("first_token_idx IS NULL OR last_token_idx < first_token_idx").count() == 0
