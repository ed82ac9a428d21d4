"""Structured Streaming incremental validation."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.rules.spec import Rule, RuleCatalog
from data_check_spark.streaming.incremental import (
    start_incremental_validation,
    stream_clips,
    streaming_violations_with_ts,
    violation_rate_monitor,
)

CATALOG = RuleCatalog(
    [
        Rule("S_ID_NOT_NULL", "not_null", "clip_id"),
        Rule("S_SR_POSITIVE", "range", "sr_hz", {"min": 1}),
        Rule("S_CODEC_SET", "value_in_set", "codec", {"allowed": ["flac", "opus"]}),
    ]
)


def _write_batch(spark, path, rows, batch_id):
    df = spark.createDataFrame(
        rows,
        "clip_id string, sr_hz int, dur_ms int, codec string, transcript string, "
        "partition string, event_ts timestamp",
    )
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def clip_dir(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    path = str(tmp_path / "clips_in")
    rows1 = [
        ("c1", 16000, 1000, "flac", "t", "p0", ts),
        (None, 16000, 1000, "flac", "t", "p0", ts),          # S_ID_NOT_NULL
        ("c3", -5, 1000, "opus", "t", "p1", ts),             # S_SR_POSITIVE
    ]
    rows2 = [
        ("c4", 8000, 500, "mp3", "t", "p1", ts),             # S_CODEC_SET
        ("c5", 8000, 500, "opus", "t", "p0", ts),
    ]
    _write_batch(spark, path, rows1, 0)
    _write_batch(spark, path, rows2, 1)
    return path


def test_incremental_validation_end_to_end(spark, clip_dir, tmp_path):
    out = str(tmp_path / "viol_out")
    ckpt = str(tmp_path / "ckpt")
    q = start_incremental_validation(
        spark, clip_dir, out, CATALOG, run_ts="2026-01-01 00:00:00",
        checkpoint_dir=ckpt, trigger_once=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rules = sorted(r["rule_id"] for r in got.collect())
    assert rules == ["S_CODEC_SET", "S_ID_NOT_NULL", "S_SR_POSITIVE"]
    assert set(got.columns) == {"rule_id", "clip_id", "partition", "observed", "event_ts"}


def test_incremental_is_incremental(spark, clip_dir, tmp_path):
    """Restarting with the same checkpoint processes only NEW files."""
    import datetime as dt

    out = str(tmp_path / "viol_out2")
    ckpt = str(tmp_path / "ckpt2")
    q = start_incremental_validation(
        spark, clip_dir, out, CATALOG, run_ts="2026-01-01 00:00:00",
        checkpoint_dir=ckpt, trigger_once=True,
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    _write_batch(
        spark, clip_dir,
        [("c6", 0, 9, "flac", "t", "p2", dt.datetime(2026, 1, 1, 0, 5, 0))],  # sr=0
        2,
    )
    q = start_incremental_validation(
        spark, clip_dir, out, CATALOG, run_ts="2026-01-01 00:00:00",
        checkpoint_dir=ckpt, trigger_once=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == n1 + 1  # only the new file's violation appended
    assert got.filter(F.col("clip_id") == "c6").count() == 1


def test_violation_rate_monitor_plan(spark, clip_dir):
    """Windowed monitor compiles as a streaming plan with watermark."""
    stream = stream_clips(spark, clip_dir)
    viol = streaming_violations_with_ts(stream, CATALOG, run_ts="2026-01-01 00:00:00")
    mon = violation_rate_monitor(viol)
    assert mon.isStreaming
    assert set(mon.columns) == {"window_start", "window_end", "rule_id", "n_violations"}


def test_batch_reconciliation_catches_cross_batch_duplicate(spark, tmp_path):
    """The documented trade-off: a duplicate straddling two micro-batches is
    NOT flagged by the stateless streaming pass, and the nightly batch run
    over the same directory IS the reconciliation that catches it."""
    import datetime as dt

    from data_check_spark.engine import run_validation

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dup_catalog = RuleCatalog(
        list(CATALOG) + [Rule("S_ID_UNIQUE", "unique", "clip_id")]
    )

    # batch 1 and batch 2 each contain "cdup" exactly once
    _write_batch(spark, in_dir,
                 [("cdup", 16000, 1000, "flac", "t", "p0", ts),
                  ("c1", 16000, 1000, "flac", "t", "p0", ts)], 1)
    q = start_incremental_validation(
        spark, in_dir, out_dir, dup_catalog,
        run_ts="2026-01-01 00:00:00", checkpoint_dir=ckpt, trigger_once=True,
    )
    q.awaitTermination(120)
    _write_batch(spark, in_dir,
                 [("cdup", 16000, 1000, "flac", "t", "p1", ts),
                  ("c2", 16000, 1000, "flac", "t", "p1", ts)], 2)
    q = start_incremental_validation(
        spark, in_dir, out_dir, dup_catalog,
        run_ts="2026-01-01 00:00:00", checkpoint_dir=ckpt, trigger_once=True,
    )
    q.awaitTermination(120)

    stream_out = spark.read.parquet(out_dir)
    assert stream_out.filter("rule_id = 'S_ID_UNIQUE'").count() == 0  # missed

    # nightly batch reconciliation over the SAME directory flags both rows
    clips = spark.read.parquet(in_dir)
    res = run_validation(spark, clips, {}, dup_catalog, run_ts="2026-01-01 00:00:00")
    dup_rows = res.violations.filter("rule_id = 'S_ID_UNIQUE'").collect()
    assert sorted((r["clip_id"], r["partition"]) for r in dup_rows) == [
        ("cdup", "p0"), ("cdup", "p1"),
    ]


def test_stateful_dedup_catches_cross_batch_duplicate(spark, tmp_path):
    """applyInPandasWithState closes the cross-batch window: the state store
    remembers first occurrences across availableNow restarts, so the second
    arrival of a key emits violations for BOTH rows — no batch run needed."""
    import datetime as dt

    from data_check_spark.streaming.stateful import start_stateful_dedup

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, in_dir,
                 [("cdup", 16000, 1000, "flac", "t", "p0", ts),
                  ("c1", 16000, 1000, "flac", "t", "p0", ts),
                  (None, 16000, 1000, "flac", "t", "p0", ts)], 1)
    q = start_stateful_dedup(spark, in_dir, out_dir, checkpoint_dir=ckpt,
                             trigger_once=True)
    q.awaitTermination(120)
    # only one occurrence so far -> silent
    assert spark.read.parquet(out_dir).count() == 0

    _write_batch(spark, in_dir,
                 [("cdup", 16000, 1000, "flac", "t", "p1", ts),
                  ("c2", 16000, 1000, "flac", "t", "p1", ts)], 2)
    q = start_stateful_dedup(spark, in_dir, out_dir, checkpoint_dir=ckpt,
                             trigger_once=True)
    q.awaitTermination(120)

    rows = spark.read.parquet(out_dir).collect()
    got = sorted((r["clip_id"], r["partition"], r["observed"]) for r in rows)
    assert got == [("cdup", "p0", "dup_count=2"), ("cdup", "p1", "dup_count=2")]
    assert all(r["rule_id"] == "STREAM_DUP" for r in rows)

    # third occurrence -> one more violation for the new row only
    _write_batch(spark, in_dir,
                 [("cdup", 16000, 1000, "flac", "t", "p2", ts)], 3)
    q = start_stateful_dedup(spark, in_dir, out_dir, checkpoint_dir=ckpt,
                             trigger_once=True)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).filter("partition = 'p2'").count() == 1


def test_violation_sessions_gap_semantics(spark, tmp_path):
    """Session windows close after a quiet gap: two violation bursts 20min
    apart with a 5min gap yield two sessions for the rule."""
    import datetime as dt

    from data_check_spark.streaming.incremental import (
        stream_clips,
        streaming_violations_with_ts,
        violation_sessions,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    rows = []
    for m in (0, 1, 2):            # burst 1
        rows.append((None, 16000, 1000, "flac", "t", "p0", base + dt.timedelta(minutes=m)))
    for m in (22, 23):             # burst 2 (gap 20min > 5min)
        rows.append((None, 16000, 1000, "flac", "t", "p0", base + dt.timedelta(minutes=m)))
    _write_batch(spark, in_dir, rows, 1)

    stream = stream_clips(spark, in_dir)
    sessions = violation_sessions(
        streaming_violations_with_ts(stream, CATALOG, run_ts="2026-01-01 00:00:00"),
        gap="5 minutes", watermark="1 minute",
    )
    out_dir = str(tmp_path / "sessions")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # advance the watermark so both sessions finalize: a later batch
    _write_batch(spark, in_dir,
                 [(None, 16000, 1000, "flac", "t", "p0", base + dt.timedelta(hours=2))], 2)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["session_start"], r["n_violations"])
        for r in spark.read.parquet(out_dir).filter("rule_id = 'S_ID_NOT_NULL'").collect()
    )
    assert (base, 3) in got                                  # burst 1: 3 rows
    assert (base + dt.timedelta(minutes=22), 2) in got       # burst 2: 2 rows


def test_microbatch_set_rules_via_foreachbatch(spark, tmp_path):
    """Set-oriented rules run per micro-batch through the batch engine:
    a within-batch duplicate is flagged immediately by the streaming job."""
    import datetime as dt

    from data_check_spark.streaming.incremental import start_microbatch_validation

    ts = dt.datetime(2026, 1, 1)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    catalog = RuleCatalog(
        list(CATALOG) + [Rule("S_UNIQ", "unique", "clip_id")]
    )
    _write_batch(spark, in_dir,
                 [("dup_in_batch", 16000, 1000, "flac", "t", "p0", ts),
                  ("dup_in_batch", 16000, 1000, "flac", "t", "p0", ts),
                  ("c9", 0, 1000, "flac", "t", "p0", ts)], 1)  # sr=0 violates
    q = start_microbatch_validation(
        spark, in_dir, out_dir, catalog,
        run_ts="2026-01-01 00:00:00",
        checkpoint_dir=str(tmp_path / "ck"), trigger_once=True,
    )
    q.awaitTermination(180)
    v = spark.read.parquet(f"{out_dir}/violations")
    got = {(r["rule_id"], r["clip_id"]) for r in v.collect()}
    assert ("S_UNIQ", "dup_in_batch") in got          # set rule fired in-batch
    assert ("S_SR_POSITIVE", "c9") in got             # row-local rule too
    assert v.filter("rule_id = 'S_UNIQ'").count() == 2
    assert set(r["batch_id"] for r in v.select("batch_id").collect()) == {0}


def test_microbatch_bytes_schema_runs_audio_rules(spark, tmp_path):
    """The narrow default stream schema skips audio rules (no bytes column);
    STREAM_CLIPS_SCHEMA_WITH_BYTES runs the PCM checks per micro-batch."""
    import datetime as dt

    from data_check_spark.functions.pcm import synth_wave
    from data_check_spark.streaming.incremental import (
        STREAM_CLIPS_SCHEMA_WITH_BYTES,
        start_microbatch_validation,
    )

    ts = dt.datetime(2026, 1, 1)
    in_dir = str(tmp_path / "in")
    good = bytes(synth_wave("c_ok", 16000, 1000, 20).tobytes())
    df = spark.createDataFrame(
        [("c_ok", good, 16000, 1000, "flac", "t", "p0", ts),
         ("c_empty", b"", 16000, 1000, "flac", "t", "p0", ts)],
        STREAM_CLIPS_SCHEMA_WITH_BYTES,
    )
    df.coalesce(1).write.mode("append").parquet(in_dir)
    catalog = RuleCatalog(
        [Rule("B_SNR", "audio_decode", "bytes", {"snr_db_min": 30.0, "cap_ms": 20})]
    )

    # narrow default: audio rule not applicable, no violations written
    q = start_microbatch_validation(
        spark, in_dir, str(tmp_path / "out_narrow"), catalog,
        run_ts="2026-01-01 00:00:00",
        checkpoint_dir=str(tmp_path / "ck_narrow"), trigger_once=True,
    )
    q.awaitTermination(180)

    # full-fidelity schema: empty PCM violates, good wave passes
    q = start_microbatch_validation(
        spark, in_dir, str(tmp_path / "out_bytes"), catalog,
        run_ts="2026-01-01 00:00:00",
        checkpoint_dir=str(tmp_path / "ck_bytes"), trigger_once=True,
        schema=STREAM_CLIPS_SCHEMA_WITH_BYTES,
    )
    q.awaitTermination(180)
    v = spark.read.parquet(str(tmp_path / "out_bytes") + "/violations")
    got = {(r["rule_id"], r["clip_id"]) for r in v.collect()}
    assert ("B_SNR", "c_empty") in got
    assert ("B_SNR", "c_ok") not in got


def test_cumulative_drift_sketch_stream(spark, tmp_path):
    """Sketch accumulation across micro-batches: a partition that looks
    clean after batch 1 drifts once batch 2's shifted rows merge in —
    scored from the accumulated sketches alone, never re-reading batch 1."""
    import datetime as dt

    import numpy as np

    from data_check_spark.operators.drift import make_baseline
    from data_check_spark.streaming.incremental import (
        cumulative_drift_violations,
        start_drift_sketch_stream,
    )

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    rng = np.random.default_rng(7)

    def rows(part, shift, n=400):
        return [
            (f"c{i}", 16000, int(v), "flac", "t", part, ts)
            for i, v in enumerate(rng.normal(5000 + shift, 800, n))
        ]

    baseline_df = spark.createDataFrame(
        [("p0", float(v)) for v in rng.normal(5000, 800, 800)],
        "partition string, dur_ms double",
    )
    baseline = make_baseline(spark, baseline_df, ["dur_ms"])

    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rules = [("DRIFT_DUR_MS", "dur_ms", 0.25)]

    _write_batch(spark, in_dir, rows("pX", 0), 0)  # clean arrivals
    q = start_drift_sketch_stream(
        spark, in_dir, state, ["dur_ms"], checkpoint_dir=ckpt, trigger_once=True
    )
    q.awaitTermination(120)
    clean = cumulative_drift_violations(spark, state, baseline, rules).collect()
    assert clean == []

    _write_batch(spark, in_dir, rows("pX", 8000), 1)  # drifted arrivals
    q = start_drift_sketch_stream(
        spark, in_dir, state, ["dur_ms"], checkpoint_dir=ckpt, trigger_once=True
    )
    q.awaitTermination(120)
    sketches = spark.read.parquet(f"{state}/drift_sketches")
    assert sketches.select("batch_id").distinct().count() == 2  # truly incremental
    out = cumulative_drift_violations(spark, state, baseline, rules).collect()
    assert {r["partition"] for r in out} == {"pX"}
    assert out[0]["rule_id"] == "DRIFT_DUR_MS" and "w1=" in out[0]["observed"]


def test_watermark_bound_controls_late_data_loss(spark, tmp_path):
    """Ties the watermark_plan recommendation to actual behavior: a row
    arriving 2h late is DROPPED by a windowed aggregation under a 10-minute
    watermark and KEPT under a p100-sized (3-hour) bound — `withWatermark`
    must cover the measured out-of-orderness or data silently vanishes."""
    import datetime as dt

    from data_check_spark.streaming.incremental import (
        stream_clips,
        streaming_violations_with_ts,
    )

    base = dt.datetime(2026, 1, 1, 6, 0, 0)

    def run(watermark: str, tag: str) -> dict:
        in_dir = str(tmp_path / f"in_{tag}")
        # batch 1: two violations at base, plus a base+3h row that advances
        # the event-time watermark well past base.
        _write_batch(spark, in_dir, [
            (None, 16000, 1000, "flac", "t", "p0", base),
            (None, 16000, 1000, "flac", "t", "p0", base),
            (None, 16000, 1000, "flac", "t", "p0", base + dt.timedelta(hours=3)),
        ], 1)
        counts = (
            streaming_violations_with_ts(
                stream_clips(spark, in_dir), CATALOG, run_ts="2026-01-01 00:00:00"
            )
            .withWatermark("event_ts", watermark)
            .groupBy(F.window("event_ts", "1 hour").alias("w"), "rule_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "rule_id", "n")
        )
        out = str(tmp_path / f"out_{tag}")
        ck = str(tmp_path / f"ck_{tag}")

        def drain():
            q = (
                counts.writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ck).outputMode("append")
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)

        drain()
        # batch 2: ONE more violation at base — 3h behind the advanced
        # watermark — plus a base+6h row to finalize every window.
        _write_batch(spark, in_dir, [
            (None, 16000, 1000, "flac", "t", "p0", base),
            (None, 16000, 1000, "flac", "t", "p0", base + dt.timedelta(hours=6)),
        ], 2)
        drain()
        return {
            r["ws"]: r["n"]
            for r in spark.read.parquet(out).filter("rule_id = 'S_ID_NOT_NULL'").collect()
        }

    tight = run("10 minutes", "tight")
    assert tight[base] == 2          # the 2h-late third violation was DROPPED
    wide = run("3 hours", "wide")
    assert wide[base] == 3           # p100-sized bound keeps it


def test_freshness_monitor_tracks_quiet_feed(spark, tmp_path):
    """The quiet feed keeps its state across later batches (no watermark
    eviction) — a consumer diffing last_ts against the clock sees exactly
    which feed stopped and when."""
    import datetime as dt

    from data_check_spark.streaming.incremental import freshness_monitor, stream_clips

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    _write_batch(spark, in_dir, [
        ("a1", 16000, 1000, "flac", "t", "p0", base),
        ("b1", 16000, 1000, "flac", "t", "p1", base + dt.timedelta(minutes=1)),
    ], 1)

    mon = freshness_monitor(stream_clips(spark, in_dir))

    def drain():
        q = (
            mon.writeStream.format("memory").queryName("fresh_state")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r["partition"]: r for r in spark.sql("select * from fresh_state").collect()}

    s1 = drain()
    assert s1["p0"]["last_ts"] == base and s1["p0"]["n_rows"] == 1
    # batch 2: only p1 keeps producing — p0 goes quiet
    _write_batch(spark, in_dir, [
        ("b2", 16000, 1000, "flac", "t", "p1", base + dt.timedelta(hours=2)),
        ("b3", 16000, 1000, "flac", "t", "p1", base + dt.timedelta(hours=3)),
    ], 2)
    s2 = drain()
    assert s2["p1"]["last_ts"] == base + dt.timedelta(hours=3)
    assert s2["p1"]["n_rows"] == 3
    # the quiet feed's state SURVIVES — its growing staleness is the signal
    assert s2["p0"]["last_ts"] == base and s2["p0"]["n_rows"] == 1


def test_stream_validate_job_once_drains_and_resumes(spark, tmp_path):
    """spark-submit streaming entry point: --once drains the backlog into
    the row-violations sink, a relaunch with the same checkpoint resumes
    past processed files (only NEW violations append), and --stateful-dedup
    surfaces a cross-batch duplicate across the two invocations."""
    import datetime as dt

    from jobs.stream_validate_job import main as job_main

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    args = [
        "--input", in_dir, "--output-dir", out, "--checkpoint-dir", ckpt,
        "--once", "--stateful-dedup", "--run-ts", "2026-01-01 00:00:00",
        "--timeout-sec", "120",
    ]

    _write_batch(spark, in_dir,
                 [("cdup", 16000, 1000, "flac", "t", "p0", ts),
                  (None, 16000, 1000, "flac", "t", "p0", ts)], 1)
    assert job_main(list(args)) == 0
    first = spark.read.parquet(f"{out}/row_violations").count()
    assert first >= 1  # NULL clip_id fires the not-null row rule
    assert spark.read.parquet(f"{out}/stream_dup").count() == 0

    _write_batch(spark, in_dir,
                 [("cdup", -1, 1000, "flac", "t", "p1", ts)], 2)
    assert job_main(list(args)) == 0
    second = spark.read.parquet(f"{out}/row_violations").count()
    # resumed run appends only the NEW file's violations (bad sr fires)
    assert second > first
    dup_rows = spark.read.parquet(f"{out}/stream_dup").collect()
    assert sorted(r["partition"] for r in dup_rows) == ["p0", "p1"]


def test_stream_validate_job_once_survives_query_failure(spark, tmp_path, capsys):
    """A query that FAILS mid-execution (corrupt parquet file in the input)
    must not abort the drain: awaitTermination's StreamingQueryException is
    caught per query, the JSON summary is printed with the error recorded,
    and the job exits 2 — not an uncaught traceback (round-5 xhigh
    review). NOTE: both queries read the same corrupt input, so both fail;
    the point under test is the loop surviving and summarizing failures."""
    import datetime as dt
    import json as _json

    from jobs.stream_validate_job import main as job_main

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    in_dir = tmp_path / "in"
    _write_batch(spark, str(in_dir), [(None, 16000, 1000, "flac", "t", "p0", ts)], 1)
    (in_dir / "zz_corrupt.parquet").write_bytes(b"PAR1 this is not parquet")
    rc = job_main([
        "--input", str(in_dir), "--output-dir", str(tmp_path / "out"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--once", "--stateful-dedup", "--run-ts", "2026-01-01 00:00:00",
        "--timeout-sec", "120",
    ])
    assert rc == 2
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["errors"] and not summary["drained"]
    assert summary["queries"] == 2  # both queries were started and awaited
