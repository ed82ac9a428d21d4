"""PCM decode + SNR allclose (graft analog of the reference's arithmetic
consistency check, innosite.py:263-312) and transcript byte-equality."""

import numpy as np

from data_check_spark.functions.pcm import ref_freq, snr_db, synth_wave
from data_check_spark.operators.audio import audio_snr_violations, transcript_match_violations

CAP_MS = 100


def test_snr_identical_is_inf():
    w = synth_wave("clip_0123456789abcdef", 16000, 500, CAP_MS)
    assert snr_db(w, w.copy()) == float("inf")


def test_snr_corrupted_below_30db():
    w = synth_wave("clip_0123456789abcdef", 16000, 500, CAP_MS)
    rng = np.random.default_rng(7)
    noisy = np.clip(w.astype(np.int32) + rng.integers(-20000, 20000, len(w)), -32768, 32767).astype(np.int16)
    assert snr_db(w, noisy) < 30.0


def test_snr_small_dither_passes():
    w = synth_wave("clip_0123456789abcdef", 16000, 500, CAP_MS)
    dithered = (w + np.resize(np.array([1, -1], dtype=np.int16), len(w))).astype(np.int16)
    assert snr_db(w, dithered) >= 30.0


def test_snr_length_mismatch_is_neg_inf():
    w = synth_wave("clip_0123456789abcdef", 16000, 500, CAP_MS)
    assert snr_db(w, w[: len(w) // 2]) == float("-inf")


def test_ref_freq_deterministic():
    assert ref_freq("clip_0123456789abcdef") == ref_freq("clip_0123456789abcdef")
    assert ref_freq("clip_0123456789abcdef") != ref_freq("clip_fedcba9876543210")
    assert ref_freq(None) == 440.0
    assert ref_freq("not hex at all") > 0  # crc32 fallback


def _clips(spark):
    def mk(cid, sr, dur, payload):
        return (cid, payload, sr, dur, "flac", "t", "p0")

    good = synth_wave("clip_00000000000000aa", 16000, 500, CAP_MS)
    rng = np.random.default_rng(3)
    bad = np.clip(good.astype(np.int32) + rng.integers(-25000, 25000, len(good)), -32768, 32767).astype(np.int16)
    rows = [
        mk("clip_00000000000000aa", 16000, 500, bytearray(good.tobytes())),
        mk("clip_00000000000000bb", 16000, 500, bytearray(bad.tobytes())),      # corrupted
        mk("clip_00000000000000cc", 16000, 500, bytearray(good.tobytes()[:100])),  # truncated
        mk("clip_00000000000000dd", 16000, 500, bytearray(b"")),                # empty
        mk("clip_00000000000000ee", 16000, 500, None),                          # null payload
    ]
    return spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string, partition string",
    )


def test_audio_snr_violations(spark):
    # clip bb's payload was synthesized for clip aa → SNR fails for bb.
    out = audio_snr_violations(_clips(spark), "SNR", cap_ms=CAP_MS).collect()
    got = {r["clip_id"] for r in out}
    assert got == {
        "clip_00000000000000bb",
        "clip_00000000000000cc",
        "clip_00000000000000dd",
        "clip_00000000000000ee",
    }


def test_transcript_match(spark):
    clips = spark.createDataFrame(
        [("a", "こんにちは", "p0"), ("b", "hello", "p0"), ("c", "x", "p0")],
        "clip_id string, transcript string, partition string",
    )
    dim = spark.createDataFrame(
        [("a", "こんにちは"), ("b", "HELLO"), ("zz", "orphan text")],
        "clip_id string, transcript_ref string",
    )
    out = transcript_match_violations(clips, dim, "TM").collect()
    # only b mismatches; c has no dim row (referential rule's job, not this one)
    assert {r["clip_id"] for r in out} == {"b"}


def test_prepare_clips_audio_features(spark):
    """Audio quality features from the single wide pass: clean clips are
    unclipped with matching tone frequency; corrupt clips clip and drift."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_check_spark.datagen import BUCKETS, clips_df
    from data_check_spark.operators.audio import prepare_clips

    clips = clips_df(spark, 4000, bytes_cap_ms=50)
    prep = prepare_clips(clips.drop("_gen_id"), cap_ms=50)
    lo, hi = BUCKETS["bytes_corrupt"]
    rows = prep.select("_viol", "clip_ratio", "rms_db", "freq_err_ratio").filter(
        F.col("clip_ratio").isNotNull()
    ).collect()
    clean = [r for r in rows if not (lo <= r["_viol"] < hi) and r["_viol"] >= 200]
    corrupt = [r for r in rows if lo <= r["_viol"] < hi]
    assert clean and corrupt
    assert all(r["clip_ratio"] == 0.0 for r in clean)
    assert all(r["freq_err_ratio"] < 0.12 for r in clean if r["freq_err_ratio"] is not None)
    assert np.mean([r["clip_ratio"] > 0.001 for r in corrupt]) > 0.5
    # clean sine at amplitude 0.5 sits near -9 dBFS
    lv = [r["rms_db"] for r in clean]
    assert -12.0 < float(np.median(lv)) < -6.0


def test_features_computed_without_snr_rule(spark):
    """clip_ratio/rms_db/freq_err_ratio must be present even when the
    catalog has no audio_decode rule (with_snr=False) — the clipping/
    silence/frequency rules depend on them."""
    from pyspark.sql import functions as F

    from data_check_spark.datagen import clips_df
    from data_check_spark.operators.audio import prepare_clips

    clips = clips_df(spark, 500, with_bytes=True).drop("_gen_id", "_viol")
    out = prepare_clips(clips, with_snr=False)
    row = out.filter(F.col("clip_ratio").isNotNull()).limit(1).collect()
    assert row, "no features computed in the with_snr=False pass"
    assert out.filter(F.col("_snr_db").isNotNull()).count() == 0  # SNR stays off


def test_max_quiet_run_ms():
    import numpy as np

    from data_check_spark.functions.pcm import max_quiet_run_ms

    sr = 1000  # 1 sample = 1 ms
    loud = np.full(100, 10_000, dtype=np.int16)
    gap = np.zeros(250, dtype=np.int16)
    x = np.concatenate([loud, gap, loud, gap[:50], loud])
    assert max_quiet_run_ms(x, sr) == 250.0
    assert max_quiet_run_ms(loud, sr) == 0.0
    # all-quiet clip: the run is the whole clip
    assert max_quiet_run_ms(gap, sr) == 250.0
    # full-scale-negative samples are NOT quiet (int16 abs overflow hazard)
    assert max_quiet_run_ms(np.full(10, -32768, dtype=np.int16), sr) == 0.0
    assert np.isnan(max_quiet_run_ms(np.zeros(0, dtype=np.int16), sr))


def test_dead_air_rule_via_wide_pass(spark):
    """silence_run_ms flows from the wide pass into an ordinary cross_column
    rule: a clip with a long internal gap fires, a continuous tone does not
    — even though both have healthy overall RMS."""
    import numpy as np

    from data_check_spark.engine import run_validation
    from data_check_spark.functions.pcm import synth_wave
    from data_check_spark.rules.spec import Rule, RuleCatalog

    sr, dur = 8000, 1000
    tone = synth_wave("clip_0000000a", sr, dur, cap_ms=dur)
    gapped = tone.copy()
    gapped[2000:6000] = 0  # 4000 samples = 500 ms of dead air
    rows = [
        ("clip_0000000a", tone.tobytes(), sr, dur, "wav", "t", "p0"),
        ("clip_0000000b", gapped.tobytes(), sr, dur, "wav", "t", "p0"),
    ]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,"
        " transcript string, partition string",
    )
    catalog = RuleCatalog([
        Rule("AUDIO_DEAD_AIR", "cross_column", None,
             {"expr": "silence_run_ms > 300",
              "observed_expr": "concat('silence_run_ms=', format_string('%.1f', silence_run_ms))"},
             name="dead air > 300ms"),
        # an audio_decode rule forces the wide pass; cap >= dur so the gap is decoded
        Rule("PCM_SNR", "audio_decode", "bytes", {"snr_db_min": 30.0, "cap_ms": dur}),
    ])
    res = run_validation(spark, df, {}, catalog, run_ts="2026-01-01 00:00:00")
    fired = {(r.rule_id, r.clip_id) for r in res.violations.collect()}
    assert ("AUDIO_DEAD_AIR", "clip_0000000b") in fired
    assert ("AUDIO_DEAD_AIR", "clip_0000000a") not in fired


def test_augmentation_plan_deterministic_and_shaped(spark):
    from data_check_spark.operators.audio import augmentation_plan

    clips = spark.createDataFrame([("clip_a",), ("clip_b",)], "clip_id string")
    out = augmentation_plan(clips, n_variants=4).collect()
    assert len(out) == 8
    by_key = {(r["clip_id"], r["variant"]): r for r in out}
    # variant 0 is the clean pass-through
    for c in ("clip_a", "clip_b"):
        r0 = by_key[(c, 0)]
        assert r0["speed_permille"] == 1000
        assert r0["noise_kind"] is None and r0["noise_snr_db"] is None
    # perturbed variants draw from the declared domains
    for (c, v), r in by_key.items():
        if v == 0:
            continue
        assert r["speed_permille"] in (900, 1000, 1100)
        assert r["noise_kind"] in ("babble", "music", "street", "white")
        assert 5 <= r["noise_snr_db"] <= 30
    # pure function of (id, variant): a rerun reproduces byte-identical rows
    again = {(r["clip_id"], r["variant"]): (r["speed_permille"], r["noise_kind"], r["noise_snr_db"])
             for r in augmentation_plan(clips, n_variants=4).collect()}
    assert again == {k: (r["speed_permille"], r["noise_kind"], r["noise_snr_db"])
                     for k, r in by_key.items()}
    # no shuffle in the plan
    plan = augmentation_plan(clips, n_variants=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_augmentation_plan_guards(spark):
    import pytest

    from data_check_spark.operators.audio import augmentation_plan

    clips = spark.createDataFrame([("c",)], "clip_id string")
    with pytest.raises(ValueError):
        augmentation_plan(clips, n_variants=0)
    with pytest.raises(ValueError):
        augmentation_plan(clips, snr_min_db=10, snr_max_db=10)


def test_spectral_features_pure_tone_physics(spark):
    """Independent physics checks: a pure tone's centroid sits at the tone
    frequency; an 8 kHz-bandlimited signal has no mel energy above 4 kHz."""
    import numpy as np

    sr, n_fft, n_mels = 16000, 512, 16
    t = np.arange(sr)  # 1 second
    tone = (10000 * np.sin(2 * np.pi * 2000.0 * n_fft / sr * t / n_fft)).astype(np.int16)
    # exact bin: 2000 Hz = bin 64 of 512 @ 16 kHz → rectangular window is leak-free
    low = (10000 * np.sin(2 * np.pi * 500.0 * t / sr)).astype(np.int16)
    rows = [
        ("tone2k", tone.tobytes(), sr),
        ("low500", low.tobytes(), sr),
        ("empty", b"", sr),
        ("null", None, sr),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int")
    from data_check_spark.operators.audio import spectral_features

    out = {r["clip_id"]: r for r in spectral_features(df, n_mels=n_mels, n_fft=n_fft).collect()}

    assert abs(out["tone2k"]["centroid_hz"] - 2000.0) < 40.0
    assert abs(out["low500"]["centroid_hz"] - 500.0) < 40.0
    assert out["tone2k"]["n_frames"] == sr // n_fft

    # bandwidth: the 500 Hz signal's high-band mel energy is ~floor while the
    # 2 kHz tone puts its energy in a higher band
    mel_low = out["low500"]["log_mel"]
    assert len(mel_low) == n_mels
    top_band_low = max(range(n_mels), key=lambda k: mel_low[k])
    top_band_tone = max(range(n_mels), key=lambda k: out["tone2k"]["log_mel"][k])
    assert top_band_tone > top_band_low

    assert out["empty"]["n_frames"] == 0 and out["empty"]["log_mel"] is None
    assert out["null"]["n_frames"] == 0 and out["null"]["centroid_hz"] is None


def test_spectral_features_parseval(spark):
    """Parseval: mean per-bin power over rfft bins reconstructs frame energy
    (within float tolerance) — an independent check the FFT path is wired
    right, not a copy of the implementation."""
    import numpy as np

    rng_free = (np.arange(2048) * 2654435761 % 65536 - 32768).astype(np.int16)
    sr, n_fft = 8000, 256
    df = spark.createDataFrame(
        [("x", rng_free.tobytes(), sr)], "clip_id string, bytes binary, sr_hz int"
    )
    from data_check_spark.operators.audio import spectral_features

    row = spectral_features(df, n_fft=n_fft).collect()[0]
    x = rng_free.astype(np.float64)
    frames = x.size // n_fft
    seg = x[: frames * n_fft].reshape(frames, n_fft)
    # Parseval for rfft: sum |X_k|^2 (with conjugate-symmetric doubling of
    # interior bins) = n_fft * sum x^2
    spec = np.abs(np.fft.rfft(seg, axis=1)) ** 2
    doubled = spec.copy()
    doubled[:, 1:-1] *= 2
    assert np.allclose(doubled.sum(axis=1), n_fft * (seg ** 2).sum(axis=1), rtol=1e-9)
    assert row["n_frames"] == frames
