"""Multimodal plumbing: schema, batch shape, stubbed decode seam."""

import pytest

from data_check_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synthetic_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media_df(spark, 300)


def test_feature_extraction_contract(media):
    out = extract_features(media).collect()
    assert len(out) == 300
    ok = [r for r in out if r["ok"]]
    bad = [r for r in out if not r["ok"]]
    assert ok and bad  # fixture plants some null payloads
    for r in ok:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        assert r["error"] is None
    for r in bad:
        assert r["feature"] is None
        assert r["error"] == "empty payload"


def test_feature_determinism(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect() if r["ok"]}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect() if r["ok"]}
    assert a == b


def test_real_decoder_seam_is_error_as_data(spark, media):
    """decode_stub=False on payloads with no available decoder (the
    synthetic fixture's pseudo-bytes) degrades to ok=false rows naming the
    plug-in seam — never a job failure."""
    rows = extract_features(media.limit(5), decode_stub=False).collect()
    assert rows
    for r in rows:
        assert not r["ok"]
        assert r["error"] is not None


def test_frame_sample_plan(spark):
    media = synthetic_media_df(spark, 200)
    plan = frame_sample_plan(media, every_ms=1000, max_frames=8)
    rows = plan.collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    for frames in by_id.values():
        idxs = [i for i, _ in sorted(frames)]
        assert idxs == list(range(len(idxs)))
        assert len(frames) <= 8
        assert all(ts == i * 1000 for i, ts in frames)


def _wav_bytes(sr=16000, dur_ms=250, freq=440.0, n_ch=1):
    import io
    import wave

    import numpy as np

    n = int(sr * dur_ms / 1000)
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    if n_ch == 2:
        x = np.column_stack([x, x]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_real_wav_decode_features(spark):
    """decode_stub=False REALLY decodes RIFF/WAV payloads (stdlib wave):
    channels, sample rate, duration and level come from the actual audio."""
    from data_check_spark.operators.multimodal import extract_features

    rows = [
        ("a1", "audio", _wav_bytes(sr=16000, dur_ms=250), None, "p0"),
        ("a2", "audio", _wav_bytes(sr=48000, dur_ms=100, n_ch=2), None, "p0"),
        ("a3", "audio", b"RIFFgarbage-not-a-real-wav", None, "p0"),
        ("i1", "image", b"\x89PNG\r\n\x1a\nfakepng", None, "p0"),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, payload binary, "
        "meta map<string,string>, partition string",
    )
    out = {r["media_id"]: r for r in extract_features(df, decode_stub=False).collect()}
    f1 = out["a1"]["feature"]
    assert out["a1"]["ok"] and abs(f1[2] - 0.25) < 1e-6      # duration 0.25s
    assert abs(f1[1] - 16000 / 48000) < 1e-6                  # sample rate
    assert abs(f1[3] - 0.5 / (2 ** 0.5)) < 0.01               # sine rms ~ A/sqrt(2)
    f2 = out["a2"]["feature"]
    assert out["a2"]["ok"] and f2[0] == 2.0 and abs(f2[1] - 1.0) < 1e-6
    assert not out["a3"]["ok"] and "Error" in out["a3"]["error"]
    assert not out["i1"]["ok"] and "no decoder" in out["i1"]["error"]


def test_non_wav_riff_goes_to_no_decoder_seam(spark):
    """WebP/AVI are RIFF containers but not WAVE — they must hit the
    'no decoder' seam, not a misleading wav-parse error."""
    from data_check_spark.operators.multimodal import extract_features

    webp = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBPVP8 fake-webp-bytes"
    df = spark.createDataFrame(
        [("w1", "image", webp, None, "p0")],
        "media_id string, media_type string, payload binary, "
        "meta map<string,string>, partition string",
    )
    r = extract_features(df, decode_stub=False).collect()[0]
    assert not r["ok"] and "no decoder" in r["error"]


def test_frame_plan_bad_duration_plans_zero_frames(spark):
    """Negative/garbage dur_ms metadata must plan ZERO frames — Spark's
    sequence(0, -1) otherwise descends and emits negative timestamps."""
    from data_check_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [("m1", "video", None, {"dur_ms": "-500"}),
         ("m2", "video", None, {"dur_ms": "2500"})],
        "media_id string, media_type string, payload binary, meta map<string,string>",
    )
    rows = frame_sample_plan(media).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    assert "m1" not in by_id
    assert sorted(by_id["m2"]) == [(0, 0), (1, 1000), (2, 2000)]


def test_portable_media_df_matches_python_md5(spark):
    """Engine-independent recompute of the portable fixture: hashlib-derived
    (media_type, NULL routing, payload length, partition) must equal the
    Spark columns — the same cross-check discipline as the portable LSH and
    audio-stats oracles."""
    import hashlib

    from data_check_spark.operators.multimodal import portable_media_df

    ids = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    rows = {r["media_id"]: r for r in portable_media_df(ids).collect()}
    assert len(rows) == 400
    saw_null = False
    for i in range(400):
        hx = hashlib.md5(f"{i}:media".encode()).hexdigest()
        h = int(hx[:15], 16)
        r = rows[f"m_{i}"]
        assert r["media_type"] == ["image", "audio", "video"][h % 3]
        assert r["partition"] == f"p{h % 16:02d}"
        assert r["meta"]["dur_ms"] == str(h % 30000 + 500)
        if h % 97 == 0:
            saw_null = True
            assert r["payload"] is None
        else:
            assert bytes(r["payload"]).decode() == "blob_" + hx[: 5 + h % 28]
    assert saw_null  # the NULL-payload seam must be exercised


def test_media_feature_extract_flags_null_payloads(spark):
    """The oracle-checked query shape: NULL payloads surface as error-data
    rows with n_bytes=0; everything else is ok with the analytic length."""
    from data_check_spark.operators.multimodal import extract_features, portable_media_df

    ids = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    out = extract_features(portable_media_df(ids)).collect()
    bad = [r for r in out if not r["ok"]]
    assert bad and all(r["error"] == "empty payload" and r["n_bytes"] == 0 for r in bad)
    assert all(10 <= r["n_bytes"] <= 37 for r in out if r["ok"])


def test_ppm_parse_and_image_stats_handcrafted(spark):
    import numpy as np

    from data_check_spark.operators.multimodal import _parse_p6, image_stats

    # 2x1 image: pixels (10,20,30) and (40,50,60)
    good = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    w, h, maxval, rgb = _parse_p6(good)
    assert (w, h, maxval) == (2, 1, 255)
    assert rgb.tolist() == [10, 20, 30, 40, 50, 60]
    # arbitrary whitespace between header tokens is legal PPM
    wide = b"P6  2\n\n1\t255\n" + bytes([10, 20, 30, 40, 50, 60])
    assert _parse_p6(wide)[:3] == (2, 1, 255)

    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"P5\n2 1\n255\n" + bytes(6))),      # wrong magic
        (3, bytearray(b"P6\n2 1\n255\n" + bytes(5))),       # truncated raster
        (4, bytearray(b"P6\n2 1\n70000\n" + bytes(6))),     # 16-bit maxval unsupported
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in image_stats(df, keep=["doc_id"]).collect()}
    r1 = out[1]
    assert (r1["width"], r1["height"], r1["maxval"], r1["n_pixels"]) == (2, 1, 255, 2)
    assert (r1["sum_r"], r1["sum_g"], r1["sum_b"]) == (50, 70, 90)
    for bad in (2, 3, 4, 5):
        assert all(
            out[bad][c] is None
            for c in ("width", "height", "maxval", "n_pixels", "sum_r", "sum_g", "sum_b")
        ), bad


def test_synth_ppm_roundtrip_closed_form(spark):
    """synth → real decode must reproduce the analytic channel sums the
    DuckDB oracle states (the invariant image_stats_documents relies on)."""
    from data_check_spark.operators.multimodal import image_stats, synth_ppm

    params = spark.createDataFrame(
        [(1, 8, 8, 0, 100, 200), (2, 39, 23, 200, 1, 17)],
        "doc_id bigint, w int, h int, r_base int, g_base int, b_base int",
    )
    out = {r["doc_id"]: r for r in
           image_stats(synth_ppm(params, keep=["doc_id"]), keep=["doc_id"]).collect()}

    def S(n):
        q, r = divmod(n, 16)
        return q * 120 + r * (r - 1) // 2

    for doc, w, h, rb, gb, bb in [(1, 8, 8, 0, 100, 200), (2, 39, 23, 200, 1, 17)]:
        n = w * h
        r = out[doc]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, n)
        assert r["sum_r"] == n * rb + S(n)
        assert r["sum_g"] == n * gb + S(n)
        assert r["sum_b"] == n * bb + S(n)


def test_real_ppm_decode_features(spark):
    """extract_features(decode_stub=False) must route P6 payloads through
    the real image decoder (ok=true, geometry + channel means in the vec)."""
    from data_check_spark.operators.multimodal import extract_features

    payload = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 255, 0, 0])  # pure red
    df = spark.createDataFrame(
        [("img1", "image", bytearray(payload), None, "p00")],
        "media_id string, media_type string, payload binary, "
        "meta map<string,string>, partition string",
    )
    row = extract_features(df, decode_stub=False).collect()[0]
    assert row["ok"] is True
    vec = row["feature"]
    assert abs(vec[0] - 0.002) < 1e-6 and abs(vec[1] - 0.001) < 1e-6  # w, h /1k
    assert abs(vec[3] - 1.0) < 1e-6 and vec[4] == 0.0 and vec[5] == 0.0  # means


def test_sniff_container_magic_bytes(spark):
    from data_check_spark.operators.multimodal import sniff_container

    cases = [
        ("wav", b"RIFF\x24\x00\x00\x00WAVEfmt "),
        ("webp_riff", b"RIFF\x24\x00\x00\x00WEBPVP8 "),  # RIFF but NOT wav
        ("avi_riff", b"RIFF\x24\x00\x00\x00AVI LIST"),
        ("flac", b"fLaC\x00\x00\x00\x22"),
        ("ogg", b"OggS\x00\x02"),
        ("jpeg", b"\xff\xd8\xff\xe0\x00\x10JFIF"),
        ("png", b"\x89PNG\r\n\x1a\x0aIHDR"),
        ("ppm_nl", b"P6\n4 2\n255\n"),
        ("ppm_sp", b"P6 4 2 255 "),
        ("mp3", b"ID3\x04\x00"),
        ("mp4", b"\x00\x00\x00\x20ftypisom"),
        ("garbage", b"\x00\x11\x22\x33\x44\x55\x66\x77\x88"),
        ("short", b"P"),
        ("empty", b""),
        ("null", None),
    ]
    df = spark.createDataFrame(
        [(n, bytearray(b) if b is not None else None) for n, b in cases],
        "name string, payload binary",
    )
    got = {r["name"]: r["s"] for r in df.select("name", sniff_container("payload").alias("s")).collect()}
    assert got["wav"] == "wav"
    assert got["webp_riff"] == "unknown"  # RIFF without WAVE fourcc
    assert got["avi_riff"] == "unknown"
    assert got["flac"] == "flac"
    assert got["ogg"] == "ogg"
    assert got["jpeg"] == "jpeg"
    assert got["png"] == "png"
    assert got["ppm_nl"] == "ppm"
    assert got["ppm_sp"] == "ppm"
    assert got["mp3"] == "mp3"
    assert got["mp4"] == "mp4"
    assert got["garbage"] == "unknown"
    assert got["short"] == "unknown"
    assert got["empty"] == "unknown"
    assert got["null"] is None


def test_sniff_container_jvm_only_plan(spark):
    from data_check_spark.operators.multimodal import sniff_container

    df = spark.createDataFrame([(bytearray(b"fLaC"),)], "payload binary")
    plan = (
        df.select(sniff_container("payload").alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
