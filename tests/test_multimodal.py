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


def test_real_decoder_seam_raises(spark, media):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as exc:
        extract_features(media.limit(5), decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(exc.value, Py4JJavaError)


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
