"""Integer-exact PCM stats: decode edge cases, synth closed forms, and the
python-md5 cross-check of the oracle-checked query (same pattern as
test_sampling's engine-independent recompute)."""

import hashlib

import numpy as np
import pytest

from data_check_spark.operators.audio import pcm_stats, synth_square_pcm


def _stats_rows(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None) for i, b in enumerate(payloads)],
        "id int, bytes binary",
    )
    out = pcm_stats(df).collect()
    return {r["id"]: r for r in sorted(out, key=lambda r: r["id"])}


def test_pcm_stats_handcrafted(spark):
    square = np.array([0, 0, 7, 7, -7, -7, 7], dtype="<i2").tobytes()
    fullscale_neg = np.array([-32768, 100], dtype="<i2").tobytes()
    allzero = np.zeros(5, dtype="<i2").tobytes()
    rows = _stats_rows(
        spark,
        [square, fullscale_neg, allzero, b"", None, b"\x01"],  # odd length last
    )
    r = rows[0]
    assert (r["n_samples"], r["lead_silence"], r["peak_abs"]) == (7, 2, 7)
    assert r["dc_sum"] == 7  # 3 pos - 2 neg of +/-7
    assert r["energy"] == 5 * 49
    # int16 abs(-32768) overflow trap: peak must be 32768, not -32768
    assert rows[1]["peak_abs"] == 32768
    assert rows[1]["dc_sum"] == -32768 + 100
    assert rows[1]["energy"] == 32768 * 32768 + 100 * 100
    # all-zero payload: leading silence spans the whole clip
    assert (rows[2]["lead_silence"], rows[2]["peak_abs"], rows[2]["energy"]) == (5, 0, 0)
    # empty payload decodes to zero samples, not NULL
    assert (rows[3]["n_samples"], rows[3]["lead_silence"], rows[3]["energy"]) == (0, 0, 0)
    # NULL and odd-length (undecodable int16) payloads yield NULL stats
    for i in (4, 5):
        assert all(
            rows[i][c] is None
            for c in ("n_samples", "lead_silence", "peak_abs", "dc_sum", "energy")
        )


def _closed_form(n, lead, amp, k):
    wave = n - lead
    r = wave % (2 * k)
    dc = (min(r, k) - max(r - k, 0)) * amp
    return {
        "n_samples": n,
        "lead_silence": lead if wave > 0 else n,
        "peak_abs": amp if wave > 0 else 0,
        "dc_sum": dc,
        "energy": wave * amp * amp,
    }


@pytest.mark.parametrize(
    "n,lead,amp,k",
    [
        (10, 0, 5, 1),      # no silence, fastest alternation
        (11, 3, 100, 4),    # remainder lands mid-positive half
        (16, 0, 32000, 4),  # exact full periods -> dc_sum 0
        (9, 2, 7, 3),       # remainder spills into the negative half
        (5, 5, 9, 2),       # all silence: wave length 0
    ],
)
def test_synth_square_matches_closed_form(spark, n, lead, amp, k):
    df = spark.createDataFrame([(n, lead, amp, k)], "n int, lead int, amp int, k int")
    row = pcm_stats(synth_square_pcm(df), keep=["n"]).collect()[0]
    expect = _closed_form(n, lead, amp, k)
    for col, val in expect.items():
        assert row[col] == val, (col, row[col], val)


def _md5_long60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_audio_stats_query_python_md5_crosscheck(spark):
    """Engine-independent recompute: hashlib-derived params -> closed form
    must equal what the Spark query produced from real decoded bytes."""
    from data_check_spark.queries import QUERIES

    out = {r["doc_id"]: r for r in QUERIES["audio_stats_documents"](spark, "/root/testdata/sf0.001").collect()}
    assert len(out) > 0
    for doc_id, row in list(sorted(out.items()))[:25]:
        n = 800 + _md5_long60(f"{doc_id}:n") % 1600
        lead = _md5_long60(f"{doc_id}:l") % 200
        amp = 1000 + _md5_long60(f"{doc_id}:a") % 31000
        k = 4 + _md5_long60(f"{doc_id}:k") % 28
        expect = _closed_form(n, lead, amp, k)
        for col, val in expect.items():
            assert row[col] == val, (doc_id, col, row[col], val)
