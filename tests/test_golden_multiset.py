"""Golden planted-violation multiset (VERDICT r1 #1).

The engine's flagship clip validation has no DuckDB oracle (the clip table
is synthetic, not one of the driver's parquet views). This test closes that
hole with an INDEPENDENT reference implementation: a row-at-a-time
pandas/numpy evaluation of every non-drift rule in the audio catalog —
deliberately the reference engine's own style (dekispart.py:1141-1164
iterrows loop) — computed from the collected input table, never from the
engine's plans. The exact (rule_id, clip_id, partition) multiset must match.

Drift rules are excluded here (sketch-level semantics have dedicated tests
in test_drift.py); the waveform/SNR ground-truth definitions come from
functions/pcm.py, which is the shared "reference decoder" both the
generator and the validator derive from by design (FIXTURES.md §1).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from data_check_spark import datagen
from data_check_spark.functions.pcm import audio_features, ref_freq, snr_db, synth_wave

N_ROWS = 4000  # the driver's sf0.01 clip-row count (CLIP_ROWS in __spark_entry__)
CAP_MS = 20
PAT = re.compile(r"^clip_[0-9a-f]{16}$")
ALLOWED_SR = {str(s) for s in datagen.SR_VALUES}
ALLOWED_CODECS = set(datagen.CODECS)


def _blank(v) -> bool:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return True
    # the engine-shared explicit class, NOT python \s: the reference
    # implementation must strip exactly the same whitespace set
    from data_check_spark.functions.blank import WHITESPACE_CLASS

    return re.sub(WHITESPACE_CLASS + "+", "", str(v)) == ""


def _audio_metrics(b, cid, sr, dur):
    """Independent recomputation of the wide-pass feature columns.

    Returns (snr, clip_ratio, rms_db, freq_err) with None where the engine
    column is NULL (pandas NaN -> Arrow null on the engine side)."""
    snr = clip_ratio = rms = freq_err = None
    if b is None or pd.isna(sr) or pd.isna(dur) or len(b) % 2 != 0:
        return snr, clip_ratio, rms, freq_err
    decoded = np.frombuffer(b, dtype=np.int16)
    ref = synth_wave(cid, int(sr), int(dur), CAP_MS)
    val = snr_db(ref, decoded)
    snr = val if np.isfinite(val) else (1e9 if val > 0 else -1e9)
    cr, rms_db_v, est = audio_features(decoded, int(sr))
    clip_ratio = None if np.isnan(cr) else cr
    # mirror the wide pass: non-finite (NaN / -inf) rms stored as -200.0,
    # which Arrow keeps as a value; only byte_len>0 rows can fire silence.
    rms = rms_db_v if np.isfinite(rms_db_v) else -200.0
    expected = ref_freq(cid)
    nyquist = int(sr) / 2.0
    if decoded.size and 0 < expected < nyquist:
        freq_err = abs(est - expected) / expected
    return snr, clip_ratio, rms, freq_err


def _key(t):
    return tuple("" if v is None else str(v) for v in t)


def expected_violations(cdf: pd.DataFrame, tdf: pd.DataFrame) -> list[tuple]:
    """Row-at-a-time reference evaluation -> (rule_id, clip_id, partition)."""
    out: list[tuple] = []
    dim_keys = set(tdf["clip_id"])
    dim_ref = dict(zip(tdf["clip_id"], tdf["transcript_ref"]))

    for row in cdf.itertuples(index=False):
        cid, sr, dur = row.clip_id, row.sr_hz, row.dur_ms
        codec, tr, part, b = row.codec, row.transcript, row.partition, row.bytes
        scid = None if cid is None else str(cid)

        if _blank(cid):
            out.append(("CLIP_ID_NOT_NULL", scid, part))
        else:
            if not PAT.match(cid):
                out.append(("CLIP_ID_FORMAT", scid, part))
            if re.search(r"[ 　\r\n\t]", cid):
                out.append(("CLIP_ID_NO_WHITESPACE", scid, part))

        if pd.isna(sr):
            out.append(("SR_NOT_NULL", scid, part))
        else:
            if sr < 1:
                out.append(("SR_POSITIVE", scid, part))
            if sr > 0 and str(int(sr)) not in ALLOWED_SR:
                out.append(("SR_WHITELIST", scid, part))

        if pd.isna(dur):
            out.append(("DUR_NOT_NULL", scid, part))
        elif dur < 1 or dur > 3_600_000:
            out.append(("DUR_RANGE", scid, part))

        if _blank(codec):
            out.append(("CODEC_NOT_NULL", scid, part))
        elif codec not in ALLOWED_CODECS:
            out.append(("CODEC_WHITELIST", scid, part))

        if _blank(tr):
            out.append(("TRANSCRIPT_NOT_NULL", scid, part))
        elif re.search(r"^[★×▲■・：]", tr):
            out.append(("TRANSCRIPT_NO_MARKER", scid, part))

        blen = None if b is None else len(b)
        sr_pos = not pd.isna(sr) and sr > 0
        dur_pos = not pd.isna(dur) and dur > 0
        if dur_pos and sr_pos and (blen is None or blen == 0):
            out.append(("BYTES_PRESENT_IF_DURATION", scid, part))
        if (
            blen is not None and blen > 0 and sr_pos and dur_pos
            and blen != int(sr) * min(int(dur), CAP_MS) // 1000 * 2
        ):
            out.append(("BYTES_LENGTH_CONSISTENT", scid, part))

        snr, clip_ratio, rms, freq_err = _audio_metrics(b, cid, sr, dur)
        if clip_ratio is not None and clip_ratio > 0.001:
            out.append(("AUDIO_CLIPPING", scid, part))
        if blen is not None and blen > 0 and rms is not None and rms < -60.0:
            out.append(("AUDIO_SILENCE", scid, part))
        if freq_err is not None and freq_err > 0.12:
            out.append(("AUDIO_FREQ_MISMATCH", scid, part))
        gated = scid is not None and PAT.match(scid) and sr_pos and dur_pos
        if gated and (snr is None or snr < 30.0):
            out.append(("PCM_SNR", scid, part))

        if not _blank(cid) and PAT.match(cid) and cid not in dim_keys:
            out.append(("TRANSCRIPT_FK", scid, part))
        if not _blank(cid) and cid in dim_keys:
            ftxt = "" if tr is None else tr
            rtxt = dim_ref[cid] or ""
            if ftxt.encode("utf-8") != rtxt.encode("utf-8"):
                out.append(("TRANSCRIPT_MATCH", scid, part))

    # uniqueness (row-grain + value-grain, blank-exempt)
    present = cdf[[not _blank(c) for c in cdf["clip_id"]]]
    counts = present["clip_id"].value_counts()
    dup_values = set(counts[counts > 1].index)
    for row in present.itertuples(index=False):
        if row.clip_id in dup_values:
            out.append(("CLIP_ID_UNIQUE", str(row.clip_id), row.partition))
    for v in dup_values:
        out.append(("CLIP_ID_DUP_VALUES", str(v), None))

    # orphans: dim keys never referenced by a present fact key
    fact_keys = set(present["clip_id"])
    for k in dim_keys - fact_keys:
        out.append(("TRANSCRIPT_ORPHAN", str(k), None))

    return out


@pytest.fixture(scope="module")
def golden(spark):
    from data_check_spark.engine import run_validation
    from data_check_spark.rules.catalog_audio import audio_catalog
    from data_check_spark.rules.spec import RuleCatalog

    clips = datagen.clips_df(spark, N_ROWS, bytes_cap_ms=CAP_MS).drop("_gen_id", "_viol")
    tdf_spark = datagen.transcripts_df(spark, N_ROWS)
    catalog = RuleCatalog(
        [r for r in audio_catalog(bytes_cap_ms=CAP_MS) if r.kind not in ("drift", "cat_drift")]
    )
    res = run_validation(
        spark, clips, {"transcripts": tdf_spark}, catalog,
        run_ts="2026-01-01 00:00:00",
    )
    got = sorted(
        ((r["rule_id"], r["clip_id"], r["partition"])
         for r in res.violations.collect()),
        key=_key,
    )
    cdf = clips.toPandas()
    tdf = tdf_spark.toPandas()
    return got, cdf, tdf


def test_exact_violation_multiset(golden):
    got, cdf, tdf = golden
    want = sorted(expected_violations(cdf, tdf), key=_key)
    # Compare per-rule first for a readable diff on failure.
    import collections

    got_by_rule = collections.Counter(r for r, _, _ in got)
    want_by_rule = collections.Counter(r for r, _, _ in want)
    assert got_by_rule == want_by_rule, (
        f"per-rule counts differ: engine={dict(got_by_rule)} "
        f"reference={dict(want_by_rule)}"
    )
    assert got == want


def test_reference_and_engine_agree_on_fired_rules(golden):
    """Sanity on top of the multiset: a broad spread of rule families fires
    at n=1000 (not every 0.05% bucket is populated at this scale — the
    multiset test above is the exact gate; 20k rows fire all 24)."""
    got, cdf, tdf = golden
    fired = {r for r, _, _ in got}
    want_fired = {r for r, _, _ in expected_violations(cdf, tdf)}
    assert fired == want_fired
    assert len(fired) >= 12
