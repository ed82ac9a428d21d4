"""Vectorized audio validation (pandas/Arrow UDFs; zero per-row driver Python).

Graft analog of the reference's arithmetic-consistency rule (INNOSITE
CHK_0002, innosite.py:263-312: recompute the expected value, compare with
tolerance). Here the "expected value" is the reference PCM decode
(functions/pcm.py) and the tolerance is the SNR>=30dB allclose gate from
BASELINE.json ``input_hint``.

Everything runs inside one scalar pandas UDF per Arrow batch: decode
(``np.frombuffer`` on int16), reference synthesis, SNR — the rule stays in
the same single scan as the row-local rules (it's just another projected
column), so the audio check adds NO extra pass over the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_check_spark.functions.pcm import snr_db, synth_wave

# Column name the engine uses for the precomputed per-row SNR (written by the
# single wide-table pass in engine.run_validation, consumed by
# snr_column_violations so no rule ever re-reads the binary column).
SNR_COL = "_snr_db"


def prepare_clips(df: DataFrame, *, cap_ms: int = 100, with_snr: bool = True) -> DataFrame:
    """The engine's single wide pass as ONE mapInPandas stage.

    Reads every row (incl. the binary payload) exactly once, emits the same
    row minus ``bytes`` plus ``byte_len`` and the decoded-PCM SNR. Implemented
    with mapInPandas rather than a scalar pandas_udf deliberately: the
    ArrowEvalPython batch-join-back path degrades ~12x at local[32] when its
    output is materialized (measured 106s vs 8.6s for the identical work),
    while MapInPandas streams whole Arrow batches through cleanly.
    """
    out_fields = [f for f in df.schema.fields if f.name != "bytes"]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += (
        f", byte_len long, {SNR_COL} double, clip_ratio double, rms_db double,"
        " freq_err_ratio double"
    )
    keep = [f.name for f in out_fields]

    def run(batches):
        from data_check_spark.functions.pcm import audio_features, ref_freq

        for pdf in batches:
            n = len(pdf)
            byte_len = np.full(n, np.nan, dtype=np.float64)
            snr = np.full(n, np.nan, dtype=np.float64)
            clip_ratio = np.full(n, np.nan, dtype=np.float64)
            rms_arr = np.full(n, np.nan, dtype=np.float64)
            freq_err = np.full(n, np.nan, dtype=np.float64)
            payloads = pdf["bytes"].to_numpy(dtype=object)
            cids = pdf["clip_id"].to_numpy(dtype=object)
            srs = pdf["sr_hz"].to_numpy(dtype=object)
            durs = pdf["dur_ms"].to_numpy(dtype=object)
            for i in range(n):
                b = payloads[i]
                if b is None:
                    continue
                byte_len[i] = len(b)
                sr, dur = srs[i], durs[i]
                if pd.isna(sr) or len(b) % 2 != 0:
                    continue
                decoded = np.frombuffer(b, dtype=np.int16)
                # Cheap per-row features are computed whenever the payload
                # decodes — NOT gated on with_snr: the clipping/silence/
                # frequency rules must still see them in a catalog that has
                # no (expensive) SNR rule.
                cr, rms, est = audio_features(decoded, int(sr))
                clip_ratio[i] = cr
                rms_arr[i] = rms if np.isfinite(rms) else -200.0
                expected = ref_freq(cids[i])
                nyquist = int(sr) / 2.0
                if decoded.size and expected > 0 and expected < nyquist:
                    freq_err[i] = abs(est - expected) / expected
                if not with_snr or pd.isna(dur):
                    continue
                ref = synth_wave(cids[i], int(sr), int(dur), cap_ms)
                val = snr_db(ref, decoded)
                snr[i] = val if np.isfinite(val) else (1e9 if val > 0 else -1e9)
            out = pdf[keep].copy()
            out["byte_len"] = byte_len
            out[SNR_COL] = snr
            out["clip_ratio"] = clip_ratio
            out["rms_db"] = rms_arr
            out["freq_err_ratio"] = freq_err
            yield out

    return df.mapInPandas(run, schema=schema)


def snr_column_violations(
    df: DataFrame,
    rule_id: str,
    *,
    snr_col: str = SNR_COL,
    snr_db_min: float = 30.0,
    gate: Column | None = None,
    id_col: str = "clip_id",
    partition_col: str | None = "partition",
) -> DataFrame:
    """Violations from an already-computed SNR column (no bytes access)."""
    scoped = df.filter(gate) if gate is not None else df
    part = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    return (
        scoped.filter(F.col(snr_col).isNull() | (F.col(snr_col) < F.lit(snr_db_min)))
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(id_col).cast("string").alias("clip_id"),
            part.alias("partition"),
            # %.2f (not a default double→string cast — CLAUDE.md) and a
            # null-safe coalesce: concat(NULL) would null out the whole
            # observed string for undecodable rows.
            F.concat(
                F.lit("snr_db="),
                F.coalesce(F.format_string("%.2f", F.col(snr_col)), F.lit("null")),
            ).alias("observed"),
        )
    )


def snr_udf(cap_ms: int = 100):
    """pandas UDF: (bytes, clip_id, sr_hz, dur_ms) → SNR in dB (double).

    NaN = undecodable (empty/odd-length payload or length mismatch).
    """

    @F.pandas_udf("double")
    def _snr(payload: pd.Series, clip_id: pd.Series, sr_hz: pd.Series, dur_ms: pd.Series) -> pd.Series:
        out = np.full(len(payload), np.nan, dtype=np.float64)
        for i, (b, cid, sr, dur) in enumerate(zip(payload, clip_id, sr_hz, dur_ms)):
            if b is None or pd.isna(sr) or pd.isna(dur):
                continue
            if len(b) % 2 != 0:
                continue
            decoded = np.frombuffer(b, dtype=np.int16)
            ref = synth_wave(cid, int(sr), int(dur), cap_ms)
            val = snr_db(ref, decoded)
            out[i] = val if np.isfinite(val) else (1e9 if val > 0 else -1e9)
        return pd.Series(out)

    return _snr


def audio_snr_violations(
    df: DataFrame,
    rule_id: str,
    *,
    snr_db_min: float = 30.0,
    cap_ms: int = 100,
    gate: Column | None = None,
    id_col: str = "clip_id",
    partition_col: str | None = "partition",
) -> DataFrame:
    """Violations for clips whose decoded PCM misses the SNR gate."""
    scoped = df.filter(gate) if gate is not None else df
    snr = snr_udf(cap_ms)(F.col("bytes"), F.col("clip_id"), F.col("sr_hz"), F.col("dur_ms"))
    part = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    return (
        scoped.select(
            F.col(id_col).cast("string").alias("clip_id"),
            part.alias("partition"),
            snr.alias("_snr"),
        )
        .filter(F.col("_snr").isNull() | (F.col("_snr") < F.lit(snr_db_min)))
        .select(
            F.lit(rule_id).alias("rule_id"),
            "clip_id",
            "partition",
            F.concat(
                F.lit("snr_db="),
                F.coalesce(F.format_string("%.2f", F.col("_snr")), F.lit("null")),
            ).alias("observed"),
        )
    )


def transcript_match_violations(
    df: DataFrame,
    transcripts: DataFrame,
    rule_id: str,
    *,
    fact_key: str = "clip_id",
    dim_key: str = "clip_id",
    fact_text: str = "transcript",
    ref_text: str = "transcript_ref",
    partition_col: str | None = "partition",
    dim_rows: int | None = None,
) -> DataFrame:
    """Byte-equality of the clip transcript vs the reference transcript dim.

    Missing dim rows are NOT flagged here (that's the referential rule);
    this rule fires for joined rows whose UTF-8 encodings differ, with a
    NULL on either side comparing as the empty string (the engine-wide
    blank coercion, ``blank.bytes_differ``) — so NULL vs '' is equal,
    NULL vs 'text' fires. Null-presence itself is the not_null family's
    job. Blank fact keys are exempt (same convention as every referential
    operator and the fused join path — a fresh run and a resume run must
    emit identical violations).
    """
    from data_check_spark.functions.blank import bytes_differ, is_present

    dim = transcripts.select(F.col(dim_key).alias("_dk"), F.col(ref_text).alias("_ref"))
    if dim_rows is not None and dim_rows <= 5_000_000:
        dim = F.broadcast(dim)
    part = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    fact = df.filter(is_present(fact_key))
    return (
        fact.join(dim, fact[fact_key] == F.col("_dk"), "inner")
        .filter(bytes_differ(F.col(fact_text), F.col("_ref")))
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(fact_key).cast("string").alias("clip_id"),
            part.alias("partition"),
            F.substring(F.coalesce(F.col(fact_text), F.lit("<null>")), 1, 64).alias("observed"),
        )
    )
