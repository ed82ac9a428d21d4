"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship audio-clip validation (full rule catalog over a
deterministic synthetic clip table, BASELINE.json ``input_hint`` shape).
``queries`` exposes one entry per implemented operator family from
SURVEY.md §2 over the driver's parquet tables; ``oracle_sql`` provides the
DuckDB-equivalent SQL for every SQL-expressible one. Clip-table queries
(pandas-UDF audio decode, t-digest drift) have no DuckDB view → rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

CLIP_ROWS = {"0.001": 1000, "0.01": 4000, "0.1": 20000}


def _sf_of(sf_dir: str) -> str:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return m.group(1) if m else "0.01"


def _clip_validation(spark: SparkSession, n_rows: int):
    from data_check_spark import datagen
    from data_check_spark.engine import run_validation
    from data_check_spark.operators.drift import make_baseline

    clips = datagen.clips_df(spark, n_rows, bytes_cap_ms=50).drop("_gen_id", "_viol")
    baseline = make_baseline(
        spark, datagen.clips_df(spark, n_rows, with_bytes=False).drop("_gen_id", "_viol"),
        ["dur_ms", "sr_hz"],
    )
    # codec whitelist is a value_in_set rule (CODEC_SET) in the catalog, not a
    # dim-driven referential check — no codec_whitelist dim to wire here.
    dims = {
        "transcripts": datagen.transcripts_df(spark, n_rows),
        "baseline_stats": baseline,
    }
    from data_check_spark.rules.catalog_audio import audio_catalog

    return run_validation(
        spark, clips, dims, audio_catalog(bytes_cap_ms=50),
        run_ts="2026-01-01 00:00:00",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full audio-clip rule-set pass; returns the violation rows."""
    result = _clip_validation(spark, CLIP_ROWS["0.001"])
    return result.violations.orderBy("rule_id", "clip_id", "partition", "observed")


def _clips_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = _clip_validation(spark, CLIP_ROWS.get(_sf_of(sf_dir), 4000))
    return result.violations.orderBy("rule_id", "clip_id", "partition", "observed")


def _clips_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = _clip_validation(spark, CLIP_ROWS.get(_sf_of(sf_dir), 4000))
    return result.verdicts.select(
        "partition", "passed", "rows_scanned", "violations"
    ).orderBy("partition")


def _clips_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_check_spark.reporting import top_rules

    result = _clip_validation(spark, CLIP_ROWS.get(_sf_of(sf_dir), 4000))
    return top_rules(result.violations, k=None)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_check_spark.queries import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    out["clips_validate_full"] = _clips_violations
    out["clips_partition_verdicts"] = _clips_verdicts
    out["clips_rule_summary"] = _clips_summary
    return out


def oracle_sql() -> dict[str, str]:
    from data_check_spark.queries import ORACLES

    return dict(ORACLES)
