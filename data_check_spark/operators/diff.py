"""Snapshot diff: what changed between two versions of a table.

The ops counterpart of the drift family: drift asks "did the
*distribution* move", this asks "which *rows* moved" — the daily
"yesterday's ingest vs today's" audit (CDC-lite) that a validation
pipeline runs before re-certifying a 10^12-row table. The reference has
no analog (its runs are one-shot, dekispart.py:1141); this is part of the
operational surface the graft adds.

Plan shape at 100 TB:
- Each side is reduced MAP-SIDE to ``(key…, fingerprint)`` — the md5 of
  the compared columns — before the join, so the key-keyed exchange
  carries two strings per row, never payloads.
- The classification is one full-outer join on the key columns
  (sort-merge at scale, AQE-broadcast if one snapshot is tiny) and a
  four-way CASE; unchanged rows are dropped immediately, so the result is
  proportional to the churn, not the table.
- The fingerprint uses a NULL sentinel + unit separator so (NULL, "a")
  and ("a", NULL) fingerprint differently, and is engine-neutral
  (md5/concat_ws evaluate identically in DuckDB — oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\u2400"  # SYMBOL FOR NULL - never appears in real values
SEP = "\x1f"  # unit separator: ("ab","c") and ("a","bc") must differ


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over the compared columns, NULL-safe and order-sensitive."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in cols]
    return F.md5(F.encode(F.concat_ws(SEP, *parts), "UTF-8"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Per-key change classification between two snapshots.

    Returns one row per key that is NOT identical in both snapshots:
    ``(key…, change_type)`` with ``change_type`` ∈ {'added', 'removed',
    'changed'}. Keys must be unique per snapshot (it's a key); compared
    columns are explicit so a caller adding an audit column doesn't
    silently flip every row to 'changed'.
    """
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    overlap = set(key_cols) & set(compare_cols)
    if overlap:
        raise ValueError(f"key and compare columns overlap: {sorted(overlap)}")
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("_fp_old"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("_fp_new"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per change_type over :func:`snapshot_diff` output."""
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_keys"))
