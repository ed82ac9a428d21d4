"""Functional-dependency check: determinant columns must determine a value.

The classic integrity constraint the reference encodes ad-hoc as
"contract rows disagree on a per-contract attribute" style cross-checks
(e.g. the per-key consistency expectations behind dekispart.py:234-245's
uniqueness precompute): for every distinct determinant tuple X, the
dependent column Y must take exactly one value. Violations surface e.g.
the same clip_id ingested twice with different codecs, or one order
carrying several currencies.

Scale design (counts-only shuffles, no payload join):
- Phase 1 is ``select(X…, Y).distinct()`` — Spark plans this as a
  hash-aggregate with a MAP-SIDE partial, so a hot determinant key sends
  at most (#input partitions × #distinct Y) rows to a reducer, never its
  raw row count.
- Phase 2 counts distinct Y per X over that already-distinct frame and
  keeps X with count > 1 — the violating-key set, tiny relative to the
  table.
- Row-grain emission joins that set back to the rows; AQE converts it to
  a broadcast join at runtime (same shape as uniqueness.unique_violations,
  plan-asserted there). Group-grain emission skips the join entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_check_spark.functions.blank import is_present


def fd_violating_keys(
    df: DataFrame,
    determinant_cols: list[str],
    dependent_col: str,
    *,
    count_null_dependent: bool = False,
) -> DataFrame:
    """Determinant tuples whose dependent takes >1 value.

    Returns ``DataFrame(det…, n_values)``. Rows with a blank determinant
    are exempt (blank keys can't meaningfully determine anything —
    mirrors the uniqueness blank exemption); a NULL dependent is ignored
    ("unknown" is not a conflicting value) unless ``count_null_dependent``.
    """
    if not determinant_cols:
        raise ValueError("determinant_cols must be non-empty")
    if dependent_col in determinant_cols:
        raise ValueError(f"dependent column {dependent_col!r} is in the determinant")
    scoped = df.filter(_all([is_present(c) for c in determinant_cols]))
    if not count_null_dependent:
        scoped = scoped.filter(F.col(dependent_col).isNotNull())
    pairs = scoped.select(*determinant_cols, dependent_col).distinct()
    return (
        pairs.groupBy(*determinant_cols)
        .agg(F.count(F.lit(1)).alias("n_values"))
        .filter(F.col("n_values") > 1)
    )


def _all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _observed(determinant_cols: list[str]) -> Column:
    det = F.concat_ws("|", *[F.col(c).cast("string") for c in determinant_cols])
    return F.concat(
        F.lit("det="), det, F.lit("; n_values="), F.col("n_values").cast("string")
    )


def func_dep_violations(
    df: DataFrame,
    rule_id: str,
    determinant_cols: list[str],
    dependent_col: str,
    *,
    id_col: str = "clip_id",
    partition_col: str | None = "partition",
    count_null_dependent: bool = False,
    grain: str = "row",
) -> DataFrame:
    """FD violations in the engine contract (rule_id, clip_id, partition, observed).

    ``grain='row'`` emits one violation per row in a violating determinant
    group (locates every offending record); ``grain='group'`` emits one
    per determinant tuple with a blank locator (the aggregate_unique
    shape)."""
    keys = fd_violating_keys(
        df, determinant_cols, dependent_col, count_null_dependent=count_null_dependent
    )
    if grain == "group":
        return keys.select(
            F.lit(rule_id).alias("rule_id"),
            F.concat_ws("|", *[F.col(c).cast("string") for c in determinant_cols])
            .alias("clip_id"),
            F.lit(None).cast("string").alias("partition"),
            _observed(determinant_cols).alias("observed"),
        )
    if grain != "row":
        raise ValueError(f"unknown grain {grain!r}")
    renamed = keys.select(
        *[F.col(c).alias(f"_fd_{c}") for c in determinant_cols], "n_values"
    )
    cond = _all([F.col(c) == F.col(f"_fd_{c}") for c in determinant_cols])
    part: Column = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    rows = df if count_null_dependent else df.filter(F.col(dependent_col).isNotNull())
    return (
        rows.join(renamed, cond, "inner")
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(id_col).cast("string").alias("clip_id"),
            part.alias("partition"),
            _observed(determinant_cols).alias("observed"),
        )
    )
