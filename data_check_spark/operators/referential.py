"""Referential integrity checks as semi/anti joins.

Reference analogs: membership anti-join CHK_0032 (dekispart.py:494-501),
semi-join CHK_0033 (503-510), and the semi∘anti composition CHK_0060
("id in source A and not in source B", dekispart.py:968-988). The reference
materializes Python sets on the driver; here both sides stay distributed.

Join-strategy selection (north_rule: "broadcast or sort-merge depending on
dimension size"): the dimension key set is broadcast when its estimated size
is under ``broadcast_max_rows``; otherwise we leave the plan to Catalyst,
which picks sort-merge for two large sides (plus AQE skew splitting). The
decision is explicit — callers of ``referential_violations`` pass
``dim_rows`` when known (e.g. from table metadata) to avoid a count() action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_check_spark.functions.blank import is_present

BROADCAST_MAX_ROWS = 5_000_000  # ~key-only dim of 5M strings ≈ low hundreds of MB


def _maybe_broadcast(dim_keys: DataFrame, dim_rows: int | None) -> DataFrame:
    if dim_rows is None:
        dim_rows = dim_keys.count()  # one cheap job over the (pruned) key column
    return F.broadcast(dim_keys) if dim_rows <= BROADCAST_MAX_ROWS else dim_keys


def anti_join_violations(
    df: DataFrame,
    dim: DataFrame,
    rule_id: str,
    *,
    fact_key: str = "clip_id",
    dim_key: str = "clip_id",
    id_col: str = "clip_id",
    partition_col: str | None = "partition",
    gate=None,
    dim_rows: int | None = None,
) -> DataFrame:
    """Fact rows whose key has NO match in the dimension (FK violation)."""
    dim_keys = _maybe_broadcast(dim.select(F.col(dim_key).alias("_dk")).dropDuplicates(), dim_rows)
    fact = df.filter(is_present(fact_key))
    if gate is not None:
        fact = fact.filter(gate)
    part = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    return (
        fact.join(dim_keys, fact[fact_key] == F.col("_dk"), "left_anti")
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(id_col).cast("string").alias("clip_id"),
            part.alias("partition"),
            F.col(fact_key).cast("string").alias("observed"),
        )
    )


def semi_join_violations(
    df: DataFrame,
    dim: DataFrame,
    rule_id: str,
    *,
    fact_key: str = "clip_id",
    dim_key: str = "clip_id",
    id_col: str = "clip_id",
    partition_col: str | None = "partition",
    gate=None,
    dim_rows: int | None = None,
) -> DataFrame:
    """Fact rows whose key IS in the (forbidden) dimension set."""
    dim_keys = _maybe_broadcast(dim.select(F.col(dim_key).alias("_dk")).dropDuplicates(), dim_rows)
    fact = df.filter(is_present(fact_key))
    if gate is not None:
        fact = fact.filter(gate)
    part = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    return (
        fact.join(dim_keys, fact[fact_key] == F.col("_dk"), "left_semi")
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(id_col).cast("string").alias("clip_id"),
            part.alias("partition"),
            F.col(fact_key).cast("string").alias("observed"),
        )
    )


def orphan_violations(
    df: DataFrame,
    dim: DataFrame,
    rule_id: str,
    *,
    fact_key: str = "clip_id",
    dim_key: str = "clip_id",
) -> DataFrame:
    """Dimension rows referencing no fact row (reverse direction).

    The big side is the anti-join *probe* here, so no broadcast of the fact
    table is ever attempted; Catalyst plans dim-anti-fact as shuffle/SMJ.
    """
    fact_keys = df.filter(is_present(fact_key)).select(F.col(fact_key).alias("_fk")).dropDuplicates()
    return (
        dim.join(fact_keys, dim[dim_key] == F.col("_fk"), "left_anti")
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(dim_key).cast("string").alias("clip_id"),
            F.lit(None).cast("string").alias("partition"),
            F.lit("orphan").alias("observed"),
        )
    )


def semi_anti_violations(
    df: DataFrame,
    dim_in: DataFrame,
    dim_not_in: DataFrame,
    rule_id: str,
    *,
    fact_key: str = "clip_id",
    dim_in_key: str = "clip_id",
    dim_not_in_key: str = "clip_id",
    id_col: str = "clip_id",
    partition_col: str | None = "partition",
    dim_in_rows: int | None = None,
    dim_not_in_rows: int | None = None,
) -> DataFrame:
    """key ∈ dim_in AND key ∉ dim_not_in (reference: CHK_0060 composition)."""
    in_keys = _maybe_broadcast(dim_in.select(F.col(dim_in_key).alias("_ik")).dropDuplicates(), dim_in_rows)
    not_keys = _maybe_broadcast(
        dim_not_in.select(F.col(dim_not_in_key).alias("_nk")).dropDuplicates(), dim_not_in_rows
    )
    fact = df.filter(is_present(fact_key))
    part = F.col(partition_col) if partition_col else F.lit(None).cast("string")
    return (
        fact.join(in_keys, fact[fact_key] == F.col("_ik"), "left_semi")
        .join(not_keys, F.col(fact_key) == F.col("_nk"), "left_anti")
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col(id_col).cast("string").alias("clip_id"),
            part.alias("partition"),
            F.col(fact_key).cast("string").alias("observed"),
        )
    )
