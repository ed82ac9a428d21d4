"""Bucketed-table layout for co-located (exchange-free) joins.

At 10^12 rows the dominant cost of the referential and uniqueness rules is
the shuffle of the join/grouping key. Writing the fact and dimension tables
bucketed BY THE SAME KEY into the SAME bucket count lets Spark plan the
join with zero Exchange on either side (bucket pruning + co-located
sort-merge): the validation job then re-runs nightly against pre-bucketed
storage without ever reshuffling the key space.

In production this is the Iceberg ``bucket(N, clip_id)`` partition
transform; the sandbox uses the session-catalog parquet equivalent
(``bucketBy().sortBy().saveAsTable``) — the plan shape (no Exchange under
the SortMergeJoin) is identical and plan-asserted in tests/test_bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 64,
) -> None:
    """Persist ``df`` bucketed + sorted by ``key`` into the session catalog.

    Both sides of a future co-located join must use the SAME ``buckets``
    count (Spark only elides the shuffle for matching bucket specs)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
