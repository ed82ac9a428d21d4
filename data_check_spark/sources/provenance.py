"""Provenance-stamped reads: which FILE and which ROW did this record come
from.

At 10^12 rows a violation report that says "clip_id=X failed" is only half
an audit trail — operators need the physical address (file, row offset) to
inspect the original bytes, quarantine a bad upstream delivery, or rewrite
one corrupt file instead of the whole table. Spark exposes exactly this via
the hidden ``_metadata`` struct on file-source scans (public API since 3.2;
``row_index`` since 3.4) at ZERO cost: the values come from the scan's own
bookkeeping, no extra IO, no shuffle, and they survive into any downstream
plan as ordinary columns.

The reference has no analog (its pandas loader holds one file in memory);
this is the distributed replacement for "row number in the Excel sheet"
style triage (data_check.py result rows carry 行番号-style indices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: provenance columns appended by :func:`read_parquet_with_provenance`
PROVENANCE_COLS = ("src_file", "src_file_size", "src_row_index")


def read_parquet_with_provenance(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with ``(src_file, src_file_size, src_row_index)``
    appended to every row.

    ``src_row_index`` is the row's 0-based physical position within its
    file — stable across reruns (parquet row order is immutable), so
    ``(src_file, src_row_index)`` is a durable physical row address even
    for tables with no key column.

    Scale: the ``_metadata`` struct is populated by the file reader itself;
    selecting it adds no scan cost and does not defeat column pruning of
    the data columns (it is not a data column).
    """
    df = spark.read.parquet(path)
    return df.select(
        "*",
        F.col("_metadata.file_name").alias("src_file"),
        F.col("_metadata.file_size").cast("long").alias("src_file_size"),
        F.col("_metadata.row_index").cast("long").alias("src_row_index"),
    )
