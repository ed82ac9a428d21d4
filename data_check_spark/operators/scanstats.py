"""Parquet zone-map audit: row-group statistics + data-skipping report.

At 100 TB the difference between a cheap and an impossible query is how
many row groups the engine can PROVE it never has to read (parquet footer
min/max — the same machinery behind predicate pushdown and Iceberg
zone-map pruning). This operator reads ONLY footers, distributed: the file
list becomes a DataFrame, one Arrow-batched task opens each file's
metadata (never its data pages), and the output is one row per
(file, column, row group) with the integer min/max and a would-skip flag
for a hypothetical range predicate — the audit that tells you whether your
table layout (sort order, file sizing) actually supports pruning before
you pay for a full scan.

Cross-engine: DuckDB's ``parquet_metadata()`` reads the identical footers,
so the whole report is value-checked by the oracle
(queries.scan_pruning_lineitem).

Integer-typed columns only (min/max surface as BIGINT — exact cross-engine;
double stats would reintroduce float-rendering hazards for zero benefit in
an audit about skipping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATS_SCHEMA = (
    "file string, col_name string, row_group int, n_rows long, "
    "min_v long, max_v long"
)


def parquet_rowgroup_stats(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """(file, col_name, row_group, n_rows, min_v, max_v) from footers only.

    ``path`` is a parquet file or a directory of ``*.parquet`` part files.
    The file list is distributed across executors (footer reads are tiny
    but at 100k-file scale the listing is the parallel unit); min/max are
    NULL when the writer recorded no statistics for a chunk.
    """
    import glob
    import os

    if not columns:
        raise ValueError("columns must be non-empty")
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    elif os.path.isfile(path):
        files = [path]
    else:
        raise ValueError(f"no such parquet file or directory: {path!r}")
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    wanted = list(columns)

    files_df = spark.createDataFrame([(f,) for f in files], "file string")
    files_df = files_df.repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    )

    def _scan(batches):
        import os as _os

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for ci in range(rgm.num_columns):
                        c = rgm.column(ci)
                        if c.path_in_schema not in wanted:
                            continue
                        st = c.statistics
                        has = st is not None and st.has_min_max
                        rows.append((
                            _os.path.basename(f), c.path_in_schema, rg,
                            rgm.num_rows,
                            int(st.min) if has else None,
                            int(st.max) if has else None,
                        ))
            yield pd.DataFrame(
                rows,
                columns=["file", "col_name", "row_group", "n_rows",
                         "min_v", "max_v"],
            )

    return files_df.mapInPandas(_scan, _STATS_SCHEMA)


def pruning_report(
    stats: DataFrame, *, lo: int, hi: int
) -> DataFrame:
    """Add ``would_skip``: TRUE when a row group provably holds NO value of
    its column in ``[lo, hi]`` (zone-map logic: skip iff max < lo or
    min > hi). Missing statistics can never justify a skip, so NULL
    min/max → FALSE — the same conservative rule every pruning engine
    applies. The per-column flag answers "if the predicate were on this
    column, would this row group be skipped?" — sum(would_skip)/count is
    the layout's pruning effectiveness for that column."""
    skippable = (F.col("max_v") < F.lit(lo)) | (F.col("min_v") > F.lit(hi))
    return stats.withColumn(
        "would_skip", F.coalesce(skippable, F.lit(False))
    )
