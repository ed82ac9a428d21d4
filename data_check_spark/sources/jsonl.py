"""JSONL (newline-delimited JSON) corpus source.

JSONL is the de-facto interchange format for LLM training corpora; this is
the ingestion seam a 100-TB text pipeline actually reads through. The
reference's file sources (CSV with encoding fallback, Excel keyword sheets
— common.py:134-171, dekispart.py:1178-1289) carry the same defensive
posture this module ports to JSONL: a malformed input line is DATA to be
counted and quarantined, never an exception that kills the job
(dekispart.py:1151-1157's error-as-violation convention).

Scale contract (the reasons behind each default):

* **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over the input just to infer types — at
  100 TB that doubles the scan. Callers pass the schema; this module only
  appends the corrupt-record column.
* **``multiLine`` stays false.** Line-delimited JSON is splittable — every
  HDFS/S3 block becomes an independent task. ``multiLine=true`` JSON is
  one-file-one-task and must never be the corpus path.
* **PERMISSIVE + corrupt-record column.** A bad line lands raw in
  ``corrupt_col`` with every schema field NULL; clean lines carry NULL
  there. ``split_corrupt`` routes the two classes without a second read.
  (FAILFAST would kill a 1000-executor job on one bad byte;
  DROPMALFORMED silently loses data — both wrong for curation, where the
  reject stream is itself an input to quality monitoring.)
* **``text`` + ``from_json``, not the native JSON datasource.** Same JVM
  parser, same PERMISSIVE semantics, but the raw line stays a real column:
  the native source disallows any plan that reads only the corrupt-record
  column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
  exactly what a reject-stream writer does.
* **Required-column refusal** mirrors the CSV/xlsx sources: a corpus file
  missing a contracted field raises :class:`MissingColumnsError` up front
  rather than producing all-NULL columns downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_check_spark.sources.files import MissingColumnsError

DEFAULT_CORRUPT_COL = "_corrupt_record"


def _resolve_schema(
    path: str,
    schema: T.StructType | str,
    required_columns: list[str] | None,
    corrupt_col: str,
) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if required_columns:
        missing = [c for c in required_columns if c not in schema.fieldNames()]
        if missing:
            raise MissingColumnsError(path, missing)
    return T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )


def _parse_lines(lines: DataFrame, full: T.StructType, corrupt_col: str) -> DataFrame:
    return (
        lines.filter(F.trim("value") != "")
        .select(
            F.from_json(
                "value",
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
            ).alias("_j")
        )
        .select("_j.*")
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    required_columns: list[str] | None = None,
    corrupt_col: str = DEFAULT_CORRUPT_COL,
) -> DataFrame:
    """One distributed, splittable read of a JSONL dataset.

    Returns the caller's schema plus ``corrupt_col`` (string): NULL for
    clean rows, the raw offending line for malformed ones. Whitespace-only
    lines are skipped (the native JSON source's behavior).
    """
    full = _resolve_schema(path, schema, required_columns, corrupt_col)
    return _parse_lines(spark.read.text(path), full, corrupt_col)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    required_columns: list[str] | None = None,
    corrupt_col: str = DEFAULT_CORRUPT_COL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl` over a landing directory.

    Corpus deliveries land as JSONL file drops; this turns them into a
    Structured Streaming source with identical parse semantics — same
    schema handling, same corrupt-record routing — so the downstream rule
    projection / quality monitoring built for the batch frame runs
    unchanged on arrivals (one parse contract, two runtimes, mirroring
    streaming/incremental.py's design). ``max_files_per_trigger`` bounds
    per-micro-batch work during backlog catch-up."""
    full = _resolve_schema(path, schema, required_columns, corrupt_col)
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _parse_lines(reader.text(path), full, corrupt_col)


def split_corrupt(
    df: DataFrame, *, corrupt_col: str = DEFAULT_CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects) from one :func:`read_jsonl` frame.

    ``clean`` drops the corrupt column; ``rejects`` is
    ``(raw string, n_bytes long)`` — the quarantine stream feeding the same
    monitoring tables as the engine's quarantine split. One scan feeds both
    when the caller materializes the parent (the plans share the source)."""
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    rejects = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw"),
        F.octet_length(corrupt_col).cast("long").alias("n_bytes"),
    )
    return clean, rejects
