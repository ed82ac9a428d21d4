"""File sources with the reference's defensive loading behavior.

Reference analogs: CSV loading with encoding fallback across
cp932/shift_jis/utf-8/utf-8-sig, bad-line skipping and required-column
validation (reference: common.py:134-171, dekispart.py:1195-1289), and
Excel keyword-sheet loading (reference: dekispart.py:1178-1192).

Spark-first: `spark.read.csv` handles one encoding per read, so the
fallback probes encodings by round-trip-decoding a sample of raw bytes
(driver-side, bounded) before issuing ONE distributed read with the chosen
encoding — no per-row Python, no full-file driver loads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ENCODINGS = ("cp932", "shift_jis", "utf-8", "utf-8-sig")
_PROBE_BYTES = 256 * 1024


class MissingColumnsError(ValueError):
    def __init__(self, path: str, missing: list[str]):
        self.missing = missing
        super().__init__(f"{path}: missing required columns {missing}")


def sniff_encoding(path: str, encodings=DEFAULT_ENCODINGS) -> str:
    """Pick the first encoding that cleanly decodes a head sample.

    For a directory (partitioned dataset), probes the first data FILE,
    descending into partition subdirectories (year=.../) as needed."""
    import codecs

    probe = path
    while os.path.isdir(probe):
        entries = [
            n for n in sorted(os.listdir(probe)) if not n.startswith((".", "_"))
        ]
        if not entries:
            raise FileNotFoundError(f"{path}: no data files to probe")
        probe = os.path.join(probe, entries[0])
    with open(probe, "rb") as f:
        head = f.read(_PROBE_BYTES)
    for enc in encodings:
        # Incremental decode with final=False: the fixed-size probe can cut
        # a multibyte character in half, and a plain decode() would wrongly
        # reject the TRUE encoding on 'incomplete multibyte sequence'.
        dec = codecs.getincrementaldecoder(enc)()
        try:
            dec.decode(head, False)
            return enc
        except UnicodeDecodeError:
            continue
    return encodings[-1]


def read_csv_with_fallback(
    spark: SparkSession,
    path: str,
    *,
    required_columns: list[str] | None = None,
    encodings=DEFAULT_ENCODINGS,
    header: bool = True,
    schema=None,
) -> DataFrame:
    """CSV read with encoding sniffing + malformed-line drop + required-column
    validation (raises :class:`MissingColumnsError`, mirroring the
    reference's refusal to run checks without the aux columns)."""
    enc = sniff_encoding(path, encodings)
    # Python codec name → JVM charset name (Spark's csv reader is JVM-side).
    jvm_charset = {
        "cp932": "windows-31j",
        "shift_jis": "Shift_JIS",
        "utf-8-sig": "UTF-8",
        "utf-8": "UTF-8",
    }.get(enc, enc)
    # Spark 4 restricts csv charsets to a UTF/ASCII allowlist unless the
    # legacy-charset flag is on; cp932/shift_jis aux files need it.
    if jvm_charset.lower() not in ("utf-8", "us-ascii", "iso-8859-1"):
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    reader = (
        spark.read.option("header", str(header).lower())
        .option("encoding", jvm_charset)
        .option("mode", "DROPMALFORMED")
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if required_columns:
        missing = [c for c in required_columns if c not in df.columns]
        if missing:
            raise MissingColumnsError(path, missing)
    return df


def read_keyword_column(
    spark: SparkSession, path: str, column: str, **kwargs
) -> list[str]:
    """Load one column of a small aux file as a keyword list (reference:
    Excel 検索文字 extraction, dekispart.py:1178-1192). Distinct, non-blank,
    order-stable. Accepts parquet, csv (encoding-sniffed) and .xlsx (stdlib
    OOXML reader — no Excel dependency ships in Spark)."""
    if path.endswith(".xlsx"):
        from data_check_spark.sources.xlsx import read_xlsx_df

        df = read_xlsx_df(spark, path, kwargs.get("sheet"))
        if column not in df.columns:
            raise MissingColumnsError(path, [column])
    elif path.endswith(".parquet") or os.path.isdir(path):
        df = spark.read.parquet(path)
        if column not in df.columns:
            # Same refusal contract as the csv/xlsx branches — callers catch
            # MissingColumnsError, not a raw AnalysisException.
            raise MissingColumnsError(path, [column])
    else:
        df = read_csv_with_fallback(spark, path, required_columns=[column], **kwargs)
    from pyspark.sql import functions as F

    rows = (
        df.select(F.col(column).cast("string").alias("kw"))
        .filter(F.col("kw").isNotNull() & (F.trim("kw") != ""))
        .distinct()
        .orderBy("kw")
        .collect()
    )
    return [r["kw"] for r in rows]
