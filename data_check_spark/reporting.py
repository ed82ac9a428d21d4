"""Result filtering / search / sort / export — the reference's result UI ops.

Reference analogs: series filter + case-insensitive substring search across
result columns (data_check.py:1119-1137), numeric-coercion sort with NaN
last (data_check.py:1139-1165), message resolution via the rule catalog
(data_check.py:539-550, 1240), CSV export with utf-8-sig BOM
(data_check.py:1258) and Excel export (1261).

All Spark-side: the search is an OR-chain of lowered contains; the message
join broadcasts the (tiny) rule catalog; the numeric sort uses try_cast with
nulls-last so non-numeric ids sort after numeric ones exactly like the
reference's pd.to_numeric(errors='coerce') two-key sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_check_spark.rules.spec import RuleCatalog


def filter_violations(
    df: DataFrame,
    *,
    series: str | None = None,
    search: str | None = None,
    search_columns: tuple[str, ...] = ("rule_id", "clip_id", "partition", "observed"),
    series_col: str = "series",
) -> DataFrame:
    """Equality filter on series + case-insensitive substring search."""
    out = df
    if series and series_col in df.columns:
        out = out.filter(F.col(series_col) == series)
    if search:
        needle = search.lower()
        cond = None
        for c in search_columns:
            if c not in out.columns:
                continue
            this = F.lower(F.coalesce(F.col(c).cast("string"), F.lit(""))).contains(needle)
            cond = this if cond is None else (cond | this)
        if cond is not None:
            out = out.filter(cond)
    return out


def sort_numeric_coerced(df: DataFrame, column: str, ascending: bool = True) -> DataFrame:
    """Two-key sort: numeric value of ``column`` (non-numeric → NULL → last),
    then the raw string — the reference's pd.to_numeric(errors='coerce')
    sort (data_check.py:1147-1159). The literal strings 'NaN'/'Infinity'
    cast to non-finite doubles in Spark; pandas to_numeric treats them as
    numbers too, but their sort position differs between engines (Spark
    orders NaN before NULLs and first under desc) — map non-finite parses
    to NULL so they group with the other coercion failures, as the
    reference UI displays them."""
    raw = F.expr(f"try_cast(cast(`{column}` as string) as double)")
    num = F.when(F.isnan(raw) | (F.abs(raw) == float("inf")), F.lit(None)).otherwise(raw)
    key1 = num.asc_nulls_last() if ascending else num.desc_nulls_last()
    key2 = F.col(column).asc() if ascending else F.col(column).desc()
    return df.orderBy(key1, key2)


def with_messages(violations: DataFrame, catalog: RuleCatalog) -> DataFrame:
    """Broadcast-join the rule catalog to resolve display messages
    (user message > name > rule id — the reference's override chain)."""
    spark = violations.sparkSession
    rows = [(r.rule_id, catalog.message_for(r.rule_id), r.severity) for r in catalog]
    msgs = F.broadcast(
        spark.createDataFrame(rows, "rule_id string, message string, severity string")
    )
    # replace semantics: re-enriching an already-enriched frame is a no-op
    # rather than an AMBIGUOUS_REFERENCE error
    base = violations.drop("message", "severity")
    return base.join(msgs, "rule_id", "left").withColumn(
        "message", F.coalesce(F.col("message"), F.col("rule_id"))
    )


def export_csv(df: DataFrame, path: str, *, single_file: bool = True) -> None:
    """CSV export with utf-8-sig BOM handling (reference writes utf-8-sig so
    Excel opens Japanese text correctly). Spark's csv writer has no BOM
    option; for the single-file export path we coalesce(1) and prepend the
    BOM to the part file."""
    import re as _re
    from urllib.parse import urlparse

    # Scheme detection must catch single-slash URIs too (hdfs:/x is a valid
    # Hadoop URI): anything with a scheme other than file is not local.
    m = _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]+:", path)
    scheme = m.group(0)[:-1].lower() if m else ""
    if single_file and scheme not in ("", "file"):
        # The BOM prepend below runs on the driver's local filesystem; on
        # hdfs://-/s3a:// it would silently no-op and deliver a BOM-less
        # file — the one thing this function exists to guarantee.
        raise ValueError(
            f"single_file BOM export requires a local path, got {path!r}; "
            "use single_file=False (no BOM) or export locally and upload"
        )
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite").option(
        "header", "true"
    ).option("encoding", "UTF-8")
    writer.csv(path)
    if single_file:
        import glob
        import os

        # glob needs the OS path, not the file: URI Spark accepted above
        local_dir = urlparse(path).path if scheme == "file" else path
        for part in glob.glob(os.path.join(local_dir, "part-*.csv")):
            tmp = part + ".bom"
            with open(part, "rb") as src:
                head = src.read(3)
                if head == b"\xef\xbb\xbf":
                    continue
                # Stream in chunks — the export can be bigger than driver RAM.
                with open(tmp, "wb") as dst:
                    dst.write(b"\xef\xbb\xbf")
                    dst.write(head)
                    while chunk := src.read(1 << 20):
                        dst.write(chunk)
            os.replace(tmp, part)


def summary_df(violations: DataFrame, *, series_col: str = "series") -> DataFrame:
    """Per-key violation counts ordered by key (reference value_counts,
    data_check.py:1186-1215). The top-5-rules view lives in
    ``engine.ValidationResult.summary()``; use :func:`top_rules` for the
    DataFrame form."""
    key = series_col if series_col in violations.columns else "rule_id"
    per_key = violations.groupBy(key).agg(F.count(F.lit(1)).alias("n")).orderBy(key)
    return per_key


def top_rules(violations: DataFrame, k: int | None = 5) -> DataFrame:
    """Top-k rules by violation count (reference nlargest; count desc,
    rule_id asc tie-break). ``k=None`` returns the full ranked summary."""
    ranked = (
        violations.groupBy("rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("rule_id"))
    )
    return ranked if k is None else ranked.limit(k)


def quarantine_split(
    df: DataFrame,
    violations: DataFrame,
    id_col: str,
    *,
    rule_ids: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the input into (clean, quarantined) by violation membership.

    The standard downstream of a validation run: rows flagged by any
    row-grain rule are routed to a quarantine table for repair while the
    clean remainder flows on — the reference's users do this by hand from
    the exported CSV; here it is one distinct + two hash joins on the key
    (semi for quarantined, anti for clean), so Catalyst/AQE pick broadcast
    when the violator set is small and the input is scanned twice at most.

    Partition-grain violation rows (``clip_id IS NULL`` — drift, volume)
    quarantine nothing: they indict a partition, not a row; act on them
    via the verdicts table. ``rule_ids`` optionally limits which rules
    quarantine (e.g. exclude warning-severity rules).

    Input rows whose ``id_col`` is NULL are ALWAYS quarantined: a keyless
    row cannot be joined against the violation set, so it can never be
    certified clean (and a NULL primary key is itself the defect the id
    rules exist to catch) — routing it downstream as clean would ship the
    very rows most in need of repair.
    """
    bad = violations.filter(F.col("clip_id").isNotNull())
    if rule_ids is not None:
        bad = bad.filter(F.col("rule_id").isin(rule_ids))
    keys = bad.select(F.col("clip_id").alias("_qkey")).distinct()
    cond = F.col(id_col).cast("string") == F.col("_qkey")
    null_id = F.col(id_col).isNull()
    quarantined = df.join(keys, cond, "left_semi").unionByName(df.filter(null_id))
    clean = df.join(keys, cond, "left_anti").filter(~null_id)
    return clean, quarantined


def examples_per_rule(
    violations: DataFrame,
    n: int = 5,
    *,
    rule_col: str = "rule_id",
    order_col: str = "clip_id",
) -> DataFrame:
    """Up to ``n`` deterministic example rows per rule — the triage view
    (reference GUI shows the first offending rows per check; data_check.py's
    per-check preview). ``collect()``-ing all violations to sample them on
    the driver would defeat the point at 10^12 rows: this is a per-rule-key
    window over (rule, order_col) — millions of small groups, never a global
    sort — and the output is bounded by #rules × n no matter the input.
    Deterministic (smallest ``order_col`` first) so reruns and engines agree.
    """
    from pyspark.sql.window import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(rule_col).orderBy(F.asc(order_col))
    return (
        violations.withColumn("example_rank", F.row_number().over(w))
        .where(F.col("example_rank") <= n)
    )
