"""Uniqueness semantics: per-row violations, blank exemption (reference:
tests/test_chk_0008.py:11-20), and the aggregate per-value variant
(reference: dekispart_school.py:204-208)."""

from data_check_spark.operators.uniqueness import (
    aggregate_unique_violations,
    duplicate_keys,
    unique_violations,
)

ROWS = [
    ("dup", "p0"), ("dup", "p1"), ("dup", "p2"),
    ("pair", "p0"), ("pair", "p1"),
    ("solo", "p0"),
    (None, "p0"), (None, "p1"),        # NULLs are exempt even when repeated
    ("", "p0"), ("", "p1"),            # empties exempt
    ("  ", "p0"), ("  ", "p1"),        # whitespace exempt
]


def _df(spark):
    return spark.createDataFrame(ROWS, "clip_id string, partition string")


def test_duplicate_keys(spark):
    got = {(r["clip_id"], r["dup_count"]) for r in duplicate_keys(_df(spark), "clip_id").collect()}
    assert got == {("dup", 3), ("pair", 2)}


def test_unique_violations_per_row(spark):
    out = unique_violations(_df(spark), "U", "clip_id").collect()
    assert len(out) == 5  # 3 dup + 2 pair rows; blanks exempt
    assert {r["clip_id"] for r in out} == {"dup", "pair"}
    assert all(r["rule_id"] == "U" for r in out)
    by_key = {r["clip_id"]: r["observed"] for r in out}
    assert by_key["dup"] == "dup_count=3"
    # per-row violations keep their partition locator
    assert {r["partition"] for r in out if r["clip_id"] == "dup"} == {"p0", "p1", "p2"}


def test_aggregate_unique_one_per_value(spark):
    out = aggregate_unique_violations(_df(spark), "A", "clip_id").collect()
    assert len(out) == 2
    assert {r["clip_id"] for r in out} == {"dup", "pair"}
    assert all(r["partition"] is None for r in out)  # blank locator, like the reference


def test_no_duplicates(spark):
    df = spark.createDataFrame([("a", "p0"), ("b", "p0")], "clip_id string, partition string")
    assert unique_violations(df, "U", "clip_id").count() == 0
