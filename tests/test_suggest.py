"""Rule suggestion: profile → proposed catalog → rules hold on the profiled
data and catch planted deviations on a drifted copy."""

import pytest


def _table(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, status string, phone string, score double, note string"
    )


CLEAN = [
    (i, ["OPEN", "DONE", "HOLD"][i % 3], f"555-{i:03d}-{i * 7 % 10000:04d}",
     float(10 + i), None if i % 4 == 0 else f"free text number {i} " * (i % 5 + 1))
    for i in range(60)
]


def test_suggest_rules_shapes(spark):
    from data_check_spark.rules.suggest import suggest_rules

    cat = suggest_rules(_table(spark, CLEAN))
    kinds = {r.rule_id: r.kind for r in cat.rules}
    assert kinds["ID_NOT_NULL"] == "not_null"
    assert kinds["ID_UNIQUE"] == "unique"
    assert kinds["ID_RANGE"] == "range"
    assert kinds["STATUS_SET"] == "value_in_set"
    assert kinds["PHONE_FORMAT"] == "format"
    assert kinds["SCORE_RANGE"] == "range"
    # note has NULLs → no NOT_NULL; free text → no FORMAT
    assert "NOTE_NOT_NULL" not in kinds and "NOTE_FORMAT" not in kinds
    set_rule = cat.get("STATUS_SET")
    assert set_rule.params["allowed"] == ["DONE", "HOLD", "OPEN"]
    rng = cat.get("ID_RANGE")
    assert rng.params == {"min": 0, "max": 59}
    fmt = cat.get("PHONE_FORMAT")
    assert fmt.params["pattern"] == "[0-9][0-9][0-9]\\-[0-9][0-9][0-9]\\-[0-9][0-9][0-9][0-9]"


def test_suggested_rules_hold_then_catch_drift(spark):
    from data_check_spark.rules.compiler import apply_row_rules, compile_row_rules
    from data_check_spark.rules.suggest import suggest_rules

    df = _table(spark, CLEAN)
    cat = suggest_rules(df)
    compiled = compile_row_rules(cat.rules)

    # consistency: the data the rules were learned from violates nothing
    assert apply_row_rules(df, compiled, id_col="id", partition_col=None).count() == 0

    drifted = _table(spark, CLEAN + [
        (1000, "NEW_STATE", "5551234", 9999.0, "x"),   # enum + format + range
        (None, "OPEN", "555-111-0199", 20.0, "y"),     # null id
    ])
    viol = apply_row_rules(drifted, compiled, id_col="id", partition_col=None)
    fired = {r["rule_id"] for r in viol.collect()}
    assert {"STATUS_SET", "PHONE_FORMAT", "SCORE_RANGE", "ID_NOT_NULL"} <= fired

    # the unique suggestion is a set-oriented rule ready for the engine
    from data_check_spark.operators.uniqueness import unique_violations

    dup = _table(spark, CLEAN + [CLEAN[0]])
    assert unique_violations(
        dup, "ID_UNIQUE", "id", id_col="id", partition_col=None
    ).count() == 2


def test_suggest_rules_json_roundtrip(spark, tmp_path):
    import json

    from data_check_spark.rules.spec import load_catalog
    from data_check_spark.rules.suggest import suggest_rules

    cat = suggest_rules(_table(spark, CLEAN))
    path = str(tmp_path / "suggested.json")
    cat.save(path)
    assert load_catalog(path).to_json() == cat.to_json()
    assert len(json.load(open(path))) == len(cat.rules)


def test_suggest_then_curate_preflight_integration(spark, tmp_path, capsys):
    """suggest_rules on a table → JSON → curate_job --preflight-rules: the
    learned catalog quarantines nothing on the data it was learned from and
    catches a drifted row appended later."""
    import json
    import sys as _sys

    from data_check_spark.rules.suggest import suggest_rules

    rows = [(i, f"doc body {i} " + "tok " * 15, "en", f"src{i % 4}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    docs = str(tmp_path / "docs")
    df.write.parquet(docs)

    cat = suggest_rules(df)
    rules_path = str(tmp_path / "rules.json")
    cat.save(rules_path)

    _sys.path.insert(0, "/root/repo/jobs")
    import curate_job

    out1 = str(tmp_path / "r1")
    assert curate_job.main([
        "--input", docs, "--output-dir", out1,
        "--preflight-rules", rules_path, "--skip-near-dup", "--shards", "2",
    ]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rule_violation" not in m1["dropped"] and m1["kept_rows"] == 30

    drifted = rows + [(99, "body", "xx", "weird-source")]   # lang + source drift
    docs2 = str(tmp_path / "docs2")
    spark.createDataFrame(
        drifted, "doc_id long, text string, lang string, source string"
    ).write.parquet(docs2)
    out2 = str(tmp_path / "r2")
    assert curate_job.main([
        "--input", docs2, "--output-dir", out2,
        "--preflight-rules", rules_path, "--skip-near-dup", "--shards", "2",
    ]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["dropped"]["rule_violation"] == 1
    assert m2["rule_violations"].get("LANG_SET") == 1
