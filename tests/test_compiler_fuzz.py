"""Rule-compiler fuzz: random specs × adversarial rows vs a Python replay.

test_golden_multiset pins the SHIPPED catalog; this fuzzes the COMPILER —
randomly generated not_null/value_in_set/range/length/format/
forbidden_substring rules over rows stuffed with the nasty cases (NULL,
empty, ASCII/Unicode whitespace incl. NBSP and U+3000, non-ASCII text) —
and asserts the engine's violation multiset equals a row-at-a-time Python
replay of the documented semantics (tri-state blank, blank-exempt gates,
full-match format). One Spark job evaluates ALL generated rules per
example, so the property stays fast.
"""

import random
import re
from collections import Counter

from data_check_spark.functions.blank import WHITESPACE_CHARS
from data_check_spark.rules.compiler import apply_row_rules, compile_row_rules
from data_check_spark.rules.spec import Rule

NASTY = [None, "", " ", "\t", "\u00a0", "\u3000", " \u3000 ", "abc",
         "ABC", "a b", "\u00e9\u03bb\u4e2d", "x" * 40, "0", "flac",
         "wav", "  flac  ", "\u00a0x\u00a0"]
WORDS = ["flac", "wav", "opus", "abc", "xyz", "éλ中", "A1"]


def _blank(v) -> bool:
    if v is None:
        return True
    return re.sub(f"[{re.escape(WHITESPACE_CHARS)}]+", "", str(v)) == ""


def _replay(rule: Rule, s, n) -> bool:
    """Python truth for one rule over one row (s: string col, n: int col)."""
    p = rule.params
    if rule.kind == "not_null":
        return _blank(s)
    if rule.kind == "value_in_set":
        return not _blank(s) and str(s) not in p["allowed"]
    if rule.kind == "range":
        if n is None:
            return False
        return ("min" in p and n < p["min"]) or ("max" in p and n > p["max"])
    if rule.kind == "length":
        if _blank(s):
            return False
        ln = len(str(s))
        return (("exact" in p and ln != p["exact"])
                or ("min" in p and ln < p["min"])
                or ("max" in p and ln > p["max"]))
    if rule.kind == "format":
        return not _blank(s) and not re.fullmatch(f"(?:{p['pattern']})", str(s))
    if rule.kind == "forbidden_substring":
        return not _blank(s) and bool(re.search("|".join(p["any_of"]), str(s)))
    raise AssertionError(rule.kind)


def _random_rules(rng: random.Random, k: int) -> list[Rule]:
    rules = []
    for i in range(k):
        kind = rng.choice(
            ["not_null", "value_in_set", "range", "length", "format",
             "forbidden_substring"]
        )
        rid = f"FZ_{i}_{kind.upper()}"
        if kind == "not_null":
            rules.append(Rule(rid, kind, "s"))
        elif kind == "value_in_set":
            rules.append(Rule(rid, kind, "s",
                              {"allowed": rng.sample(WORDS, rng.randint(1, 4))}))
        elif kind == "range":
            lo = rng.randint(-5, 5)
            params = rng.choice(
                [{"min": lo}, {"max": lo + 3}, {"min": lo, "max": lo + 3}]
            )
            rules.append(Rule(rid, kind, "n", params))
        elif kind == "length":
            e = rng.randint(0, 6)
            params = rng.choice([{"exact": e}, {"min": e}, {"max": e + 3},
                                 {"min": e, "max": e + 3}])
            rules.append(Rule(rid, kind, "s", params))
        elif kind == "format":
            pat = rng.choice(["[a-z]+", "[A-Z][a-z]*", "[0-9]+", "flac|wav",
                              "a.c", "x{1,5}"])
            rules.append(Rule(rid, kind, "s", {"pattern": pat}))
        else:
            rules.append(Rule(rid, kind, "s",
                              {"any_of": rng.sample(["fla", "av", "bc", "xy"],
                                                    rng.randint(1, 3))}))
    return rules


def test_compiler_fuzz_matches_python_replay(spark):
    rng = random.Random(0xC0FFEE)
    rows = []
    for i in range(120):
        s = rng.choice(NASTY)
        n = rng.choice([None, rng.randint(-10, 10)])
        rows.append((f"id{i}", s, n, f"p{i % 3}"))
    df = spark.createDataFrame(
        rows, "clip_id string, s string, n int, partition string"
    )
    rules = _random_rules(rng, 40)
    got = Counter(
        (r["rule_id"], r["clip_id"])
        for r in apply_row_rules(df, compile_row_rules(rules)).collect()
    )
    want = Counter(
        (rule.rule_id, rid)
        for rid, s, n, _p in rows
        for rule in rules
        if _replay(rule, s, n)
    )
    assert got == want
