"""Bloom-filter membership pre-filter for referential checks on huge dims.

Reference analog: the membership checks CHK_0032/0033 materialize the whole
dimension key set as a driver-side python set (dekispart.py:494-510) — a
non-starter once the dim outgrows driver memory. ``operators/referential.py``
covers the distributed case (explicit broadcast under 1M keys, else
sort-merge + AQE). This module covers the regime that dominates a 10^12-row
validation run: a dim too large to broadcast EXACTLY, but whose
*approximate* membership fits in kilobytes. The Bloom filter is built in ONE
aggregate pass over the dim and inlined into the fact scan as a pure-JVM
predicate, so the exact (shuffling) join only ever sees the rows the filter
cannot decide.

Classic Bloom guarantee — no false negatives — makes both directions EXACT:

- semi keep ("rows whose key IS in the dim"): a bloom-negative row is
  certainly a non-member → dropped map-side before any exchange; the
  survivors (members + ~0.1% false positives) are verified with a normal
  semi join. At 5% join selectivity the exchange shrinks ~20x.
- anti violations ("rows whose key is NOT in the dim"): a bloom-negative
  row is a certain violation — emitted with NO join at all; bloom-positive
  rows are verified via an anti join. In healthy data violations are rare,
  so the verify side is nearly the whole table — but it is anti-joined on
  its *distinct keys*, which is the referential.py machinery's shape anyway;
  the win here is that every definite orphan short-circuits.

Spark 4.1 does not expose ``bloom_filter_agg`` / ``might_contain`` in the
public function registry (they are internal, used by runtime row-level
filtering), so the filter is built from public primitives:

- bitmap: ``m_bits`` bits as ``m_bits/64`` int64 words, built by exploding
  each dim key into its k probe positions and ``bit_or``-aggregating per
  word (map-side partial agg; the shuffle carries at most m/64 rows per
  partition, never the dim).
- probe positions: ``pmod(xxhash64(cast(key as string), i), m_bits)`` for
  i in 0..k-1 — identical expression on build and probe sides.
- probe: the bitmap is inlined as ONE ``array(...)`` literal (a py4j
  round-trip per element would be the F.lit-in-a-loop trap) inside a
  ``forall`` over the k positions — foldable, whole-stage-codegen, zero
  Python, evaluated against a constant array.

Sizing: default m=2^20 bits / k=5 ≈ 0.03% false positives at 100k keys
(1.2 bytes/key), a ~130 KiB plan literal. The literal is parsed once per
plan and lives once per task in codegen — NOT per row. Above ~2^23 bits the
SQL-literal route stops paying (parse + codegen constant size); at that
point either shard the dim by key range into several smaller blooms, or
fall back to the exact sort-merge route in referential.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_check_spark.functions.blank import is_present

#: Refuse to inline bitmaps above this size: a multi-MiB SQL literal blows
#: parse time and janino constant-pool limits before it helps the join.
MAX_INLINE_BITS = 1 << 23


def _positions_expr(key_col: str, m_bits: int, k: int) -> str:
    """The k probe positions of a key, as a SQL array<bigint> expression.

    Shared verbatim between build and probe so the two sides cannot drift.
    Keys are hashed through cast-to-string so any key type (int, decimal,
    string) probes consistently with how the filter was built.
    """
    return (
        f"transform(sequence(0, {k - 1}), "
        f"i -> pmod(xxhash64(cast({key_col} as string), i), {m_bits}L))"
    )


def build_bloom(
    dim: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> list[int]:
    """One aggregate pass over the dim → the bitmap as ``m_bits/64`` int64
    words (dense, driver-side). NULL keys are skipped (a NULL never matches
    membership in SQL semantics, so it must not set bits)."""
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if m_bits > MAX_INLINE_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds MAX_INLINE_BITS={MAX_INLINE_BITS}; "
            "shard the dim into several blooms or use the exact "
            "referential.py route for dims this large"
        )
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    n_words = m_bits // 64
    words = (
        dim.where(F.col(key_col).isNotNull())
        .select(F.explode(F.expr(_positions_expr(key_col, m_bits, k))).alias("p"))
        .select(
            F.expr("shiftright(p, 6)").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for row in words:
        bitmap[row["w"]] = row["bits"]
    return bitmap


def might_contain(key_col: str, bitmap: list[int], *, k: int = 5) -> Column:
    """Pure-JVM membership test against an inlined bitmap literal.

    NULL keys yield NULL (three-valued logic), so ``where(might_contain)``
    drops them and ``where(~might_contain)`` does too — callers decide NULL
    routing explicitly, as everywhere else in the engine.
    """
    m_bits = len(bitmap) * 64
    arr = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"
    return F.expr(
        f"CASE WHEN {key_col} IS NULL THEN CAST(NULL AS BOOLEAN) ELSE "
        f"forall({_positions_expr(key_col, m_bits, k)}, "
        f"p -> (element_at({arr}, cast(shiftright(p, 6) as int) + 1) "
        f"& shiftleft(1L, cast(p % 64 as int))) != 0L) END"
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT semi join with a Bloom pre-filter on the fact side.

    Bloom-negative fact rows (certain non-members) never reach the
    exchange; the surviving members + false positives are verified with a
    real semi join, so the result is exactly ``fact WHERE key IN dim``.
    """
    bitmap = build_bloom(dim, dim_key, m_bits=m_bits, k=k)
    survivors = fact.where(might_contain(fact_key, bitmap, k=k))
    dim_keys = dim.select(F.col(dim_key).alias("_bk")).where(F.col("_bk").isNotNull())
    return survivors.join(
        dim_keys.dropDuplicates(), on=survivors[fact_key] == dim_keys["_bk"], how="left_semi"
    )


def bloom_anti_violations(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT anti membership ("fact keys absent from the dim") where every
    bloom-negative row short-circuits with no join. Blank/NULL fact keys are
    exempt, matching referential.py's membership convention."""
    bitmap = build_bloom(dim, dim_key, m_bits=m_bits, k=k)
    present = fact.filter(is_present(fact_key))
    probe = might_contain(fact_key, bitmap, k=k)
    definite = present.where(~probe)  # no false negatives → certain orphans
    maybe = present.where(probe)  # members + ~fp_rate false positives
    dim_keys = dim.select(F.col(dim_key).alias("_bk")).where(F.col("_bk").isNotNull())
    verified = maybe.join(
        dim_keys.dropDuplicates(), on=maybe[fact_key] == dim_keys["_bk"], how="left_anti"
    )
    return definite.unionByName(verified)
