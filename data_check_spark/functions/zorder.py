"""Z-order (Morton) curve values for multi-column data clustering.

A dataset sorted on (a, b) prunes scans filtered on ``a`` but not on ``b``
alone; sorting on the interleaved bits of BOTH gives every parquet file /
row group a tight min-max box in (a, b) space, so predicates on either
column (or both) skip most files — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``, built here from public Spark primitives only.

Everything is integer bit arithmetic (``shiftleft`` / ``shiftright`` /
``&`` / ``|``) generated as ONE SQL expression — pure JVM, constant-folded
into whole-stage codegen, zero Python, and evaluable verbatim by DuckDB so
z-values are oracle-checkable. No magic-number tricks that only work for
power-of-two column counts: the generic bit-by-bit OR fold handles any
1 ≤ n_cols ≤ 4 at bits ≤ 16 (the practical clustering resolution — finer
bits don't change which FILE a row lands in once files hold ~1M rows).

Columns must first be quantized to [0, 2^bits): ``quantize_expr`` maps any
bigint-able column affinely onto the grid using (lo, hi) bounds the caller
supplies — from table stats, a 1-row agg, or domain knowledge. Integer
division only; both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_BITS = 16
MAX_COLS = 4


def quantize_expr(
    col: str, lo: int, hi: int, bits: int = MAX_BITS, *, dialect: str = "spark"
) -> str:
    """SQL mapping ``col`` from [lo, hi] onto the integer grid [0, 2^bits):
    clamped at both ends (out-of-bounds values cluster at the edge rather
    than corrupting the curve), NULL → 0 (NULLs cluster together at the
    origin). Pure bigint arithmetic; the shift/mask operators parse
    identically in Spark and DuckDB — only integer division is spelled
    differently (``div`` vs ``//``), hence ``dialect``."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    top = (1 << bits) - 1
    span = hi - lo
    intdiv = "div" if dialect == "spark" else "//"
    suffix = "L" if dialect == "spark" else ""
    clamped = (
        f"least(greatest(coalesce(cast({col} as bigint), {lo}{suffix}), "
        f"{lo}{suffix}), {hi}{suffix})"
    )
    return f"((({clamped} - {lo}{suffix}) * {top}{suffix}) {intdiv} {span}{suffix})"


def z_value_expr(quantized_cols: list[str], bits: int = MAX_BITS) -> str:
    """SQL for the Morton interleave of pre-quantized columns: bit i of
    column j lands at position ``i * n_cols + j``. Generated as a flat OR
    chain of bits*n_cols shift/mask terms — Catalyst folds it into one
    codegen expression."""
    n = len(quantized_cols)
    if not 1 <= n <= MAX_COLS:
        raise ValueError(f"need 1..{MAX_COLS} columns, got {n}")
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    terms = [
        f"(((({c}) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(quantized_cols)
    ]
    return "(" + " | ".join(terms) + ")"


def z_value(
    cols: list[str],
    bounds: dict[str, tuple[int, int]],
    bits: int = MAX_BITS,
) -> Column:
    """Morton value of raw columns given per-column (lo, hi) bounds."""
    quantized = [quantize_expr(c, *bounds[c], bits=bits) for c in cols]
    return F.expr(z_value_expr(quantized, bits=bits))
