"""Deterministic (seeded, engine-portable) sampling for training-data curation.

``rand()``-based sampling is neither reproducible across runs/engines nor
stable under repartitioning; at corpus scale the curation pipeline needs a
sample that is a pure FUNCTION OF THE ROW KEY so re-runs, resumes, and
cross-engine audits (the DuckDB oracle) all agree row-for-row.

Mechanism: md5 of ``"<seed>:<id>"`` — the first 8 hex digits, compared
against ``floor(rate * 16^8)`` rendered as zero-padded hex. A lexicographic
compare of fixed-width lowercase hex equals a numeric compare, so the kept
fraction is ``round(rate * 2^32) / 2^32`` exactly, identically on every
engine with a standard md5. This is a pure map-side projection+filter: NO
shuffle, no sort, no state — the sample of 100 TB costs one scan.

``stratified_sample`` applies a per-stratum rate (e.g. downsample dominant
languages, keep the long tail) via a compile-time CASE over the strata map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_WIDTH = 8  # 32 bits of the md5 → rate resolution 1/2^32


def _rate_threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = round(rate * (1 << (4 * HEX_WIDTH)))
    if n >= 1 << (4 * HEX_WIDTH):
        # rate 1.0: 'g' sorts after every hex digit, so `hash < 'g'` keeps
        # all rows (the 9-char '100000000' would NOT — lexicographic compare
        # against 8-char hashes is by leading characters).
        return "g"
    return format(n, f"0{HEX_WIDTH}x")


def _keyed_hash(id_col: str, seed: str) -> Column:
    # NULL-keyed rows hash as a NUL sentinel rather than propagating NULL
    # through md5 (a NULL comparison is three-valued and filter() would
    # silently DROP every null-keyed row — even at rate=1.0).
    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\u0000"))
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key)), 1, HEX_WIDTH)


def sample_mark(id_col: str, rate: float, *, seed: str = "s0") -> Column:
    """Boolean keep-mark: deterministic in (seed, id), kept fraction ≈ rate."""
    return _keyed_hash(id_col, seed) < F.lit(_rate_threshold(rate))


def deterministic_sample(
    df: DataFrame, *, id_col: str, rate: float, seed: str = "s0"
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose keyed hash < rate."""
    return df.filter(sample_mark(id_col, rate, seed=seed))


def stratified_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sample (rate chosen by ``strata_col``).

    The hash is computed ONCE per row; only the threshold varies by stratum,
    so the plan stays a single map-side filter with a small CASE — no join
    against a rates table, no shuffle.
    """
    h = _keyed_hash(id_col, seed)
    threshold: Column | None = None
    for stratum, rate in sorted(rates.items()):
        lit = F.lit(_rate_threshold(rate))
        match = F.col(strata_col) == stratum
        threshold = F.when(match, lit) if threshold is None else threshold.when(match, lit)
    default = F.lit(_rate_threshold(default_rate))
    threshold = default if threshold is None else threshold.otherwise(default)
    return df.filter(h < threshold)
