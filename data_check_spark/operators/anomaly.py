"""Time-series volume anomaly detection, integer-exact.

The monitoring sibling of the drift family (operators/drift.py): drift
compares a partition's *distribution* against a baseline snapshot; this
flags *days whose event volume* breaks out of their own trailing window —
the "ingest fell over / doubled overnight" alarm a 100-TB pipeline wants
on every feed.

The classic test is ``|x - mean| > k·stddev`` over a trailing window.
Computing stddev means sqrt — a float whose last ulp can differ across
engines. Squaring the test removes it: with window count ``w``, sum ``s``
and sum of squares ``ss``,

    (x - s/w)^2 > k^2 · (ss - s^2/w)/w   ⇔   (w·x - s)^2 > k^2 · (w·ss - s^2)

which is PURE INTEGER arithmetic — the flag is bit-identical on any
engine, no representation-boundary rounding (CLAUDE.md float→string
gotchas). Squares are carried as decimal(38,0) (Spark) / HUGEINT (DuckDB)
so daily volumes up to ~3·10^9 rows never overflow a signed 64-bit lane.

Scale shape: the heavy work is one map-side-combined count per day —
counts only, never events, shuffle. The window then runs over the tiny
(#days)-row frame; a global window there is deliberate and cheap (a year
of data is 365 rows regardless of corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_volume_anomaly(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    k: int = 3,
    trailing_days: int = 7,
    min_window: int = 4,
) -> DataFrame:
    """Flag days whose event count deviates > ``k`` trailing stddevs.

    The window is the ``trailing_days`` rows strictly BEFORE the current
    day (the day under test never contaminates its own baseline). Days
    with fewer than ``min_window`` predecessors are never flagged (cold
    start). Output per day: ``(day, n_events, window_n, window_sum,
    is_anomaly)``, ordered by day via the caller.

    The calendar is DENSIFIED between the first and last observed day:
    a day with zero events still gets a row (``n_events = 0``) — a total
    outage is precisely the day this alarm exists for, and grouping alone
    would silently drop it AND let the trailing window span the gap.
    """
    if k <= 0 or trailing_days <= 0 or min_window <= 0:
        raise ValueError("k, trailing_days and min_window must be positive")
    observed = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    # sequence(min, max) of dates steps one day; empty input → NULL bounds
    # → explode of NULL emits nothing → empty result, no special-casing
    calendar = observed.agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    ).select(F.explode(F.sequence("_d0", "_d1")).alias("day"))
    daily = calendar.join(observed, "day", "left").select(
        "day", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events")
    )
    w = Window.orderBy("day").rowsBetween(-trailing_days, -1)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — 128-bit lane
    stats = daily.select(
        "day",
        "n_events",
        F.count("n_events").over(w).alias("window_n"),
        F.sum("n_events").over(w).alias("window_sum"),
        F.sum(dec(F.col("n_events")) * F.col("n_events")).over(w).alias("_ss"),
    )
    d = dec(F.col("window_n") * F.col("n_events") - F.col("window_sum"))
    var_num = dec(F.col("window_n")) * F.col("_ss") - dec(F.col("window_sum")) * F.col(
        "window_sum"
    )
    return stats.select(
        "day",
        "n_events",
        F.coalesce("window_n", F.lit(0)).cast("long").alias("window_n"),
        F.coalesce("window_sum", F.lit(0)).cast("long").alias("window_sum"),
        F.when(
            (F.col("window_n") >= min_window) & (d * d > F.lit(k * k) * var_num),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_anomaly"),
    )
