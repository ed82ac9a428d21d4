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


def out_of_order_rows(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rows whose timestamp runs BACKWARD against their arrival sequence —
    per ``key_col``, a row violates when its ``ts_col`` is earlier than the
    maximum timestamp of any lower-``seq_col`` row of the same key.

    This is the watermark-sizing audit for a streaming ingest: the
    ``late_by_us`` distribution of the violations IS the out-of-orderness
    bound a Structured Streaming ``withWatermark`` must cover (late rows
    beyond it are silently dropped by windowed aggregation). The drift
    family says *values* moved; this says *time itself* isn't monotone.

    Output per violating row: ``(key, seq, ts_str, prev_max_ts_str,
    late_by_us)``. ``late_by_us`` is exact integer epoch-microseconds —
    never a float interval. NULL keys/sequence numbers are exempt (the
    not-null rule owns those rows); NULL timestamps never flag and never
    poison the running max (``max`` ignores NULLs).

    Scale shape: ONE exchange keyed on ``key_col``, then a per-key running
    max — no self-join, no global sort. Keys are users/devices (high
    cardinality), so partitions stay balanced; a single hot key is a data
    bug this very check surfaces.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scoped = df.filter(F.col(key_col).isNotNull() & F.col(seq_col).isNotNull())
    marked = scoped.select(
        key_col,
        seq_col,
        F.col(ts_col),
        F.max(ts_col).over(w).alias("_prev_max"),
    )
    return marked.filter(F.col(ts_col) < F.col("_prev_max")).select(
        key_col,
        seq_col,
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.date_format("_prev_max", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("prev_max_ts_str"),
        (
            F.unix_micros(F.col("_prev_max").cast("timestamp"))
            - F.unix_micros(F.col(ts_col).cast("timestamp"))
        ).alias("late_by_us"),
    )


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
