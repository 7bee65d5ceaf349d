"""As-of join — for each left row, the latest right row with
``right.time <= left.time`` per key (optionally within a tolerance).

The reference approximates this with exact-grid spine joins
(SURVEY §2.3 J1: misses become NULL, imputed later); a true as-of join
is the general form and a first-class operator here.

Spark-first plan (no UDFs, one shuffle):

1. tag and union the two inputs on a common (key, time) axis,
2. one window per key ordered by (time, side-tag) carries the right
   side's payload forward with ``last(..., ignorenulls=True)``,
3. keep only left rows.

Equal timestamps match (``<=``): the right tag sorts BEFORE the left
tag at the same instant, so a right row at exactly left.time is
visible to it.  Right-side duplicates at the same (key, time) are
reduced to the latest-by-tiebreaker row first, making the result
deterministic.

Cost: one hash exchange on the key + one sort per partition —
identical to the sort-merge join Spark would run for an equi join, so
it scales the same way; no range-explosion, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "time",
    by: str | list[str] = "key",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """→ all left columns + each right ``value_cols`` column as
    ``asof_<name>`` (NULL when no right row precedes/follows, or the
    match is further than ``tolerance_seconds``).

    ``direction="backward"`` (default): latest right row with
    right.time <= left.time — the fill-from-history join.
    ``direction="forward"``: earliest right row with right.time >=
    left.time — the next-event join (attribution, time-to-convert).
    Forward is the same one-exchange tagged-union plan traversed in
    descending time order; equal instants still match (the right tag
    sorts before the left tag at the same time in either direction)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by_cols) | {on}
    ]

    r = right.groupBy(*by_cols, on).agg(
        *[F.max(c).alias(c) for c in value_cols]
    )  # deterministic reduction of same-instant right rows

    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = r.select(
        *by_cols, on, *[F.col(c).alias(f"__r_{c}") for c in value_cols]
    ).withColumn("__side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    time_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(time_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True
        ).over(w).alias("__asof_time"),
    )

    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col("__asof_time"))
            if direction == "backward"
            else F.unix_micros(F.col("__asof_time")) - F.unix_micros(F.col(on))
        )
        within = gap <= int(tolerance_seconds * 1_000_000)
        out = out.select(
            *left.columns,
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(*left.columns, *[f"asof_{c}" for c in value_cols])
    return out
