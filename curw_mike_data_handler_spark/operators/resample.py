"""Right-closed / right-labeled tumbling-window resample (SURVEY §2.4 A1).

pandas ``resample('15min', label='right', closed='right').sum()``
(rf_linux:165, all_raw:275) buckets rows into ``(t−step, t]`` labeled
``t``; Spark's ``F.window`` is ``[start, end)`` labeled start.  The
helper shifts timestamps by −1 microsecond so boundary rows fall into
the bucket they END, then labels with ``window.end`` — an exact
translation for any timestamp precision.

pandas-0.25 sum semantics: an ALL-NaN bucket sums to **0.0**, a
partial-NaN bucket skips NaNs (SURVEY §4.2-1) — reproduced with
``coalesce(sum(c), 0.0)`` (Spark's sum already skips NULLs).

Scale: one shuffle on the bucket key with map-side partial aggregation;
no Python, no state.  Group columns ride along so per-series resampling
of millions of series is the same single exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_sum_right_closed(
    df: DataFrame,
    time_col: str,
    value_cols: Sequence[str],
    step_minutes: int,
    group_cols: Sequence[str] = (),
    *,
    all_null_is_zero: bool = True,
) -> DataFrame:
    """``df`` → one row per (group_cols…, bucket-end) with summed values."""
    shifted = F.col(time_col) - F.expr("INTERVAL 0.000001 SECONDS")
    bucket = F.window(shifted, f"{int(step_minutes)} minutes")
    aggs = []
    for c in value_cols:
        s = F.sum(c)
        if all_null_is_zero:
            s = F.coalesce(s, F.lit(0.0))
        aggs.append(s.alias(c))
    return (
        df.groupBy(*group_cols, bucket.alias("__w"))
        .agg(*aggs)
        .withColumn(time_col, F.col("__w.end"))
        .drop("__w")
        .select(*group_cols, time_col, *value_cols)
    )
