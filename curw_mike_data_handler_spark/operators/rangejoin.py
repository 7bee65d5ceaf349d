"""Range (interval) join — points ⋈ intervals with
``start <= t <= end``, bucketed so it runs as a HASH join.

A naive theta join on the inequality alone gives Catalyst nothing to
hash on → BroadcastNestedLoopJoin, O(|points|·|intervals|) — fatal at
scale.  The standard fix (used by every range-join-capable engine,
e.g. Databricks' range-join hints): quantize time into width-W
buckets, explode each interval over the buckets it spans, equi-join on
(keys…, bucket), then apply the exact predicate.  Each matched pair
appears exactly once (a point lives in exactly one bucket), so no
dedup pass is needed.

Pick ``bucket_seconds`` on the order of the typical interval length:
each interval explodes into ~(len/W)+1 rows, and each bucket pairs
points only with intervals actually overlapping it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points_in_intervals(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_time: str = "time",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """→ one row per (point, containing interval), all columns of both
    sides.  ``by`` adds equi-key columns (same name on both sides) to
    the join, composing key + range predicates."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    w = F.lit(bucket_seconds)

    p = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_time)) / w)
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w),
                F.floor(F.unix_timestamp(F.col(end_col)) / w),
            )
        ),
    )
    joined = p.join(iv, [*by_cols, "__bucket"]).filter(
        (F.col(point_time) >= F.col(start_col))
        & (F.col(point_time) <= F.col(end_col))
    )
    return joined.drop("__bucket")
