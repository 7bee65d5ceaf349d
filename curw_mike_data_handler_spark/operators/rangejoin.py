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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    by: str | list[str] | None = None,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Interval×interval OVERLAP join (closed intervals, numeric
    endpoints — e.g. micro-epoch longs): one row per overlapping
    (left, right) pair, all columns of both sides.

    Both sides explode to the buckets their interval covers and meet
    in an equi join on (by, bucket) — the same blocking that makes j7's
    point-in-interval join hash-based, generalized to two interval
    sets: candidate count is Σ per-bucket |L|·|R|, never |L|·|R|
    globally, and the bucket key IS the shuffle key.

    A pair overlapping k shared buckets would surface k times; instead
    of a distinct, each pair is kept ONLY in the overlap's first
    bucket (``bucket == floor(max(starts)/width)`` — a row that exists
    exactly once per overlapping pair), so the join needs no
    post-aggregation and stays pipelined."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    w = F.lit(bucket_width).cast("long")
    lv = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / w).cast("long"),
                F.floor(F.col(left_end) / w).cast("long"),
            )
        ),
    )
    rv = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / w).cast("long"),
                F.floor(F.col(right_end) / w).cast("long"),
            )
        ),
    )
    joined = lv.join(rv, [*by_cols, "__bucket"]).filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            F.col("__bucket")
            == F.floor(
                F.greatest(F.col(left_start), F.col(right_start)) / w
            ).cast("long")
        )
    )
    return joined.drop("__bucket")
