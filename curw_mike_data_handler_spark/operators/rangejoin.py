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
    post-aggregation and stays pipelined.

    The two sides may use the SAME endpoint column names (the defaults
    do): the overlap predicate references internal per-side aliases,
    never the raw names, so no ambiguous-reference failure — though if
    names collide the OUTPUT carries both same-named columns, as any
    Spark join of same-named frames does."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    w = F.lit(bucket_width).cast("long")
    lv = (
        left.withColumn("__ls", F.col(left_start))
        .withColumn("__le", F.col(left_end))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__ls") / w).cast("long"),
                    F.floor(F.col("__le") / w).cast("long"),
                )
            ),
        )
    )
    rv = (
        right.withColumn("__rs", F.col(right_start))
        .withColumn("__re", F.col(right_end))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__rs") / w).cast("long"),
                    F.floor(F.col("__re") / w).cast("long"),
                )
            ),
        )
    )
    joined = lv.join(rv, [*by_cols, "__bucket"]).filter(
        (F.col("__ls") <= F.col("__re"))
        & (F.col("__rs") <= F.col("__le"))
        & (
            F.col("__bucket")
            == F.floor(F.greatest(F.col("__ls"), F.col("__rs")) / w).cast("long")
        )
    )
    return joined.drop("__bucket", "__ls", "__le", "__rs", "__re")
