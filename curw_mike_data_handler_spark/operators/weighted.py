"""Weighted group aggregation — the reference's core computation
(SURVEY §2.4 A4): per catchment, Σ over member stations of
``series[station] × coefficient`` — a time×station matrix times a
station×catchment weight matrix.

The reference runs a doubly-nested Python loop with repeated left
merges (rf_linux:180-202).  Spark-first: one broadcast join of the
long-form series against the (tiny) weight matrix + one groupBy — a
single shuffle on (time, group), map-side combined, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_group_sum(
    ts_long: DataFrame,
    weights: DataFrame,
    *,
    series_col: str = "series",
    weight_series_col: str = "curw_obs_id",
    group_col: str = "name",
    time_col: str = "time",
    value_col: str = "value",
    coeff_col: str = "coefficient",
    out_col: str = "value",
) -> DataFrame:
    """ts_long(time, series, value) ⋈ weights(group, series, coeff)
    → (time, group, Σ value·coeff).

    NULL handling matches the pandas multiply-then-sum: a NULL
    observation contributes nothing unless ALL members are NULL, in
    which case pandas' sum(axis=1) of all-NaN is 0.0 (rf_linux:199) —
    hence the coalesce."""
    joined = ts_long.join(
        F.broadcast(weights),
        ts_long[series_col] == weights[weight_series_col],
        "inner",
    )
    return (
        joined.groupBy(time_col, group_col)
        .agg(F.coalesce(F.sum(F.col(value_col) * F.col(coeff_col)), F.lit(0.0)).alias(out_col))
    )
