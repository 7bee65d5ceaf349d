"""Observed-rainfall input with parameterized accumulation interval
(reference: inputs/gen_mike_input_rf_obs_win.py).

Differences from the forecast rainfall pipeline: the accumulation step
is a CLI parameter validated to a multiple of 5 minutes
(rf_obs:254-256), timestamps validate to :00 minutes only
(rf_obs:83-97), raw observations are aggregated to the custom interval
(extract_obs_rain_custom_min_intervals, rf_obs:151-152 → here the same
right-closed resample with a variable step), and NULLs are exported as
EMPTY STRINGS (rf_obs:168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.functions.cleaning import negatives_to_null
from curw_mike_data_handler_spark.functions.timegrid import time_spine
from curw_mike_data_handler_spark.operators.resample import resample_sum_right_closed
from curw_mike_data_handler_spark.operators.spine import pivot_wide, spine_align_long
from curw_mike_data_handler_spark.sources.csv_io import write_single_csv


def validate_step(step_minutes: int) -> int:
    if step_minutes <= 0 or step_minutes % 5 != 0:
        raise ValueError("time step should be a multiple of 5 minutes")  # rf_obs:254-256
    return step_minutes


def prepare_obs_rainfall_input(
    spark: SparkSession,
    obs_ts: DataFrame,
    stations: DataFrame,
    start: str,
    end: str,
    *,
    step_minutes: int = 60,
    src_step_minutes: int = 5,
) -> DataFrame:
    """→ long (time, station_id, value) at the custom interval;
    negatives cleaned AFTER accumulation; gaps stay NULL (exported
    blank — the obs file shows missing data, it does not impute)."""
    validate_step(step_minutes)
    station_dim = stations.select("hash_id", "station_id")
    ts = obs_ts.filter(
        (F.col("time") > F.lit(start)) & (F.col("time") <= F.lit(end))
    ).join(F.broadcast(station_dim), obs_ts["id"] == station_dim["hash_id"], "inner") \
     .select("station_id", "time", F.col("value").cast("decimal(24,6)").alias("value"))

    spine = time_spine(spark, start, end, src_step_minutes)
    aligned = spine_align_long(
        spine, ts, station_dim.select("station_id").distinct(), series_col="station_id"
    )
    res = resample_sum_right_closed(
        aligned, "time", ["value"], step_minutes, group_cols=["station_id"],
        all_null_is_zero=False,  # obs export keeps gaps visible (rf_obs:168)
    )
    # value accumulated as DECIMAL(24,6) (exact, combine-order
    # independent); the per-bucket sum → double cast is deterministic
    return res.withColumn(
        "value", negatives_to_null(F.col("value").cast("double"))
    )


def write_obs_rainfall_input(
    df_long: DataFrame, path: str, station_order: list[str]
) -> str:
    wide = pivot_wide(df_long, series_col="station_id", series_order=station_order)
    # NULL → empty string is the csv writer's nullValue="" default
    return write_single_csv(wide, path, header=True, columns=station_order)
