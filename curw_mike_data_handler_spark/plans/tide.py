"""Tide input pipeline (reference: inputs/gen_mike_input_tide_linux.py:88-120).

Smallest real query in the system (SURVEY §7 Phase 1): one series →
15-min spine → left spine join → −99999 sentinel → NULL → last-row
NULL→0 patch → drop remaining NULL rows → ordered headerless
(time,value) CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.functions.cleaning import (
    last_row_patch_wide,
    sentinel_to_null,
)
from curw_mike_data_handler_spark.functions.timegrid import time_spine
from curw_mike_data_handler_spark.sources.csv_io import write_single_csv

TIDE_SENTINEL = -99999.0  # tide:82-85


def prepare_tide_input(
    spark: SparkSession,
    series: DataFrame,
    start: str,
    end: str,
    *,
    step_minutes: int = 15,
) -> DataFrame:
    """series(time,value) → cleaned (time,value) on the 15-min grid."""
    spine = time_spine(spark, start, end, step_minutes)
    aligned = spine.join(series.select("time", "value"), "time", "left")  # tide:104
    cleaned = aligned.withColumn("value", sentinel_to_null("value", TIDE_SENTINEL))
    patched = last_row_patch_wide(cleaned, "time", ["value"])  # tide:110-111
    return patched.na.drop(subset=["value"]).orderBy("time")  # tide:113


def write_tide_input(df: DataFrame, path: str) -> str:
    # headerless (time,value) layout — tide:187
    return write_single_csv(df, path, header=False, columns=["value"])
