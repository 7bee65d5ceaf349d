"""All-stations raw rainfall with spatial imputation (reference:
inputs/gen_mike_input_rf_linux_all_stations_raw.py:220-379).

Distinct from the catchment pipeline: per MIKE station, missing values
are filled from the nearest-1 then nearest-2 observation stations
(≤100 km) and only THEN by the row mean — the mean is computed over the
already-neighbor-filled frame (all_raw:278-286; contrast rf_linux which
row-means the pre-fill pattern).  Output rounded to 1 dp with display
names (all_raw:288-294).

Spark-first: the neighbor map is a broadcast cross join + window rank
(operators/nearest.py); the fill chain is a self-join of the resampled
long frame against its neighbor rows — two broadcast-ish joins keyed on
(time, station), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.functions.cleaning import (
    negatives_to_null,
    row_mean_impute_long,
)
from curw_mike_data_handler_spark.functions.timegrid import time_spine
from curw_mike_data_handler_spark.operators.nearest import nearest_k_stations
from curw_mike_data_handler_spark.operators.resample import resample_sum_right_closed
from curw_mike_data_handler_spark.operators.spine import pivot_wide, spine_align_long
from curw_mike_data_handler_spark.sources.csv_io import write_single_csv


def prepare_all_stations_raw(
    spark: SparkSession,
    sim_ts: DataFrame,
    mike_stations: DataFrame,
    active_obs: DataFrame,
    start: str,
    end: str,
    *,
    src_step_minutes: int = 5,
    out_step_minutes: int = 15,
    k_neighbors: int = 2,
    max_km: float = 100.0,
) -> DataFrame:
    """→ long (time, station_id, value) 15-min, neighbor+mean imputed,
    rounded 1 dp.

    ``sim_ts``: (id=station hash, time, value); ``mike_stations`` /
    ``active_obs``: (hash_id, station_id, station_name, lat, lon)."""
    # nearest ≤2 active neighbors within 100 km per MIKE station
    # (all_raw:159-202; first-two-of-ranked ⇒ k=2 here since the fill
    # chain only uses neighbor-1 and neighbor-2, all_raw:278-284)
    nn = nearest_k_stations(
        mike_stations, active_obs, k=k_neighbors, max_km=max_km,
        target_id="station_id", candidate_id="station_id",
    )

    stations = mike_stations.select("hash_id", "station_id")
    # value accumulates as DECIMAL(24,6): decimal addition is exact and
    # associative, so the resample sums (and the row mean below) are
    # bit-identical under ANY partitioning/combine order — a double sum
    # here can flip the final round(…,1) at a .x5 boundary between two
    # runs of the same plan (caught by the job-vs-plan golden test).
    ts = sim_ts.filter(
        (F.col("time") > F.lit(start)) & (F.col("time") <= F.lit(end))
    ).join(F.broadcast(stations), sim_ts["id"] == stations["hash_id"], "inner") \
     .select("station_id", "time", F.col("value").cast("decimal(24,6)").alias("value"))

    spine = time_spine(spark, start, end, src_step_minutes)
    aligned = spine_align_long(
        spine, ts, stations.select("station_id").distinct(), series_col="station_id"
    )
    res = resample_sum_right_closed(
        aligned, "time", ["value"], out_step_minutes, group_cols=["station_id"]
    )
    cleaned = res.withColumn("value", negatives_to_null("value"))  # all_raw:277

    # neighbor fill chain: rank-1 then rank-2 (all_raw:278-284)
    filled = cleaned
    for rank in range(1, k_neighbors + 1):
        nbr = nn.filter(F.col("rank") == rank).select(
            F.col("origin").alias("station_id"), F.col("neighbor").alias(f"__n{rank}")
        )
        nbr_vals = cleaned.select(
            F.col("station_id").alias(f"__n{rank}"),
            F.col("time"),
            F.col("value").alias(f"__nv{rank}"),
        )
        filled = (
            filled.join(F.broadcast(nbr), "station_id", "left")
            .join(nbr_vals, ["time", f"__n{rank}"], "left")
            .withColumn("value", F.coalesce(F.col("value"), F.col(f"__nv{rank}")))
            .drop(f"__n{rank}", f"__nv{rank}")
        )

    # row mean over the ALREADY-filled frame (all_raw:286) — re-cast to
    # decimal so the per-timestamp avg is combine-order exact too
    imputed = row_mean_impute_long(
        filled.withColumn("value", F.col("value").cast("decimal(24,6)"))
    )
    # all_raw:288 — pandas float64 .round(1) is HALF_EVEN; F.round on
    # the exact decimal would be HALF_UP, which diverges from the
    # reference at the .x5 ties the decimal path now reaches
    # deterministically, so use bround (half-even) to keep reference
    # parity at representable ties.  The 1-dp decimal → double cast is
    # exact.
    return imputed.withColumn("value", F.bround("value", 1).cast("double"))


def write_all_stations_raw(
    df_long: DataFrame,
    path: str,
    display_names: DataFrame,
    station_order: list[str],
) -> str:
    """Rename to display names (all_raw:290-294) and write wide CSV."""
    named = df_long.join(F.broadcast(display_names), "station_id", "left").select(
        "time", F.col("station_name").alias("name"), "value"
    )
    wide = pivot_wide(named, series_col="name", series_order=station_order)
    return write_single_csv(wide, path, header=True, columns=station_order)
