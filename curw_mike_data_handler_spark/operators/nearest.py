"""Nearest-neighbor station map (SURVEY §2.3 J3 + §2.5 W2).

find_nearest_obs_stations (all_raw:159-202): for every target station,
rank all active observation stations by great-circle distance and keep
the first ≤k with distance ≤ max_km, excluding self-matches.

Spark-first: cross join of two small dims (Catalyst picks
BroadcastNestedLoopJoin), distance as pure column math, then a
row_number window per origin.  The dist/self filters commute with the
ascending rank (SURVEY W2 note), so they're applied BEFORE ranking to
shrink the window input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.functions.geo import great_circle_km


def nearest_k_stations(
    targets: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 3,
    max_km: float = 100.0,
    target_id: str = "station_id",
    candidate_id: str = "station_id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    probe_partitions: int | None = None,
) -> DataFrame:
    """→ (origin, neighbor, distance_km, rank) with rank ∈ [1, k].

    Ties broken by neighbor id so ranking is total and deterministic
    (the reference's dict-ordering tie behavior is unspecified).

    ``probe_partitions``: the probe (target) side drives the broadcast
    nested-loop join's parallelism — a dimension read from one small
    parquet file is ONE partition, serializing the whole O(T×C) trig
    evaluation on one core.  Pass the cluster parallelism (or leave
    ``None`` when targets is already a large well-partitioned table)."""
    t = targets.select(
        F.col(target_id).alias("origin"),
        F.col(lat_col).alias("t_lat"),
        F.col(lon_col).alias("t_lon"),
    )
    if probe_partitions:
        t = t.repartition(probe_partitions)
    c = candidates.select(
        F.col(candidate_id).alias("neighbor"),
        F.col(lat_col).alias("c_lat"),
        F.col(lon_col).alias("c_lon"),
    )
    pairs = t.crossJoin(F.broadcast(c)).withColumn(
        "distance_km",
        great_circle_km(F.col("t_lat"), F.col("t_lon"), F.col("c_lat"), F.col("c_lon")),
    )
    eligible = pairs.filter(
        (F.col("distance_km") <= max_km) & (F.col("origin") != F.col("neighbor"))
    )
    w = Window.partitionBy("origin").orderBy("distance_km", "neighbor")
    return (
        eligible.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("origin", "neighbor", "distance_km", "rank")
    )
