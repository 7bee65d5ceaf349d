"""Explicit StructType schemas (SURVEY.md §1.4: nothing is inferred).

Reference-shaped tables follow FIXTURES.md; the reference re-infers
its schemas ad hoc with pandas casts (e.g. astype('float64') at
inputs/gen_mike_input_rf_linux.py:160) — here every edge is typed.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- input side (curw_sim contract) ------------------------------------
# Timeseries.get_timeseries(id_, start, end) returns (time, value) rows
# for a 64-hex series id (inputs/gen_mike_input_rf_linux.py:157).
SIM_TIMESERIES = _s(
    ("id", StringType()),
    ("time", TimestampType()),
    ("value", DoubleType()),
)

# SELECT id, grid_id FROM run WHERE model=%s AND obs_end>=%s
# (inputs/gen_mike_input_rf_linux.py:120-121).
SIM_RUN = _s(
    ("id", StringType()),
    ("model", StringType()),
    ("grid_id", StringType()),
    ("obs_end", TimestampType()),
)

# stored proc getActiveRfStationsAtGivenTime contract
# (inputs/gen_mike_input_rf_linux_all_stations_raw.py:142-147).
OBS_STATION = _s(
    ("hash_id", StringType()),
    ("station_id", StringType()),
    ("station_name", StringType()),
    ("latitude", DoubleType()),
    ("longitude", DoubleType()),
)

# inputs/params/mike_rainfall_stations.csv:1
MIKE_RAINFALL_STATIONS = OBS_STATION

# inputs/params/sb_rf_coefficients.csv:1 — catchment weight matrix.
SB_RF_COEFFICIENTS = _s(
    ("name", StringType()),
    ("curw_obs_id", StringType()),
    ("coefficient", DoubleType()),
)

# --- output side (curw_fcst star schema) -------------------------------
# resources/mike_stations.csv:1, seeded by outputs/init.py:35-43.
MIKE_STATIONS_SEED = _s(
    ("OBJECTID", IntegerType()),
    ("Location", StringType()),
    ("Latitude", DoubleType()),
    ("Longitude", DoubleType()),
)

STATION_DIM = _s(
    ("station_id", IntegerType()),
    ("name", StringType()),
    ("latitude", DoubleType()),
    ("longitude", DoubleType()),
    ("station_type", StringType()),
    ("description", StringType()),
)

SOURCE_DIM = _s(
    ("source_id", IntegerType()),
    ("model", StringType()),
    ("version", StringType()),
)

VARIABLE_DIM = _s(
    ("variable_id", IntegerType()),
    ("variable", StringType()),
)

UNIT_DIM = _s(
    ("unit_id", IntegerType()),
    ("unit", StringType()),
    ("unit_type", StringType()),
)

# run header (outputs/extract_water_level.py:88-97 contract).
FCST_RUN = _s(
    ("tms_id", StringType()),
    ("sim_tag", StringType()),
    ("station_id", IntegerType()),
    ("source_id", IntegerType()),
    ("variable_id", IntegerType()),
    ("unit_id", IntegerType()),
    ("start_date", TimestampType()),
    ("latest_fgt", TimestampType()),
)

# fact table, PK (tms_id, time, fgt) — fgt = forecast generated time;
# "latest fgt wins" read semantics (outputs/extract_water_level.py:96-97).
FCST_DATA = _s(
    ("tms_id", StringType()),
    ("time", TimestampType()),
    ("fgt", TimestampType()),
    ("value", DoubleType()),
)
