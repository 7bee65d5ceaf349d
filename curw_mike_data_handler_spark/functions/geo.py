"""Great-circle distance — spherical law of cosines, km.

Mirrors find_nearest_obs_stations' formula
(inputs/gen_mike_input_rf_linux_all_stations_raw.py:180-185):
``6371 * acos(cos φ1 cos φ2 cos(λ2−λ1) + sin φ1 sin φ2)`` with the
intermediate clamped to ≤ 1 before acos (the reference branches to
``acos(1)`` when rounding pushes it above 1). Pure column math — runs
inside whole-stage codegen on both sides of a broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def great_circle_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    p1, p2 = F.radians(lat1), F.radians(lat2)
    l1, l2 = F.radians(lon1), F.radians(lon2)
    inner = F.cos(p1) * F.cos(p2) * F.cos(l2 - l1) + F.sin(p1) * F.sin(p2)
    return F.lit(EARTH_RADIUS_KM) * F.acos(F.least(inner, F.lit(1.0)))
