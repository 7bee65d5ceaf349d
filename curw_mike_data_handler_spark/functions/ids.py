"""Deterministic content-addressed series IDs.

The reference's TS.generate_timeseries_id(meta) produces a 64-hex hash
of the series' dimensional coordinates (outputs/extract_water_level.py:88-92,
meta assembled at wl_x:225-235).  Deterministic IDs are what make
re-extraction upserts idempotent — same semantics here via sha2 over a
canonical key ordering, computed JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical field order for the hash input; mirrors the tms_meta dict
# at wl_x:225-235 (sim_tag, model, version, variable, unit, unit_type,
# source/variable/unit ids, lat, lon, station_id).
TMS_META_FIELDS = (
    "sim_tag",
    "model",
    "version",
    "variable",
    "unit",
    "unit_type",
    "source_id",
    "variable_id",
    "unit_id",
    "latitude",
    "longitude",
    "station_id",
)


def timeseries_id(*meta_cols: Column | str) -> Column:
    """64-hex SHA-256 of the ordered metadata tuple."""
    cols = [F.col(c) if isinstance(c, str) else c for c in meta_cols]
    return F.sha2(F.concat_ws("|", *[c.cast("string") for c in cols]), 256)


def doc_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased
    text. Portable: identical in any engine with md5()."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))
