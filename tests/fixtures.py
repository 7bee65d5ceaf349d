"""Reference-shaped synthetic fixtures (FIXTURES.md): deterministic,
seed-42, 1-day window on the 5-min grid with gaps, negatives and
sentinels to exercise cleaning/imputation.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

START = datetime(2020, 5, 22, 0, 0, 0)
END = datetime(2020, 5, 23, 0, 0, 0)


def series_hash(i: int) -> str:
    return f"{i:064x}"


def gen_sim_timeseries(n_series: int = 6, step_min: int = 5, *, gap_rate=0.1,
                       neg_rate=0.05, sentinel_rate=0.0):
    """rows (id, time, value) — gaps are missing rows."""
    rng = random.Random(42)
    rows = []
    t = START
    ticks = []
    while t <= END:
        ticks.append(t)
        t += timedelta(minutes=step_min)
    for i in range(n_series):
        for t in ticks:
            r = rng.random()
            if r < gap_rate:
                continue
            if r < gap_rate + neg_rate:
                v = -rng.random() * 5
            elif r < gap_rate + neg_rate + sentinel_rate:
                v = -99999.0
            else:
                v = round(rng.random() * 10, 2)
            rows.append((series_hash(i), t, v))
    return rows


def gen_run(n_series: int = 6):
    """(id, model, grid_id, obs_end): half fresh, half stale; one
    non-hechms model row."""
    rows = []
    for i in range(n_series):
        obs_end = END if i % 2 == 0 else START - timedelta(days=2)
        rows.append((series_hash(i), "hechms", f"rainfall_{100000+i}_stn{i}", obs_end))
    rows.append((series_hash(99), "wrf", "rainfall_100099_other", END))
    return rows


def gen_coefficients(n_series: int = 6, n_catchments: int = 3):
    """(name, curw_obs_id, coefficient) — stations shared across
    catchments, weights sum ≈ 1 per catchment."""
    rows = []
    for c in range(n_catchments):
        members = [(100000 + ((c + k) % n_series)) for k in range(3)]
        w = [0.5, 0.3, 0.2]
        for obs, coeff in zip(members, w):
            rows.append((f"C_{c:02d}", str(obs), coeff))
    return rows


def gen_stations(n: int = 6):
    """(hash_id, station_id, station_name, latitude, longitude)"""
    rng = random.Random(7)
    return [
        (
            series_hash(i),
            str(100000 + i),
            f"stn{i}",
            6.8 + rng.random() * 0.3,
            79.8 + rng.random() * 0.9,
        )
        for i in range(n)
    ]
