"""Regression tests for the round-7 verdict + ADVICE items.

Each test pins one specific fix so a refactor can't silently undo it:
- rf_obs CLI refuses to collect a fact-scale "registry" (verdict #7);
- all_stations_raw rounds HALF_EVEN at decimal .x5 ties, matching the
  reference's pandas float64 ``.round(1)`` (ADVICE #4);
- equidepth_bins buckets NULLs LAST on both paths, matching DuckDB's
  default ASC ordering (ADVICE #3).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

START = "2020-05-22 00:00:00"
END = "2020-05-23 00:00:00"


def test_rf_obs_refuses_fact_scale_station_registry(spark, tmp_path, monkeypatch):
    """verdict r6 #7: jobs/rf_obs collects distinct station ids for the
    export column order — dimension-scale by contract.  A mis-pointed
    fact table must fail fast with exit 1, BEFORE the driver collect."""
    from curw_mike_data_handler_spark.jobs import rf_obs
    from curw_mike_data_handler_spark.schemas import OBS_STATION, SIM_TIMESERIES
    from tests import fixtures as fx

    ts_path = str(tmp_path / "obs_ts.parquet")
    st_path = str(tmp_path / "stations.parquet")
    spark.createDataFrame(
        fx.gen_sim_timeseries(n_series=4), SIM_TIMESERIES
    ).write.parquet(ts_path)
    st_rows = fx.gen_stations(4)
    spark.createDataFrame(st_rows, OBS_STATION).write.parquet(st_path)

    monkeypatch.setattr(rf_obs, "MAX_EXPORT_STATIONS", 3)
    out = str(tmp_path / "mike_rf_obs.txt")
    with pytest.raises(SystemExit) as exc:
        rf_obs.main(
            ["--obs-ts", ts_path, "--stations", st_path, "--output", out,
             "-s", START, "-e", END]
        )
    assert exc.value.code == 1
    import os

    assert not os.path.exists(out)


def test_all_stations_raw_rounds_half_even_at_decimal_ties(spark):
    """ADVICE r6 #4: the final 1-dp round in plans/all_stations_raw runs
    on exact decimal(24,6) values, so .x5 ties are reached
    deterministically.  The reference's pandas ``.round(1)`` on float64
    is HALF_EVEN at representable ties — F.round (HALF_UP) would emit
    0.3 where the reference emits 0.2.  Pin bround semantics on the
    exact expression the plan uses."""
    df = spark.createDataFrame(
        [("a", "0.25"), ("b", "0.35"), ("c", "-0.25"), ("d", "0.151")],
        ["k", "raw"],
    ).withColumn("value", F.col("raw").cast("decimal(24,6)"))
    out = {
        r["k"]: r["v"]
        for r in df.select(
            "k", F.bround("value", 1).cast("double").alias("v")
        ).collect()
    }
    # Parity contract covers float64-REPRESENTABLE ties (0.25, -0.25);
    # 0.35 is not representable (float stores 0.34999…, pandas says
    # 0.3, exact-decimal half-even says 0.4) — that divergence is
    # inherent to exact accumulation and documented in the plan.
    assert out["a"] == 0.2  # tie → even (HALF_UP would say 0.3)
    assert out["c"] == -0.2  # negative tie → even
    assert out["d"] == 0.2  # non-tie sanity
    import pandas as pd

    assert pd.Series([0.25, -0.25, 0.151]).round(1).tolist() == [0.2, -0.2, 0.2]


def test_equidepth_bins_nulls_land_in_top_bucket_both_paths(spark):
    """ADVICE r6 #3: DuckDB ntile orders NULLS LAST (ASC default);
    Spark bare asc is NULLS FIRST.  Both equidepth_bins paths must
    deal NULLs to the TOP bucket."""
    from curw_mike_data_handler_spark.operators.robust import equidepth_bins

    rows = [(i, float(i)) for i in range(20)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, ["id", "v"])
    exact = {
        r["id"]: r["decile"]
        for r in equidepth_bins(
            df, "v", k=4, tie_cols=["id"], exact=True
        ).collect()
    }
    approx = {
        r["id"]: r["decile"]
        for r in equidepth_bins(df, "v", k=4, accuracy=100_000).collect()
    }
    assert exact[100] == exact[101] == 4
    assert approx[100] == approx[101] == 4
    # non-null values unaffected: first value still in bucket 1
    assert exact[0] == 1 and approx[0] == 1
