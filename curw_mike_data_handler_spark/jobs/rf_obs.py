"""Observed-rainfall input job (reference:
inputs/gen_mike_input_rf_obs_win.py ``__main__``, incl. the -t/--step
getopt and the rf_obs:254-256 multiple-of-5 validation; timestamps
validate to :00 minutes only per rf_obs:83-97).

Run: ``python -m curw_mike_data_handler_spark.jobs.rf_obs
--obs-ts obs_ts.parquet --stations stations.parquet
--output out/mike_rf_obs.txt [-s ... -e ...] [-t 15]``
"""

from __future__ import annotations

from datetime import datetime

from curw_mike_data_handler_spark.jobs._cli import (
    JobArgumentError,
    resolve_window,
    skip_if_exists,
    window_parser,
)
from curw_mike_data_handler_spark.plans.rf_obs import (
    prepare_obs_rainfall_input,
    validate_step,
    write_obs_rainfall_input,
)
from curw_mike_data_handler_spark.session import get_spark

# The wide MIKE export materializes one CSV COLUMN per station, and the
# CLI collects the distinct ids to pin the column order — both are only
# sane for a dimension-scale registry.  A mis-pointed fact table (every
# event id distinct) would otherwise OOM the driver collect.
MAX_EXPORT_STATIONS = 10_000


def main(argv: list[str] | None = None) -> int:
    p = window_parser("Prepare the MIKE observed-rainfall input file")
    p.add_argument(
        "-t", "--step", type=int, default=15,
        help="accumulation interval in minutes (multiple of 5; rf_obs default 15)",
    )
    p.add_argument("--obs-ts", required=True, help="observed timeseries parquet")
    p.add_argument("--stations", required=True, help="station registry parquet")
    p.add_argument("--output", required=True, help="output CSV path")
    a = p.parse_args(argv)
    # rf_obs:83-97 — explicit window times must sit on the hour grid
    start, end = resolve_window(
        a.start_time, a.end_time, quarter_hours_only=False, hours_only=True
    )
    try:
        validate_step(a.step)  # the one home of the rf_obs:254-256 rule
    except ValueError as exc:
        # reference-exact CLI wording (rf_obs:256)
        raise JobArgumentError("Time step should be a multiple of 5.") from exc

    if skip_if_exists(a.output, "Mike rainfall input"):
        return 0

    print(f"{datetime.now()} start preparing mike rainfall input")
    spark = get_spark("job-rf-obs")
    stations = spark.read.parquet(a.stations)
    result = prepare_obs_rainfall_input(
        spark,
        spark.read.parquet(a.obs_ts),
        stations,
        start,
        end,
        step_minutes=a.step,
    )
    # deterministic export order: sorted station ids (the reference's
    # order is its config-CSV file order; parquet registries carry no
    # row order, so the CLI pins the sorted order instead)
    ids = stations.select("station_id").distinct()
    # ONE bounded job: limit(MAX+1) caps what the driver can ever hold,
    # and an over-limit registry shows up as the extra row — no
    # separate count() pass over the distinct
    rows = ids.limit(MAX_EXPORT_STATIONS + 1).collect()
    if len(rows) > MAX_EXPORT_STATIONS:
        raise JobArgumentError(
            f"--stations has more than {MAX_EXPORT_STATIONS} distinct "
            "station_ids; it must be a station REGISTRY, not a fact "
            "table — refusing to collect the column order."
        )
    order = sorted(r["station_id"] for r in rows)
    write_obs_rainfall_input(result, a.output, order)
    print(f"{datetime.now()} completed preparing mike rainfall input")
    print(f"Mike input rainfall file is available at {a.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
