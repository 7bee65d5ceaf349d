"""Shared CLI glue for the job entry points (reference getopt blocks,
rf_linux:224-276)."""

from __future__ import annotations

import argparse
import os
from datetime import datetime, timedelta

from curw_mike_data_handler_spark.functions.timegrid import check_time_format


class JobArgumentError(SystemExit):
    """Validation failure → exit code 1 (the reference prints and
    ``exit(1)``; argparse's own errors keep its exit code 2)."""

    def __init__(self, message: str):
        print(message)
        super().__init__(1)


def window_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "-s", "--start_time", default=None,
        help='start "YYYY-MM-DD HH:MM:SS" (default: 00:00:00, 3 days ago)',
    )
    p.add_argument(
        "-e", "--end_time", default=None,
        help='end "YYYY-MM-DD HH:MM:SS" (default: 00:00:00, 2 days ahead)',
    )
    return p


def resolve_window(
    start: str | None,
    end: str | None,
    *,
    quarter_hours_only: bool = True,
    hours_only: bool = False,
    now: datetime | None = None,
) -> tuple[str, str]:
    """rf_linux:253-263: explicit times are format-validated (seconds
    00, minutes on the grid — rf_obs:83-97 pins minutes to :00 via
    ``hours_only``); absent times default to day-floored now−3d /
    now+2d."""
    now = now or datetime.now()
    if start is None:
        start = (now - timedelta(days=3)).strftime("%Y-%m-%d 00:00:00")
    else:
        _validate(start, quarter_hours_only, hours_only)
    if end is None:
        end = (now + timedelta(days=2)).strftime("%Y-%m-%d 00:00:00")
    else:
        _validate(end, quarter_hours_only, hours_only)
    return start, end


def _validate(
    time_str: str, quarter_hours_only: bool, hours_only: bool = False
) -> None:
    try:
        check_time_format(
            time_str, quarter_hours_only=quarter_hours_only, hours_only=hours_only
        )
    except ValueError as exc:
        raise JobArgumentError(str(exc)) from exc


def skip_if_exists(path: str, what: str) -> bool:
    """The idempotence gate (rf_linux:271-276): an existing output file
    short-circuits the run, so a cron re-tick is a no-op."""
    if os.path.isfile(path):
        print(f"{what} file already in path : {path}")
        return True
    return False
