"""Discharge input job (reference: inputs/gen_mike_input_dis_linux.py
``__main__``): validated window → skip-if-exists → negatives-cleaned
spine pipeline → headerless (time,value) CSV.

Run: ``python -m curw_mike_data_handler_spark.jobs.discharge
--series series.parquet --output out/mike_dis.txt [-s ... -e ...]``
"""

from __future__ import annotations

from datetime import datetime

from curw_mike_data_handler_spark.jobs._cli import (
    resolve_window,
    skip_if_exists,
    window_parser,
)
from curw_mike_data_handler_spark.plans.discharge import (
    prepare_discharge_input,
    write_discharge_input,
)
from curw_mike_data_handler_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = window_parser("Prepare the MIKE discharge input file")
    p.add_argument("--series", required=True, help="discharge series parquet")
    p.add_argument("--output", required=True, help="output CSV path")
    a = p.parse_args(argv)
    start, end = resolve_window(a.start_time, a.end_time)

    if skip_if_exists(a.output, "Mike discharge input"):
        return 0

    print(f"{datetime.now()} start preparing mike discharge input")
    spark = get_spark("job-discharge")
    result = prepare_discharge_input(spark, spark.read.parquet(a.series), start, end)
    write_discharge_input(result, a.output)
    print(f"Mike input discharge file is available at {a.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
