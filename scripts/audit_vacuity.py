"""Vacuity audit: row counts of every catalog oracle at the gate SF.

A query whose result is empty (or constant-zero) at sf0.01 passes the
driver's parity compare while attesting nothing — the silent failure
mode of synthetic data (see the verify skill's round-5e notes: absent
nation-0 suppliers, dense daily coverage, untuned throttle params).
Run after adding queries; investigate anything newly listed.

Known-acceptable zero-row result: ``j5_anti_join_report`` — an
orphan-FK report where 0 rows IS the healthy outcome (non-vacuity is
covered by its test fixture, which injects orphans).

Usage: python scripts/audit_vacuity.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from curw_mike_data_handler_spark import catalog
from curw_mike_data_handler_spark.sources.tables import TABLES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ACCEPTED = {"j5_anti_join_report"}


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    zero, err = [], []
    for name, sql in sorted(catalog.ORACLE.items()):
        try:
            n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
            if n == 0 and name not in ACCEPTED:
                zero.append(name)
        except Exception as exc:  # noqa: BLE001
            err.append(f"{name}: {type(exc).__name__}: {str(exc)[:100]}")
    for line in zero:
        print(f"VACUOUS: {line}")
    for line in err:
        print(f"ERROR: {line}")
    print(
        f"{len(zero)} vacuous / {len(err)} errored / "
        f"{len(catalog.ORACLE)} oracles at {SF}"
    )
    sys.exit(1 if (zero or err) else 0)


if __name__ == "__main__":
    main()
