#!/usr/bin/env python
"""Pre-verify the driver's NEXT correctness sample.

The per-round driver runs the first 50 entries of
``__spark_entry__.queries()`` against their DuckDB oracles at sf0.01;
the rotation in ``__spark_entry__._rotated`` puts never-driver-checked
queries first, so the window is deterministic given the committed
CORRECTNESS_r*.json files.  This script computes that exact window and
runs the verify-skill oracle loop over it in a vanilla session —
run it before round end (and re-run after ANY catalog addition, since
a new query is never-checked and therefore enters the window).

Usage: ``python scripts/check_rotation.py [n]`` (default n=50).
Exit code 0 iff every window query hash-matches its oracle.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod
    from curw_mike_data_handler_spark import catalog

    names = list(mod.queries().keys())[:n]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad: list[str] = []
    t0 = time.time()
    for name in names:
        try:
            sdf = catalog.QUERIES[name](spark, SF)
            cols = sorted(sdf.columns)
            srows = sorted(
                repr(tuple(r[c] for c in cols)) for r in sdf.collect()
            )
            orows = sorted(
                repr(tuple(r[c] for c in cols))
                for r in con.execute(catalog.ORACLE[name])
                .fetch_arrow_table()
                .to_pylist()
            )
            ok = srows == orows
            detail = f"{len(srows)} rows"
        except Exception as exc:  # noqa: BLE001 - report, don't crash the sweep
            ok, detail = False, repr(exc)[:120]
        if not ok:
            bad.append(name)
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({detail})")
    print(
        f"rotation window: {len(names) - len(bad)}/{len(names)} green "
        f"in {time.time() - t0:.1f}s at {SF}"
        + (f"; FAILING: {bad}" if bad else "")
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
