"""Audit arrow-level column types of every catalog query vs its DuckDB
oracle.

The driver's correctness hash is TYPE-sensitive (round 1: DuckDB
sum(BIGINT) -> HUGEINT/decimal128 vs Spark int64 caused hash_match=false
with identical values).  The local parity suite compares fetchall()
values, which is type-blind.  This script closes that gap: it converts
both result sets to pyarrow and reports any per-column type mismatch so
oracle SQL can be CAST-fixed before the driver runs.

It also flags CANONICALIZER-UNSAFE outputs: the driver sorts the
result rows with pandas ``sort_values`` over every column, and a
list/map/struct-typed cell raises ``unhashable type`` there before any
value comparison happens (round 2's embedding_quantize_int8).  Any
nested arrow type in either engine's output is an error — scalarize
(concat_ws / array_to_string / md5) before returning.

Usage: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from curw_mike_data_handler_spark import catalog, get_spark
from curw_mike_data_handler_spark.sources.tables import TABLES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="type-audit", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    mismatched: list[str] = []
    for name in sorted(catalog.ORACLE):
        try:
            sdf = catalog.QUERIES[name](spark, SF)
            s_tbl = sdf.toArrow()
            d_tbl = con.execute(catalog.ORACLE[name]).arrow()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            mismatched.append(name)
            continue
        s_types = {f.name: f.type for f in s_tbl.schema}
        d_types = {f.name: f.type for f in d_tbl.schema}
        nested = [
            f"{side}.{c}: {t}"
            for side, types in (("spark", s_types), ("duck", d_types))
            for c, t in sorted(types.items())
            if pa.types.is_nested(t)
        ]
        if nested:
            print(f"{name}: CANONICALIZER-UNSAFE nested output {'; '.join(nested)}")
            mismatched.append(name)
            continue
        if set(s_types) != set(d_types):
            print(f"{name}: COLUMN SET spark={sorted(s_types)} duck={sorted(d_types)}")
            mismatched.append(name)
            continue
        diffs = [
            f"{c}: spark={s_types[c]} duck={d_types[c]}"
            for c in sorted(s_types)
            if s_types[c] != d_types[c]
        ]
        if diffs:
            print(f"{name}: {'; '.join(diffs)}")
            mismatched.append(name)
    print(f"\n{len(mismatched)} / {len(catalog.ORACLE)} queries with type diffs")
    spark.stop()


if __name__ == "__main__":
    main()
