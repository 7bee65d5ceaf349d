"""Differential tests mirroring the driver's t2 gate: every catalog
query runs in Spark AND its oracle SQL runs in DuckDB on the same
parquet tables; sorted value sets must match exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from curw_mike_data_handler_spark import catalog
from curw_mike_data_handler_spark.sources.tables import TABLES

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(catalog.ORACLE.keys()))
def test_query_matches_oracle(spark, name):
    q = catalog.QUERIES[name]
    sdf = q(spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(SF)
    res = con.execute(catalog.ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_norm = normalize(spark_rows, spark_cols)
    d_norm = normalize(duck_rows, duck_cols)
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs {len(d_norm)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_every_query_has_entry():
    assert set(catalog.ORACLE).issubset(set(catalog.QUERIES))
    assert len(catalog.QUERIES) >= 20
