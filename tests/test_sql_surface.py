"""SQL-surface tests: every table registers as a view and plain Spark
SQL text produces the same results as the DataFrame catalog — the
engine's query language is Spark SQL, not a bespoke DSL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from curw_mike_data_handler_spark import catalog
from curw_mike_data_handler_spark.sources.tables import register_views

SF = "/root/testdata/sf0.01"


def test_sql_text_matches_dataframe_catalog(spark):
    register_views(spark, SF)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = catalog.QUERIES["q1_pricing_summary"](spark, SF).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    got = {tuple(r) for r in sql_df.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want


def test_multi_path_union_read(spark, tmp_path):
    """SURVEY §2.7: the reference loops per-run output dirs; here one
    multi-path read (or unionByName) covers N run directories."""
    d1, d2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    spark.range(0, 5).selectExpr("id", "id * 1.5 AS v").write.parquet(d1)
    spark.range(5, 9).selectExpr("id", "id * 1.5 AS v").write.parquet(d2)

    multi = spark.read.parquet(d1, d2)
    assert multi.count() == 9
    a, b = spark.read.parquet(d1), spark.read.parquet(d2)
    assert a.unionByName(b).count() == 9
    assert multi.agg(F.sum("id")).first()[0] == sum(range(9))
