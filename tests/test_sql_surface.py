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


def test_schema_evolution_merge_schema_read(spark, tmp_path):
    """A landing zone accumulates files written under EVOLVING schemas
    (a column added in a later generation): mergeSchema=true must read
    the union schema with NULLs for pre-evolution rows, and column
    pruning must still let a query touching only the original columns
    skip the merged one — the 100-TB lake reality where a scan spans
    years of schema generations."""
    gen1, gen2 = str(tmp_path / "z/g1"), str(tmp_path / "z/g2")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(gen1)
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id long, name string, score double"
    ).write.parquet(gen2)

    merged = spark.read.option("mergeSchema", "true").parquet(gen1, gen2)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0), 4: ("d", 40.0)}
    # aggregation over the evolved column treats missing as NULL (skipped)
    assert merged.agg(F.sum("score")).first()[0] == 70.0
    # pruned projection on pre-evolution columns reads only those
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merged.select("id").explain()
    assert "score" not in buf.getvalue().split("ReadSchema: ")[-1]
