"""Merge-on-read deletion vectors (round 11): metadata-only deletes
recorded as (file, row_index) positions in the manifest, applied by
every read path, materialized and cleared by the next rewrite of the
files they cover.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id AS BIGINT) AS ts_k"
    )


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k long")


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 400), root, "t",
        bucket_cols="k", num_buckets=4, sort_cols="ts_k",
        point_filter_cols="v",
    )
    yield root
    mb.drop_catalog_entries(spark, root, "t")


def test_dv_delete_is_metadata_only_and_hides_rows_everywhere(spark, table):
    m0 = mb.read_manifest(table, "t")
    doomed = [3, 77, 200, 399]
    v = mb.delete_manifest_rows_mor(
        spark, _keys(spark, doomed), table, "t", key_cols="k"
    )
    m1 = mb.read_manifest(table, "t")
    # metadata-only: same data directory, same file list, no new files
    assert m1["version"] == v and m1["op"] == "delete_mor"
    assert m1["generation"] == m0["generation"]
    assert m1["files"] == m0["files"]
    assert m1["dv_positions"] == len(doomed)
    # plain read
    got = sorted(r["k"] for r in
                 mb.read_manifest_table(spark, table, "t").collect())
    assert got == sorted(set(range(400)) - set(doomed))
    # pruned read (range covers a doomed key)
    pr = mb.read_manifest_table_pruned(spark, table, "t", lower=70, upper=80)
    assert 77 not in {r["k"] for r in pr.collect()}
    # point read on the Bloom column of a doomed row
    pt = mb.read_manifest_table_point(spark, table, "t", "v", 2 * 77)
    assert pt.filter(F.col("k") == 77).count() == 0
    # time travel: the pre-delete snapshot still shows every row
    old = mb.read_manifest_table(spark, table, "t", version=0)
    assert old.count() == 400


def test_dv_union_and_write_interplay(spark, table):
    """Second vector unions; merge/append/compaction/rebucket never
    resurrect a vectored row, and each rewrite clears exactly the
    vectors of the files it rewrote."""
    mb.delete_manifest_rows_mor(spark, _keys(spark, [10, 11]), table, "t",
                                key_cols="k")
    mb.delete_manifest_rows_mor(spark, _keys(spark, [11, 12]), table, "t",
                                key_cols="k")
    m = mb.read_manifest(table, "t")
    assert m["dv_positions"] == 3  # 11 deduped by position union
    alive = set(range(400)) - {10, 11, 12}

    # COW merge touching SOME buckets: updates replace, deleted rows
    # stay dead; untouched files keep their vectors
    mb.merge_manifest_table(
        spark,
        spark.createDataFrame([(20, -1, 20)], "k long, v long, ts_k long"),
        table, "t", key_cols="k",
    )
    got = {r["k"]: r["v"] for r in
           mb.read_manifest_table(spark, table, "t").collect()}
    assert set(got) == alive and got[20] == -1
    m = mb.read_manifest(table, "t")
    # the rewrite dropped vectors only for rewritten files
    assert m["dv_positions"] <= 3

    # append: carried vectors still apply, batch lands
    mb.append_manifest_table(spark, _mk(spark, 400, 450), table, "t",
                             compact_files_per_bucket=100)
    alive |= set(range(400, 450))
    got = {r["k"] for r in mb.read_manifest_table(spark, table, "t").collect()}
    assert got == alive

    # forced compaction (low threshold): vectors materialize and clear
    mb.append_manifest_table(spark, _mk(spark, 450, 460), table, "t",
                             compact_files_per_bucket=1)
    alive |= set(range(450, 460))
    m = mb.read_manifest(table, "t")
    assert m.get("compacted_from") is not None
    assert m["dv_positions"] == 0 and not m["delete_vectors"]
    got = {r["k"] for r in mb.read_manifest_table(spark, table, "t").collect()}
    assert got == alive

    # new vector, then rebucket: applied and cleared again
    mb.delete_manifest_rows_mor(spark, _keys(spark, [30]), table, "t",
                                key_cols="k")
    mb.rebucket_manifest_table(spark, table, "t", num_buckets=8)
    alive -= {30}
    m = mb.read_manifest(table, "t")
    assert m["dv_positions"] == 0
    got = {r["k"] for r in mb.read_manifest_table(spark, table, "t").collect()}
    assert got == alive


def test_dv_on_shredded_table_routes_through(spark, tmp_path):
    root = str(tmp_path)
    rows = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.to_json(F.struct((F.col("id") * 7).alias("x"))).alias("payload"),
    )
    mb.create_manifest_table(
        spark, rows, root, "sh", bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint"}},
    )
    try:
        mb.delete_manifest_rows_mor(spark, _keys(spark, [5, 6]), root, "sh",
                                    key_cols="k")
        r = mb.read_manifest_table_shredded(
            spark, root, "sh", {"x": "bigint"}, base_cols="k"
        )
        got = {row["k"]: row["x"] for row in r.collect()}
        assert set(got) == set(range(200)) - {5, 6}
        assert got[7] == 49
        # shred-pruned path too
        pr = mb.read_manifest_table_shred_pruned(
            spark, root, "sh", {"x": "bigint"}, prune_field="x",
            lower=0, upper=100, base_cols="k",
        )
        assert 5 not in {row["k"] for row in pr.collect()}
    finally:
        mb.drop_catalog_entries(spark, root, "sh")


def test_dv_free_table_plan_unchanged(spark, table):
    """The read tax is paid ONLY by tables with vectors: a DV-free
    read's plan has no anti-join, no _metadata projection."""
    df = mb.read_manifest_table(spark, table, "t")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "LeftAnti" not in plan and "_dv_pos" not in plan
    mb.delete_manifest_rows_mor(spark, _keys(spark, [1]), table, "t",
                                key_cols="k")
    df2 = mb.read_manifest_table(spark, table, "t")
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        df2.explain()
    plan2 = buf2.getvalue()
    assert "LeftAnti" in plan2 and "BroadcastHashJoin" in plan2


def test_dv_cap_directs_bulk_deletes_to_cow(spark, table):
    with pytest.raises(ValueError, match="copy-on-write"):
        mb.delete_manifest_rows_mor(
            spark, _keys(spark, list(range(100))), table, "t",
            key_cols="k", max_positions=10,
        )
    # nothing half-published
    assert mb.read_manifest(table, "t").get("op") != "delete_mor"
    assert mb.read_manifest_table(spark, table, "t").count() == 400


def test_dv_filter_survives_reserved_looking_user_columns(spark, tmp_path):
    """Advisor regression (r11 low): the DDL rules admit user columns
    named _dv_file / _dv_pos / dv_file / dv_pos, and withColumn
    silently REPLACES an existing column — the anti-join's temp names
    are now derived collision-free from the actual schema, so such a
    table reads correctly while vectors exist."""
    root = str(tmp_path)
    df = spark.range(0, 100).selectExpr(
        "id AS k",
        "CAST(id AS STRING) AS _dv_file",
        "id * 3 AS _dv_pos",
        "CAST(id AS STRING) AS dv_file",
        "id * 5 AS dv_pos",
    )
    mb.create_manifest_table(
        spark, df, root, "clash", bucket_cols="k", num_buckets=2,
    )
    try:
        mb.delete_manifest_rows_mor(
            spark, _keys(spark, [3, 7]), root, "clash", key_cols="k"
        )
        got = mb.read_manifest_table(spark, root, "clash")
        assert set(got.columns) == {"k", "_dv_file", "_dv_pos",
                                    "dv_file", "dv_pos"}
        rows = {r["k"]: (r["_dv_file"], r["_dv_pos"], r["dv_file"],
                         r["dv_pos"]) for r in got.collect()}
        assert len(rows) == 98 and 3 not in rows and 7 not in rows
        assert rows[10] == ("10", 30, "10", 50)
    finally:
        mb.drop_catalog_entries(spark, root, "clash")
