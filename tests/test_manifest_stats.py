"""Manifest-table statistics for the optimizer (r10 verdict #2):
row counts and uncompressed sizes recorded at publish from parquet
footers (metadata-only), NDV bounds from the Bloom build's exact
per-file distinct counts, and the stats-hinted read whose join
strategy flips when manifest truth contradicts Spark's file-size
guess.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_parse_bytes_conf():
    assert mb._parse_bytes_conf("10485760") == 10 << 20
    assert mb._parse_bytes_conf("10485760b") == 10 << 20
    assert mb._parse_bytes_conf("10m") == 10 << 20
    assert mb._parse_bytes_conf("10MB") == 10 << 20
    assert mb._parse_bytes_conf("1g") == 1 << 30
    assert mb._parse_bytes_conf("512k") == 512 << 10
    assert mb._parse_bytes_conf("-1") == -1
    with pytest.raises(ValueError):
        mb._parse_bytes_conf("ten megabytes")


def test_size_stats_recorded_and_carried(spark, tmp_path):
    """Every publish records per-file [rows, disk, uncompressed] and
    the rollup; hard-linked files inherit their entries (same inode,
    same footer) so an append re-reads no existing footer content."""
    root = str(tmp_path)
    df = spark.range(0, 5000).selectExpr("id AS k", "id * 3 AS v")
    mb.create_manifest_table(
        spark, df, root, "sz", bucket_cols="k", num_buckets=4,
    )
    try:
        mb.append_manifest_table(
            spark, spark.range(5000, 6000).selectExpr("id AS k", "id*3 AS v"),
            root, "sz", compact_files_per_bucket=100,
        )
        m0 = mb.read_manifest(root, "sz", version=0)
        m1 = mb.read_manifest(root, "sz")
        for m, rows in ((m0, 5000), (m1, 6000)):
            assert set(m["size_stats"]) == set(m["files"])
            r = m["size_rollup"]
            assert r["row_count"] == rows
            assert r["total_bytes"] > 0
            # decompressed is never smaller than what's on disk here
            assert r["uncompressed_bytes"] >= r["total_bytes"]
            assert r["in_memory_est"] >= r["uncompressed_bytes"]
        # carried by value across the hard link
        for f in m0["files"]:
            assert m1["size_stats"][f] == m0["size_stats"][f]
        # and the real row count agrees
        assert mb.read_manifest_table(spark, root, "sz").count() == 6000
    finally:
        mb.drop_catalog_entries(spark, root, "sz")


def test_stats_hint_flips_wrong_broadcast_to_sort_merge(spark, tmp_path):
    """THE flip the stats exist for: a dictionary-compressible table
    whose on-disk size sits UNDER the broadcast threshold while its
    decompressed size sits far above it.  Spark's file-size estimate
    broadcasts it (the OOM-at-scale plan); the stats-hinted read sees
    manifest truth and forces the sort-merge join."""
    root = str(tmp_path)
    # long constant strings: RLE/dictionary crushes them on disk
    fluffy = spark.range(0, 120_000).selectExpr(
        "id AS k", "repeat('x', 200) AS pad"
    )
    other = spark.range(0, 120_000).selectExpr("id AS k", "id AS w")
    mb.create_manifest_table(
        spark, fluffy, root, "fluffy", bucket_cols="k", num_buckets=2,
    )
    mb.create_manifest_table(
        spark, other, root, "other", bucket_cols="k", num_buckets=2,
    )
    try:
        m = mb.read_manifest(root, "fluffy")
        rollup = m["size_rollup"]
        thr_old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # pin the threshold BETWEEN disk and in-memory estimate — the
        # disagreement window the hint exists for
        assert rollup["total_bytes"] * 4 < rollup["in_memory_est"], (
            "test premise: the pad column must compress far better "
            "than 4x", rollup)
        thr = (rollup["total_bytes"] + rollup["in_memory_est"]) // 2
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
        try:
            big = mb.read_manifest_table(spark, root, "other")
            naive = big.join(
                mb.read_manifest_table(spark, root, "fluffy"), "k"
            )
            assert "BroadcastHashJoin" in _plan_of(naive), (
                "test premise: the file-size guess must pick broadcast"
            )
            hinted = big.join(
                mb.read_manifest_table_stats_hinted(spark, root, "fluffy"),
                "k",
            )
            plan = _plan_of(hinted)
            assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
            # same answer either way (hints change strategy, not rows)
            assert hinted.count() == naive.count() == 120_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr_old)
    finally:
        mb.drop_catalog_entries(spark, root, "fluffy")
        mb.drop_catalog_entries(spark, root, "other")


def test_stats_hint_broadcasts_truly_small_table_and_respects_disable(
    spark, tmp_path
):
    root = str(tmp_path)
    dim = spark.range(0, 50).selectExpr("id AS k", "id AS w")
    fact = spark.range(0, 50_000).selectExpr("id % 50 AS k", "id AS v")
    mb.create_manifest_table(spark, dim, root, "dim",
                             bucket_cols="k", num_buckets=2)
    mb.create_manifest_table(spark, fact, root, "fact",
                             bucket_cols="k", num_buckets=2)
    try:
        hinted = mb.read_manifest_table(spark, root, "fact").join(
            mb.read_manifest_table_stats_hinted(spark, root, "dim"), "k"
        )
        assert "BroadcastHashJoin" in _plan_of(hinted)
        # user disabled broadcasting: the hint must not resurrect it
        thr_old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            off = mb.read_manifest_table(spark, root, "fact").join(
                mb.read_manifest_table_stats_hinted(spark, root, "dim"), "k"
            )
            assert "BroadcastHashJoin" not in _plan_of(off)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr_old)
    finally:
        mb.drop_catalog_entries(spark, root, "dim")
        mb.drop_catalog_entries(spark, root, "fact")


def test_missing_stats_degrade_to_plain_read(spark, tmp_path):
    """Older manifests (or failed footer reads) have no rollup — the
    stats-hinted read must fall back to the un-hinted plan, never
    guess."""
    import json
    import os

    root = str(tmp_path)
    df = spark.range(0, 100).selectExpr("id AS k", "id AS v")
    mb.create_manifest_table(spark, df, root, "old",
                             bucket_cols="k", num_buckets=2)
    try:
        # simulate an older manifest: strip the stats in place
        path = mb._manifest_path(root, "old", 0)
        with open(path) as fh:
            m = json.load(fh)
        m.pop("size_rollup", None)
        m.pop("size_stats", None)
        with open(path, "w") as fh:
            json.dump(m, fh)
        out = mb.read_manifest_table_stats_hinted(spark, root, "old")
        assert out.count() == 100
        # no hint node in the analyzed plan
        assert "UnresolvedHint" not in out._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()
    finally:
        mb.drop_catalog_entries(spark, root, "old")


def test_column_ndv_bounds_bracket_truth(spark, tmp_path):
    """NDV bounds from the Bloom build's exact per-file distinct
    counts: lower = max single file, upper = min(sum, row count) —
    hard bounds, and the true distinct count sits inside them."""
    root = str(tmp_path)
    df = spark.range(0, 9000).selectExpr(
        "id AS k", "CAST(id % 700 AS BIGINT) AS sec"
    )
    mb.create_manifest_table(
        spark, df.filter("k < 6000"), root, "nd",
        bucket_cols="k", num_buckets=4, point_filter_cols="sec",
    )
    try:
        mb.append_manifest_table(spark, df.filter("k >= 6000"), root, "nd")
        m = mb.read_manifest(root, "nd")
        bounds = mb.column_ndv_bounds(m, "sec")
        assert bounds is not None
        lo, hi = bounds
        truth = 700
        assert lo <= truth <= hi, (lo, truth, hi)
        assert lo >= 1 and hi <= m["size_rollup"]["row_count"]
        # un-filtered column: no evidence, no bounds
        assert mb.column_ndv_bounds(m, "k") is None
    finally:
        mb.drop_catalog_entries(spark, root, "nd")


def test_ndv_bounds_unavailable_while_vectors_pending(spark, tmp_path):
    """Review regression: a MoR delete can erase a value's last
    occurrence without touching the recorded per-file distinct counts,
    so the 'hard lower bound' would be a lie — bounds must report
    unavailable while vectors are pending and return after the rewrite
    that clears them."""
    root = str(tmp_path)
    df = spark.range(0, 2000).selectExpr(
        "id AS k", "CAST(id % 100 AS BIGINT) AS sec"
    )
    mb.create_manifest_table(
        spark, df, root, "nv", bucket_cols="k", num_buckets=2,
        point_filter_cols="sec",
    )
    try:
        assert mb.column_ndv_bounds(mb.read_manifest(root, "nv"), "sec")
        mb.delete_manifest_rows_mor(
            spark, spark.createDataFrame([(5,)], "k long"), root, "nv",
            key_cols="k",
        )
        assert mb.column_ndv_bounds(
            mb.read_manifest(root, "nv"), "sec"
        ) is None
        # the rewrite clears the vectors and restores the bounds
        mb.rebucket_manifest_table(spark, root, "nv", num_buckets=4)
        bounds = mb.column_ndv_bounds(mb.read_manifest(root, "nv"), "sec")
        assert bounds is not None and bounds[0] <= 100 <= bounds[1]
    finally:
        mb.drop_catalog_entries(spark, root, "nv")


def test_size_stats_degrade_on_corrupt_footer(tmp_path):
    """Review regression: pyarrow raises ArrowInvalid (a ValueError,
    not OSError) for a corrupt footer — the publish-time stats must
    degrade to no-entry, never abort the publish."""
    bad = tmp_path / "part-00000-bad_00000.c000.snappy.parquet"
    bad.write_bytes(b"this is not parquet")
    out = mb._size_stats(str(tmp_path), [bad.name])
    assert out == {}
    out2 = mb._shred_file_stats(
        str(tmp_path), [bad.name],
        {"column": "p", "fields": {"x": "bigint"}},
    )
    assert out2 == {}


def test_merge_hint_tradeoff_escape_hatch_broadcasts_other_side(
    spark, tmp_path
):
    """Advisor note (r11 low), documented tradeoff verified: the merge
    hint on a deceptive-compression table also suppresses size-based
    broadcast of the OTHER join side — and the documented escape hatch
    (an explicit broadcast hint on the genuinely tiny side) takes
    precedence over the merge hint, restoring the broadcast plan."""
    root = str(tmp_path)
    fluffy = spark.range(0, 120_000).selectExpr(
        "id AS k", "repeat('x', 200) AS pad"
    )
    tiny = spark.range(0, 40).selectExpr("id AS k", "id AS w")
    mb.create_manifest_table(
        spark, fluffy, root, "fluffy", bucket_cols="k", num_buckets=2,
    )
    mb.create_manifest_table(
        spark, tiny, root, "tiny", bucket_cols="k", num_buckets=2,
    )
    try:
        rollup = mb.read_manifest(root, "fluffy")["size_rollup"]
        thr_old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        thr = (rollup["total_bytes"] + rollup["in_memory_est"]) // 2
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
        try:
            hinted = mb.read_manifest_table_stats_hinted(
                spark, root, "fluffy"
            )
            # the tradeoff: the merge hint rules the whole join, so the
            # tiny side's legitimate size-based broadcast is suppressed
            suppressed = hinted.join(
                mb.read_manifest_table(spark, root, "tiny"), "k"
            )
            assert "SortMergeJoin" in _plan_of(suppressed)
            # the escape hatch: an explicit broadcast hint on the tiny
            # side beats this side's merge hint
            restored = hinted.join(
                mb.read_manifest_table(spark, root, "tiny")
                .hint("broadcast"),
                "k",
            )
            plan = _plan_of(restored)
            assert "BroadcastHashJoin" in plan
            assert restored.count() == 40
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr_old)
    finally:
        mb.drop_catalog_entries(spark, root, "fluffy")
        mb.drop_catalog_entries(spark, root, "tiny")
