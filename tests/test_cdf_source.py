"""Structured Streaming over the manifest change feed (round 12):
per-version offsets, executor-side pyarrow partitions bounded by each
commit's rewritten region, checkpoint-restart exactly-once, and
multiset equivalence with the batch ``read_manifest_changes`` feed.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb
from curw_mike_data_handler_spark.streaming.cdf_source import (
    CDFPartition,
    ManifestCDFDataSource,
    ManifestCDFStreamReader,
)


def _mk(spark, lo, hi, v_mult=2):
    return spark.range(lo, hi).selectExpr(f"id AS k", f"id * {v_mult} AS v")


def _stream_all(spark, root, table, out, ck, starting=0):
    spark.dataSource.register(ManifestCDFDataSource)
    stream = (
        spark.readStream.format("manifest_cdf")
        .option("root", root).option("table", table)
        .option("startingVersion", starting)
        .load()
    )
    (
        stream.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start().awaitTermination()
    )
    return spark.read.parquet(out)


def _multiset(df):
    return Counter(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    )


def test_stream_equals_batch_feed_and_restart_is_exactly_once(
    spark, tmp_path
):
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    mb.create_manifest_table(spark, _mk(spark, 0, 100), root, "t",
                             bucket_cols="k", num_buckets=2)
    try:
        mb.append_manifest_table(spark, _mk(spark, 100, 120), root, "t",
                                 compact_files_per_bucket=100)
        mb.merge_manifest_table(
            spark, spark.range(0, 5).selectExpr("id AS k", "-id AS v"),
            root, "t", key_cols="k",
        )
        mb.delete_manifest_rows_mor(
            spark, spark.createDataFrame([(7,), (8,)], "k long"),
            root, "t", key_cols="k",
        )
        mb.merge_manifest_table_mor(
            spark, spark.range(10, 12).selectExpr("id AS k", "-99 AS v"),
            root, "t", key_cols="k", compact_files_per_bucket=100,
        )
        got = _stream_all(spark, root, "t", out, ck)
        want = mb.read_manifest_changes(spark, root, "t", from_version=0)
        assert _multiset(got) == _multiset(want)
        # checkpoint restart: new commits, SAME checkpoint — exactly
        # the new rows arrive, nothing skipped, nothing re-read
        mb.append_manifest_table(spark, _mk(spark, 200, 210), root, "t",
                                 compact_files_per_bucket=100)
        mb.delete_manifest_rows(
            spark, spark.createDataFrame([(200,)], "k long"),
            root, "t", key_cols="k",
        )
        got2 = _stream_all(spark, root, "t", out, ck)
        want2 = mb.read_manifest_changes(spark, root, "t", from_version=0)
        assert _multiset(got2) == _multiset(want2)
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_partition_plan_is_bounded_by_rewritten_region(spark, tmp_path):
    """The plan-shape guard: each commit's partitions mirror the
    feed's cost contract — appends plan per new FILE, vector growth
    per touched FILE, COW rewrites per touched BUCKET, and
    content-preserving compaction plans NOTHING."""
    root = str(tmp_path)
    mb.create_manifest_table(spark, _mk(spark, 0, 200), root, "t",
                             bucket_cols="k", num_buckets=4)
    try:
        mb.append_manifest_table(spark, _mk(spark, 200, 220), root, "t",
                                 compact_files_per_bucket=100)      # v1
        mb.merge_manifest_table(
            spark, spark.range(0, 3).selectExpr("id AS k", "-1 AS v"),
            root, "t", key_cols="k",
        )                                                            # v2
        mb.delete_manifest_rows_mor(
            spark, spark.createDataFrame([(5,), (6,)], "k long"),
            root, "t", key_cols="k",
        )                                                            # v3
        mb.merge_manifest_table_mor(
            spark, spark.range(7, 9).selectExpr("id AS k", "-2 AS v"),
            root, "t", key_cols="k", compact_files_per_bucket=100,
        )                                                            # v4
        mb.rebucket_manifest_table(spark, root, "t", num_buckets=8)  # v5
        reader = ManifestCDFStreamReader(
            {"root": root, "table": "t", "startingVersion": 0}
        )
        by_commit: dict[int, list[CDFPartition]] = {}
        for p in reader.partitions({"version": 0}, {"version": 5}):
            by_commit.setdefault(p.commit_version, []).append(p)
        m1 = mb.read_manifest(root, "t", 1)
        m0 = mb.read_manifest(root, "t", 0)
        new_v1 = set(m1["files"]) - set(m0["files"])
        assert [p.kind for p in by_commit[1]] == ["insert"] * len(new_v1)
        # v2: COW merge of 3 keys → diff partitions, one per touched
        # bucket, never more than the key count
        assert {p.kind for p in by_commit[2]} == {"diff"}
        assert len(by_commit[2]) <= 3
        # v3: vector growth only → dv partitions (per touched file)
        assert {p.kind for p in by_commit[3]} == {"dv"}
        # v4: MoR upsert = dv deletes + delta-file inserts
        assert {p.kind for p in by_commit[4]} == {"dv", "insert"}
        # v5: rebucket is content-preserving → plans nothing
        assert 5 not in by_commit
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_starting_version_defaults_to_head(spark, tmp_path):
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    mb.create_manifest_table(spark, _mk(spark, 0, 50), root, "t",
                             bucket_cols="k", num_buckets=2)
    try:
        spark.dataSource.register(ManifestCDFDataSource)
        stream = (
            spark.readStream.format("manifest_cdf")
            .option("root", root).option("table", "t")
            .load()  # no startingVersion: only NEW commits flow
        )

        def run():
            (
                stream.writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start().awaitTermination()
            )

        # first start pins the checkpoint at the CURRENT head — the
        # pre-existing snapshot does not replay
        run()
        mb.append_manifest_table(spark, _mk(spark, 50, 60), root, "t",
                                 compact_files_per_bucket=100)
        run()
        got = spark.read.parquet(out)
        assert _multiset(got) == Counter(
            (k, k * 2, "insert", 1) for k in range(50, 60)
        )
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_map_columns_refused_and_evolve_commit_plans_nothing(
    spark, tmp_path
):
    root = str(tmp_path)
    df = spark.range(0, 40).selectExpr(
        "id AS k",
        "to_json(named_struct('a', id)) AS payload",
    )
    mb.create_manifest_table(spark, df, root, "sh", bucket_cols="k",
                             num_buckets=2)
    try:
        reader = ManifestCDFStreamReader(
            {"root": root, "table": "sh", "startingVersion": 0}
        )
        # an evolve_shred commit is metadata-only: the window spanning
        # it plans ONLY the v0 snapshot's insert partitions, nothing
        # for v1 (round 12: evolution no longer forces a restart)
        mb.evolve_shred(spark, root, "sh", add={"a": "bigint"},
                        column="payload")
        parts = reader.partitions({"version": 0}, {"version": 1})
        assert {p.commit_version for p in parts} == {1}
        assert all(not p.new_files and not p.old_files for p in parts)
        # a map-typed column is refused at construction
        mp = spark.range(0, 10).selectExpr(
            "id AS k", "map('a', id) AS m"
        )
        mb.create_manifest_table(spark, mp, root, "mp", bucket_cols="k",
                                 num_buckets=2)
        with pytest.raises(NotImplementedError, match="map"):
            ManifestCDFStreamReader({"root": root, "table": "mp"})
    finally:
        mb.drop_catalog_entries(spark, root, "sh")
        mb.drop_catalog_entries(spark, root, "mp")


def _shred_tbl(spark, root, n=40):
    df = spark.range(0, n).selectExpr(
        "id AS k",
        "to_json(named_struct('a', id)) AS payload",
    )
    mb.create_manifest_table(spark, df, root, "t", bucket_cols="k",
                             num_buckets=2)


def test_pre_evolution_files_null_pad_instead_of_crash(spark, tmp_path):
    """Round-12 regression: files predating an evolve_shred physically
    lack the added ``_shred_*`` column even inside schema-STABLE
    windows (lazy materialization).  A DV delete or COW diff touching
    such a file previously crashed the executor with ArrowInvalid
    (pq.read_table on a missing column); it must NULL-pad, matching
    the batch feed's spark.read.schema semantics."""
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _shred_tbl(spark, root)                                          # v0
    try:
        mb.evolve_shred(spark, root, "t", add={"a": "bigint"},
                        column="payload")                            # v1
        mb.delete_manifest_rows_mor(
            spark, spark.createDataFrame([(3,), (4,)], "k long"),
            root, "t", key_cols="k",
        )                                                            # v2
        mb.merge_manifest_table(
            spark,
            spark.range(5, 6).selectExpr(
                "id AS k", "to_json(named_struct('a', id * 10)) AS payload"
            ),
            root, "t", key_cols="k",
        )                                                            # v3
        spark.dataSource.register(ManifestCDFDataSource)
        stream = (
            spark.readStream.format("manifest_cdf")
            .option("root", root).option("table", "t")
            .option("startingVersion", 1)
            .load()
        )
        (
            stream.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start().awaitTermination()
        )
        got = spark.read.parquet(out)
        want = mb.read_manifest_changes(spark, root, "t", from_version=1)

        def ms(df_):
            return Counter(
                (r["k"], r["payload"], r["_shred_payload_a"],
                 r["_change_type"], r["_commit_version"])
                for r in df_.collect()
            )

        assert ms(got) == ms(want)
        # the v2 deletes came off pre-evolve files: shred value NULL
        dels = [r for r in got.collect() if r["_commit_version"] == 2]
        assert dels and all(r["_shred_payload_a"] is None for r in dels)
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_stream_spans_evolution_without_restart(spark, tmp_path):
    """A reader constructed at the PRE-evolve schema keeps planning
    and reading across an evolve + post-evolve commits: newer commits
    diff on their own (wider) schema and project the extra column
    away; the multiset equals the batch feed projected onto the
    stream's pinned columns."""
    root = str(tmp_path)
    _shred_tbl(spark, root)                                          # v0
    try:
        reader = ManifestCDFStreamReader(
            {"root": root, "table": "t", "startingVersion": 0}
        )
        assert reader.columns == ("k", "payload")
        mb.evolve_shred(spark, root, "t", add={"a": "bigint"},
                        column="payload")                            # v1
        mb.append_manifest_table(
            spark,
            spark.range(100, 110).selectExpr(
                "id AS k", "to_json(named_struct('a', id)) AS payload"
            ),
            root, "t", compact_files_per_bucket=100,
        )                                                            # v2
        mb.merge_manifest_table(
            spark,
            spark.range(7, 8).selectExpr(
                "id AS k", "to_json(named_struct('a', -7)) AS payload"
            ),
            root, "t", key_cols="k",
        )                                                            # v3
        head = mb.current_version(root, "t")
        rows = []
        for p in reader.partitions({"version": 0}, {"version": head}):
            for batch in reader.read(p):
                rows.extend(batch.to_pylist())
        got = Counter(
            (r["k"], r["payload"], r["_change_type"],
             r["_commit_version"])
            for r in rows
        )
        want = Counter(
            (r["k"], r["payload"], r["_change_type"],
             r["_commit_version"])
            for r in mb.read_manifest_changes(
                spark, root, "t", from_version=0
            ).collect()
        )
        assert got == want
        assert {cv for (_, _, _, cv) in got} >= {2, 3}
        # a nested-typed column added mid-stream fails at PLANNING
        # (with the batch-feed hint), not as an executor TypeError
        mb.evolve_shred(spark, root, "t",
                        add={"m": "map<string, bigint>"})            # v4
        mb.merge_manifest_table(
            spark,
            spark.range(9, 10).selectExpr(
                "id AS k", "to_json(named_struct('a', -9)) AS payload"
            ),
            root, "t", key_cols="k",
        )                                                            # v5
        with pytest.raises(NotImplementedError, match="map"):
            reader.partitions({"version": head},
                              {"version": mb.current_version(root, "t")})
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_nan_rows_do_not_emit_spurious_changes(spark, tmp_path):
    """Review regression (r12): NaN != NaN and hash(nan) is
    identity-based since py3.10, so the bucket-local diff must
    canonicalize NaN keys — an UNCHANGED NaN row inside a rewritten
    bucket previously emitted a spurious delete+insert pair, diverging
    from the batch feed's eqNullSafe semantics."""
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.range(0, 40).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN CAST('NaN' AS DOUBLE) "
        "ELSE CAST(id AS DOUBLE) END AS v",
    )
    mb.create_manifest_table(spark, df, root, "t", bucket_cols="k",
                             num_buckets=2)
    try:
        # COW merge of ONE key: its bucket rewrites, carrying many
        # unchanged NaN rows through the diff
        mb.merge_manifest_table(
            spark,
            spark.createDataFrame([(1, 7.0)], "k long, v double"),
            root, "t", key_cols="k",
        )
        got = _stream_all(spark, root, "t", out, ck)
        want = mb.read_manifest_changes(spark, root, "t", from_version=0)

        def reprset(df_):
            return Counter(
                (r["k"], repr(r["v"]), r["_change_type"],
                 r["_commit_version"])
                for r in df_.collect()
            )

        assert reprset(got) == reprset(want)
        # and the change set is exactly the merged key, nothing else
        assert {r[0] for r in reprset(got)} == {1}
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_restart_after_evolve_surfaces_new_columns_exactly_once(
    spark, tmp_path
):
    """The documented restart path (r12): a stream runs at the
    pre-evolve schema, the table evolves, and a RESTART from the same
    checkpoint reconstructs the source at the NEW head schema — the
    later commits arrive with the added column populated, nothing is
    skipped or double-read across the schema change."""
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _shred_tbl(spark, root)                                          # v0
    try:
        spark.dataSource.register(ManifestCDFDataSource)

        def run():
            stream = (
                spark.readStream.format("manifest_cdf")
                .option("root", root).option("table", "t")
                .option("startingVersion", 0)
                .load()
            )
            (
                stream.writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start().awaitTermination()
            )

        run()  # pins the checkpoint at v0 (offsets are EXCLUSIVE of
        # startingVersion: the pre-existing snapshot does not replay)
        mb.evolve_shred(spark, root, "t", add={"a": "bigint"},
                        column="payload")                            # v1
        mb.append_manifest_table(
            spark,
            spark.range(100, 105).selectExpr(
                "id AS k", "to_json(named_struct('a', id)) AS payload"
            ),
            root, "t", compact_files_per_bucket=100,
        )                                                            # v2
        run()  # restart: new source schema includes _shred_payload_a
        got = spark.read.option("mergeSchema", "true").parquet(out)
        ms = Counter(
            (r["k"], r["_change_type"], r["_commit_version"])
            for r in got.collect()
        )
        want = Counter((k, "insert", 2) for k in range(100, 105))
        assert ms == want
        # rows from the post-evolve run carry the shredded value; the
        # pre-evolve run's files simply lack the column (NULL via
        # mergeSchema)
        post = {r["k"]: r["_shred_payload_a"] for r in got.collect()
                if r["_commit_version"] == 2}
        assert post == {k: k for k in range(100, 105)}
    finally:
        mb.drop_catalog_entries(spark, root, "t")


def test_array_and_struct_columns_refused_loudly(spark, tmp_path):
    """Review regression (r12): array/struct values are unhashable in
    the bucket-local diff — the constructor must refuse them like
    maps, not crash with a bare TypeError in an executor."""
    root = str(tmp_path)
    df = spark.range(0, 10).selectExpr("id AS k", "array(id, id) AS a")
    mb.create_manifest_table(spark, df, root, "arr", bucket_cols="k",
                             num_buckets=2)
    try:
        with pytest.raises(NotImplementedError, match="array"):
            ManifestCDFStreamReader({"root": root, "table": "arr"})
    finally:
        mb.drop_catalog_entries(spark, root, "arr")
