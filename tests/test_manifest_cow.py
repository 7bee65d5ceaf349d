"""Row-level MERGE / DELETE on manifest tables (round 10): copy-on-
write rewrites with exact bucket pruning, stats-pruned range deletes,
snapshot isolation across rewrites, and shred interplay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb

N_BUCKETS = 4


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id AS BIGINT) AS ts_k"
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 400), root, "t",
        bucket_cols="k", num_buckets=N_BUCKETS, sort_cols="ts_k",
    )
    yield root
    mb.drop_catalog_entries(spark, root, "t")


def test_merge_updates_inserts_and_prunes_buckets(spark, table):
    """An upsert whose keys hash to ONE bucket rewrites only that
    bucket's file; every other file hard-links by NAME into the new
    generation — the rewrite ratio is recorded in the manifest."""
    m0 = mb.read_manifest(table, "t")
    # pick keys that all land in one bucket
    all_keys = list(range(0, 400))
    bucket_of = {
        r["k"]: r["b"]
        for r in spark.range(0, 500).selectExpr("id AS k").select(
            "k", mb.spark_bucket_id(N_BUCKETS, "k").alias("b")
        ).collect()
    }
    target_bucket = bucket_of[7]
    upd_keys = [k for k in all_keys if bucket_of[k] == target_bucket][:10]
    new_key = next(k for k in range(400, 500) if bucket_of[k] == target_bucket)
    updates = spark.createDataFrame(
        [(k, k * 2 + 1, k) for k in upd_keys] + [(new_key, -5, new_key)],
        "k long, v long, ts_k long",
    )
    v = mb.merge_manifest_table(spark, updates, table, "t", key_cols="k")
    m1 = mb.read_manifest(table, "t")
    assert m1["version"] == v and m1["op"] == "merge"
    touched0 = [f for f in m0["files"] if mb._file_bucket(f) == target_bucket]
    assert m1["rewritten_files"] == len(touched0)
    assert m1["linked_files"] == len(m0["files"]) - len(touched0)
    # untouched files carried by NAME (hard links, zero copy)
    untouched0 = set(m0["files"]) - set(touched0)
    assert untouched0 <= set(m1["files"])
    # values: updated rows replaced, new key inserted, others intact
    r = mb.read_manifest_table(spark, table, "t")
    assert r.count() == 401
    got = {row["k"]: row["v"] for row in r.collect()}
    for k in upd_keys:
        assert got[k] == k * 2 + 1
    assert got[new_key] == -5
    assert got[11] == 22  # an untouched row


def test_merge_snapshot_isolation(spark, table):
    """A reader pinned to the pre-merge version keeps the OLD values
    (immutable generations + hard links)."""
    v0 = mb.current_version(table, "t")
    updates = spark.createDataFrame([(3, 999, 3)], "k long, v long, ts_k long")
    mb.merge_manifest_table(spark, updates, table, "t", key_cols="k")
    old = mb.read_manifest_table(spark, table, "t", version=v0)
    assert old.filter(F.col("k") == 3).first()["v"] == 6
    new = mb.read_manifest_table(spark, table, "t")
    assert new.filter(F.col("k") == 3).first()["v"] == 999


def test_delete_rows_by_key(spark, table):
    doomed = spark.createDataFrame([(5,), (17,), (399,)], "k long")
    v = mb.delete_manifest_rows(spark, doomed, table, "t", key_cols="k")
    m = mb.read_manifest(table, "t")
    assert m["version"] == v and m["op"] == "delete"
    r = mb.read_manifest_table(spark, table, "t")
    assert r.count() == 397
    assert r.filter(F.col("k").isin(5, 17, 399)).count() == 0
    # only the doomed keys' buckets rewrote
    buckets = {
        row["b"] for row in doomed.select(
            mb.spark_bucket_id(N_BUCKETS, "k").alias("b")
        ).distinct().collect()
    }
    assert m["rewritten_files"] <= len(buckets) * 2


def test_delete_range_uses_file_stats(spark, tmp_path):
    """Range delete on the sort column: appends with disjoint ts
    ranges give per-file stats; a range confined to one append's span
    rewrites only that append's files."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 100), root, "rt",
        bucket_cols="k", num_buckets=2, sort_cols="ts_k",
    )
    try:
        mb.append_manifest_table(spark, _mk(spark, 100, 200), root, "rt")
        mb.append_manifest_table(spark, _mk(spark, 200, 300), root, "rt")
        m0 = mb.read_manifest(root, "rt")
        expect_touched = mb.pruned_files(m0, lower=120, upper=180)
        v = mb.delete_manifest_range(spark, root, "rt", lower=120, upper=180)
        m1 = mb.read_manifest(root, "rt")
        assert m1["version"] == v and m1["op"] == "delete_range"
        assert m1["rewritten_files"] == len(expect_touched)
        assert m1["linked_files"] == len(m0["files"]) - len(expect_touched)
        r = mb.read_manifest_table(spark, root, "rt")
        assert r.count() == 300 - 61
        assert r.filter(F.col("ts_k").between(120, 180)).count() == 0
        # untouched spans intact
        assert r.filter(F.col("ts_k") < 120).count() == 120
    finally:
        mb.drop_catalog_entries(spark, root, "rt")


def test_merge_guards(spark, table):
    dup = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 1)], "k long, v long, ts_k long"
    )
    with pytest.raises(ValueError, match="duplicate or NULL keys"):
        mb.merge_manifest_table(spark, dup, table, "t", key_cols="k")
    # NULL keys never equi-join — they would insert beside the old row
    # instead of replacing it (review finding)
    nullk = spark.createDataFrame(
        [(None, 1, 1)], "k long, v long, ts_k long"
    )
    with pytest.raises(ValueError, match="duplicate or NULL keys"):
        mb.merge_manifest_table(spark, nullk, table, "t", key_cols="k")
    one = spark.createDataFrame([(1, 1, 1)], "k long, v long, ts_k long")
    with pytest.raises(ValueError, match="must contain the bucket columns"):
        mb.merge_manifest_table(spark, one, table, "t", key_cols="v")
    with pytest.raises(ValueError, match="range delete needs a sort column"):
        root2 = str(table) + "_nosort"
        import os
        os.makedirs(root2, exist_ok=True)
        mb.create_manifest_table(
            spark, one, root2, "ns", bucket_cols="k", num_buckets=2
        )
        mb.delete_manifest_range(spark, root2, "ns", lower=0, upper=1)


def test_merge_on_shredded_table_lands_shredded(spark, tmp_path):
    """Logical-shape updates to a shredded table materialize the shred
    columns during the rewrite (same rules as append); coverage and
    routed reads stay intact."""
    root = str(tmp_path)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.to_json(F.struct((F.col("id") * 3).alias("x"))).alias("payload"),
    )
    mb.create_manifest_table(
        spark, df, root, "sh", bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint"}},
    )
    try:
        updates = spark.range(50, 60).select(
            F.col("id").alias("k"),
            F.to_json(F.struct(F.lit(-1).alias("x"))).alias("payload"),
        )
        mb.merge_manifest_table(spark, updates, root, "sh", key_cols="k")
        m = mb.read_manifest(root, "sh")
        assert mb.covered_fields(m) == {"x"}
        r = mb.read_manifest_table_shredded(spark, root, "sh", {"x": "bigint"},
                                            base_cols="k")
        got = {row["k"]: row["x"] for row in r.collect()}
        assert all(got[k] == -1 for k in range(50, 60))
        assert got[10] == 30
    finally:
        mb.drop_catalog_entries(spark, root, "sh")


def test_merge_then_append_then_compact_chain(spark, table):
    """The write paths compose: merge → append → compaction keeps one
    consistent lineage and exact content."""
    updates = spark.createDataFrame(
        [(0, -1, 0), (777, -2, 777)], "k long, v long, ts_k long"
    )
    mb.merge_manifest_table(spark, updates, table, "t", key_cols="k")
    for i in range(2):
        mb.append_manifest_table(
            spark, _mk(spark, 1000 + 100 * i, 1100 + 100 * i), table, "t",
            compact_files_per_bucket=3,
        )
    r = mb.read_manifest_table(spark, table, "t")
    assert r.count() == 401 + 200
    got = {row["k"]: row["v"] for row in r.collect()}
    assert got[0] == -1 and got[777] == -2 and got[1050] == 2100


# ---------------------------------------------------------------------------
# Per-file Bloom point filters + streaming COW upsert (late round 10)
# ---------------------------------------------------------------------------


def test_point_filter_prunes_files_without_false_negatives(spark, tmp_path):
    """Bloom skipping: a secondary-key lookup keeps every file that
    really contains the key (no false negatives — correctness never
    depends on the filter) and drops most others; pruned+filter equals
    full+filter for every probed key."""
    root = str(tmp_path)
    df = spark.range(0, 3000).selectExpr(
        "id AS k", "CAST(id % 500 AS BIGINT) AS sec", "id AS ts_k"
    )
    mb.create_manifest_table(
        spark, df.filter("k < 1000"), root, "pf",
        bucket_cols="k", num_buckets=4, sort_cols="ts_k",
        point_filter_cols="sec",
    )
    try:
        mb.append_manifest_table(spark, df.filter("k >= 1000 AND k < 2000"),
                                 root, "pf")
        mb.append_manifest_table(spark, df.filter("k >= 2000"), root, "pf")
        m = mb.read_manifest(root, "pf")
        assert m["point_filters"]["cols"] == ["sec"]
        assert set(m["point_filter_stats"]) == set(m["files"])
        for probe in (3, 123, 499):
            kept = mb.point_pruned_files(m, "sec", probe)
            full = (
                mb.read_manifest_table(spark, root, "pf")
                .filter(F.col("sec") == probe)
            )
            pruned = (
                mb.read_manifest_table_point(spark, root, "pf", "sec", probe)
                .filter(F.col("sec") == probe)
            )
            assert sorted(r["k"] for r in full.collect()) == sorted(
                r["k"] for r in pruned.collect()
            )
            assert len(kept) <= len(m["files"])
        # a value that exists NOWHERE prunes everything (whp) — with
        # 2048 bits and ≤167 distinct values/file the fp rate is tiny
        assert len(mb.point_pruned_files(m, "sec", 999_999)) <= 2
        # NULL probe and un-filtered column keep everything
        assert mb.point_pruned_files(m, "sec", None) == m["files"]
        assert mb.point_pruned_files(m, "k", 1) == m["files"]
    finally:
        mb.drop_catalog_entries(spark, root, "pf")


def test_point_filter_stats_carry_across_links(spark, tmp_path):
    root = str(tmp_path)
    df = spark.range(0, 200).selectExpr("id AS k", "id % 7 AS sec")
    mb.create_manifest_table(
        spark, df, root, "pf", bucket_cols="k", num_buckets=2,
        point_filter_cols="sec",
    )
    try:
        mb.append_manifest_table(
            spark, spark.range(200, 210).selectExpr("id AS k", "id % 7 AS sec"),
            root, "pf",
        )
        m0 = mb.read_manifest(root, "pf", version=0)
        m1 = mb.read_manifest(root, "pf", version=1)
        for f in m0["files"]:
            assert m1["point_filter_stats"][f] == m0["point_filter_stats"][f]
    finally:
        mb.drop_catalog_entries(spark, root, "pf")


def test_point_filter_rejects_unhashable_types(spark, tmp_path):
    df = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS d")
    with pytest.raises(ValueError, match="canonical hash form"):
        mb.create_manifest_table(
            spark, df, str(tmp_path), "pf",
            bucket_cols="k", num_buckets=2, point_filter_cols="d",
        )
    with pytest.raises(ValueError, match="not in schema"):
        mb.create_manifest_table(
            spark, df, str(tmp_path), "pf2",
            bucket_cols="k", num_buckets=2, point_filter_cols="nope",
        )


def test_foreach_batch_merge_latest_wins_and_exactly_once(spark, tmp_path):
    """The CDC sink: within-batch latest-wins on order_cols, merge per
    epoch, and a replayed epoch is a no-op even after an interleaved
    writer landed (manifest-chain dedupe through the COW path)."""
    root = str(tmp_path)
    schema = "k long, seq long, v long"
    mb.create_manifest_table(
        spark, spark.createDataFrame([], schema), root, "st",
        bucket_cols="k", num_buckets=2,
    )
    try:
        sink = mb.foreach_batch_merge(
            root, "st", key_cols="k", order_cols=["seq"]
        )
        b0 = spark.createDataFrame(
            [(1, 1, 10), (1, 2, 11), (2, 1, 20)], schema
        )
        sink(b0, 0)
        r = {row["k"]: (row["seq"], row["v"])
             for row in mb.read_manifest_table(spark, root, "st").collect()}
        assert r == {1: (2, 11), 2: (1, 20)}  # within-batch latest won

        b1 = spark.createDataFrame([(1, 3, 12), (3, 1, 30)], schema)
        sink(b1, 1)
        v_after = mb.current_version(root, "st")
        # interleaved writer lands between crash and replay
        mb.append_manifest_table(
            spark, spark.createDataFrame([(9, 1, 90)], schema), root, "st"
        )
        sink(b1, 1)  # replayed epoch — must be a no-op
        assert mb.current_version(root, "st") == v_after + 1
        r = {row["k"]: (row["seq"], row["v"])
             for row in mb.read_manifest_table(spark, root, "st").collect()}
        assert r == {1: (3, 12), 2: (1, 20), 3: (1, 30), 9: (1, 90)}
    finally:
        mb.drop_catalog_entries(spark, root, "st")


# ---------------------------------------------------------------------------
# Re-bucketing evolution (late round 10)
# ---------------------------------------------------------------------------


def test_rebucket_changes_layout_keeps_content_and_history(spark, tmp_path):
    """Rebucket 2→4: one generational rewrite; content identical; the
    pinned old version keeps the OLD layout and content; subsequent
    appends and merges follow the NEW spec."""
    import contextlib
    import io

    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 300), root, "rb",
        bucket_cols="k", num_buckets=2, sort_cols="ts_k",
    )
    try:
        v0 = mb.current_version(root, "rb")
        v1 = mb.rebucket_manifest_table(spark, root, "rb", num_buckets=4)
        m1 = mb.read_manifest(root, "rb")
        assert m1["version"] == v1 and m1["rebucketed_from"] == v0
        assert m1["num_buckets"] == 4
        assert {mb._file_bucket(f) for f in m1["files"]} <= set(range(4))
        r = mb.read_manifest_table(spark, root, "rb")
        assert r.count() == 300
        assert r.agg(F.sum("v")).first()[0] == sum(2 * k for k in range(300))
        # time travel: the old version still reads with the OLD spec
        old = mb.read_manifest_table(spark, root, "rb", version=v0)
        assert old.count() == 300
        assert mb.read_manifest(root, "rb", version=v0)["num_buckets"] == 2

        # the new layout joins exchange-free against a same-spec table
        mb.create_manifest_table(
            spark, spark.range(0, 300).selectExpr("id AS k", "id AS w"),
            root, "dim4", bucket_cols="k", num_buckets=4, sort_cols="k",
        )
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = r.join(mb.read_manifest_table(spark, root, "dim4"), "k")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain()
            assert "Exchange hashpartitioning" not in buf.getvalue()
            assert j.count() == 300
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

        # appends and merges now follow the 4-bucket spec
        mb.append_manifest_table(spark, _mk(spark, 300, 400), root, "rb")
        m2 = mb.read_manifest(root, "rb")
        assert m2["num_buckets"] == 4
        assert max(mb.files_per_bucket(m2).values()) <= 2
        one_key = spark.createDataFrame([(5, -9, 5)],
                                        "k long, v long, ts_k long")
        mb.merge_manifest_table(spark, one_key, root, "rb", key_cols="k")
        m3 = mb.read_manifest(root, "rb")
        assert m3["rewritten_files"] <= 2  # one bucket of four, ≤2 files
        got = mb.read_manifest_table(spark, root, "rb")
        assert got.filter(F.col("k") == 5).first()["v"] == -9
        assert got.count() == 400
    finally:
        mb.drop_catalog_entries(spark, root, "rb")
        mb.drop_catalog_entries(spark, root, "dim4")


def test_rebucket_guards_and_shred_rides_along(spark, tmp_path):
    root = str(tmp_path)
    df = spark.range(0, 80).select(
        F.col("id").alias("k"),
        F.to_json(F.struct((F.col("id") * 3).alias("x"))).alias("payload"),
    )
    mb.create_manifest_table(
        spark, df, root, "rbs", bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint"}},
    )
    try:
        # idempotent: re-requesting the current layout is a no-op
        # returning the published version (the crash-retry contract)
        assert mb.rebucket_manifest_table(
            spark, root, "rbs", num_buckets=2
        ) == mb.current_version(root, "rbs")
        with pytest.raises(ValueError, match="not in the table schema"):
            mb.rebucket_manifest_table(spark, root, "rbs",
                                       bucket_cols="nope", num_buckets=4)
        mb.rebucket_manifest_table(spark, root, "rbs", num_buckets=4)
        m = mb.read_manifest(root, "rbs")
        assert m["shred"]["fields"] == {"x": "bigint"}
        assert mb.covered_fields(m) == {"x"}  # recomputed for new files
        r = mb.read_manifest_table_shredded(spark, root, "rbs",
                                            {"x": "bigint"})
        assert r.agg(F.sum("x")).first()[0] == sum(3 * k for k in range(80))
    finally:
        mb.drop_catalog_entries(spark, root, "rbs")


def test_rebucket_repairs_lazily_evolved_fields(spark, tmp_path):
    """Review regression (confirmed): a rebucket after evolve_shred
    must re-derive the lazily-added field from raw JSON — an
    unrepaired rewrite would physically materialize all-NULL columns,
    flip covered_fields to true, and silently corrupt routed reads."""
    root = str(tmp_path)
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        F.to_json(F.struct((F.col("id") * 3).alias("x"),
                           (F.col("id") * 5).alias("y"))).alias("payload"),
    )
    mb.create_manifest_table(
        spark, df, root, "rr", bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"x": "bigint"}},
    )
    try:
        mb.evolve_shred(spark, root, "rr", add={"y": "bigint"})
        mb.rebucket_manifest_table(spark, root, "rr", num_buckets=4)
        m = mb.read_manifest(root, "rr")
        assert mb.covered_fields(m) == {"x", "y"}
        assert m["shred_field_stats"]["y"] == {
            "min": 0, "max": 295, "n_nulls": 0
        }
        r = mb.read_manifest_table_shredded(spark, root, "rr",
                                            {"y": "bigint"})
        assert r.agg(F.sum("y")).first()[0] == sum(5 * k for k in range(60))
    finally:
        mb.drop_catalog_entries(spark, root, "rr")


def test_merge_census_recomputes_after_concurrent_rebucket(spark, table):
    """Advisor regression (the round's medium finding): the bucket
    census used to be computed ONCE from the manifest read before the
    rewrite loop — a rebucket publishing in between made the old
    spec's bucket ids filter the NEW layout's files, hard-linking
    files that contain affected keys and inserting the update beside
    the surviving old row (silent duplicate keys).  The selector now
    recomputes the census whenever the manifest it filters carries a
    different bucket spec.  This test replays the exact interleave:
    selector built against the 4-bucket manifest, rebucket to 8
    publishes, then the claimed rewrite runs against the 8-bucket
    snapshot."""
    prev0 = mb.read_manifest(table, "t")
    updates = spark.createDataFrame(
        [(k, -100 - k, k) for k in range(0, 40)], "k long, v long, ts_k long"
    ).localCheckpoint()
    select_touched = mb._bucket_pruned_selector(
        prev0, updates, ["k"], validate=True
    )
    # the concurrent layout change lands between the census and the
    # claimed publish
    mb.rebucket_manifest_table(spark, table, "t", num_buckets=8)

    def transform(old, prev):
        ups = mb._physical_shape(updates, prev)
        survivors = old.join(updates.select("k"), ["k"], "left_anti")
        return survivors.unionByName(ups)

    mb._cow_rewrite(spark, table, "t", select_touched, transform, "merge")

    rows = mb.read_manifest_table(spark, table, "t").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r["v"])
    dupes = {k: vs for k, vs in by_key.items() if len(vs) > 1}
    assert not dupes, f"stale census duplicated keys: {dupes}"
    for k in range(0, 40):
        assert by_key[k] == [-100 - k], f"update lost for k={k}"
    assert len(rows) == 400

    # and a rebucket onto DIFFERENT bucket columns mid-rewrite is
    # refused loudly when the key set no longer covers them
    prev1 = mb.read_manifest(table, "t")
    sel2 = mb._bucket_pruned_selector(prev1, updates, ["k"], validate=False)
    mb.rebucket_manifest_table(spark, table, "t", bucket_cols="ts_k",
                               num_buckets=4)
    with pytest.raises(ValueError, match="re-bucketed onto"):
        mb._cow_rewrite(spark, table, "t", sel2, transform, "merge")


def test_point_filter_build_does_no_driver_column_reads(spark, tmp_path, monkeypatch):
    """r10 verdict #1: the Bloom build used to pq.read_table every new
    file's column ON THE DRIVER in a serial loop — a publish-time
    scale-killer at hundreds of files.  The build is now one
    distributed Spark job (JVM collect_set + Arrow mapInPandas); the
    driver must read only FOOTER metadata (ParquetFile), never column
    data.  Guard: pq.read_table raising in the driver process for the
    whole publish; filters must still come out complete and correct,
    including string columns."""
    import pyarrow.parquet as pq

    def forbidden(*a, **kw):
        raise AssertionError(
            "driver-side pq.read_table during publish — the point-"
            "filter build must be the distributed job"
        )

    monkeypatch.setattr(pq, "read_table", forbidden)
    root = str(tmp_path)
    df = spark.range(0, 2000).selectExpr(
        "id AS k", "CAST(id % 311 AS BIGINT) AS sec",
        "md5(CAST(id % 97 AS STRING)) AS tag",
    )
    mb.create_manifest_table(
        spark, df.filter("k < 1200"), root, "pfd",
        bucket_cols="k", num_buckets=4,
        point_filter_cols=["sec", "tag"],
    )
    try:
        mb.append_manifest_table(spark, df.filter("k >= 1200"), root, "pfd")
        m = mb.read_manifest(root, "pfd")
        assert set(m["point_filter_stats"]) == set(m["files"])
        for f, per_col in m["point_filter_stats"].items():
            assert set(per_col) == {"sec", "tag"}
        # no false negatives through the distributed build, for BOTH
        # the int column (canonical "5", not "5.0") and the string one
        full = mb.read_manifest_table(spark, root, "pfd")
        probe_tag = full.filter("k = 77").first()["tag"]
        for col, probe in (("sec", 5), ("sec", 310), ("tag", probe_tag)):
            want = sorted(
                r["k"] for r in full.filter(F.col(col) == probe).collect()
            )
            got = sorted(
                r["k"]
                for r in mb.read_manifest_table_point(
                    spark, root, "pfd", col, probe
                ).filter(F.col(col) == probe).collect()
            )
            assert want == got and want, (col, probe)
    finally:
        mb.drop_catalog_entries(spark, root, "pfd")
