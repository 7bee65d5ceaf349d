"""Merge-on-read UPSERT (round 12, r11 verdict #1): one commit marks
replaced rows dead via deletion vectors and writes only the update
batch as bucketed delta files beside the hard-linked base — the
Iceberg-v2 positional-delete / Delta-DV write path on top of the r11
vector machinery.  Compaction folds the deltas and clears the debt.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _mk(spark, lo, hi, v_mult=2):
    return spark.range(lo, hi).selectExpr(
        f"id AS k", f"id * {v_mult} AS v", "CAST(id AS BIGINT) AS ts_k"
    )


def _content(spark, root, table, version=None):
    rows = mb.read_manifest_table(spark, root, table, version).collect()
    return Counter((r["k"], r["v"], r["ts_k"]) for r in rows)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 400), root, "t",
        bucket_cols="k", num_buckets=4, sort_cols="ts_k",
    )
    yield root
    mb.drop_catalog_entries(spark, root, "t")


def test_mor_upsert_replaces_inserts_and_writes_no_base_file(spark, table):
    root = table
    prev = mb.read_manifest(root, "t")
    ups = spark.createDataFrame(
        [(10, -1, 10), (11, -2, 11), (500, -3, 500)], "k long, v long, ts_k long"
    )
    v = mb.merge_manifest_table_mor(
        spark, ups, root, "t", key_cols="k", compact_files_per_bucket=100,
    )
    m = mb.read_manifest(root, "t")
    assert m["version"] == v and m["op"] == "merge_mor"
    # every base file hard-linked, only delta files new
    assert set(prev["files"]) <= set(m["files"])
    assert m["replaced_positions"] == 2  # keys 10, 11 existed; 500 is new
    assert m["dv_positions"] == 2
    # logical content: same as a COW merge would produce
    want = Counter((k, k * 2, k) for k in range(400) if k not in (10, 11))
    want.update([(10, -1, 10), (11, -2, 11), (500, -3, 500)])
    assert _content(spark, root, "t") == want
    # pinned reader of the parent version: untouched snapshot
    assert _content(spark, root, "t", version=prev["version"]) == Counter(
        (k, k * 2, k) for k in range(400)
    )


def test_mor_upsert_of_mor_delta_row_vectors_the_delta_file(spark, table):
    """A second MoR upsert of the SAME key must kill the FIRST
    upsert's delta row (which lives in a delta file, not the base)."""
    root = table
    up1 = spark.createDataFrame([(7, -1, 7)], "k long, v long, ts_k long")
    up2 = spark.createDataFrame([(7, -2, 7)], "k long, v long, ts_k long")
    mb.merge_manifest_table_mor(spark, up1, root, "t", key_cols="k",
                                compact_files_per_bucket=100)
    mb.merge_manifest_table_mor(spark, up2, root, "t", key_cols="k",
                                compact_files_per_bucket=100)
    got = mb.read_manifest_table(spark, root, "t").filter(F.col("k") == 7)
    assert [(r["k"], r["v"]) for r in got.collect()] == [(7, -2)]
    # the second commit vectored positions in BOTH a base file and
    # the first delta file's region (2 total replaced across commits)
    assert mb.read_manifest(root, "t")["dv_positions"] == 2


def test_mor_compaction_folds_deltas_and_clears_vectors(spark, table):
    root = table
    for i in range(3):
        ups = spark.createDataFrame(
            [(k, -(i + 1), k) for k in range(20, 30)],
            "k long, v long, ts_k long",
        )
        v = mb.merge_manifest_table_mor(
            spark, ups, root, "t", key_cols="k",
            compact_files_per_bucket=3,
        )
    m = mb.read_manifest(root, "t")
    # the last commit crossed the bound: compaction ran
    assert m.get("compacted_from") is not None
    assert not m.get("delete_vectors")
    per_bucket = mb.files_per_bucket(m)
    assert max(per_bucket.values()) == 1  # folded
    want = Counter((k, k * 2, k) for k in range(400) if not 20 <= k < 30)
    want.update([(k, -3, k) for k in range(20, 30)])
    assert _content(spark, root, "t") == want


def test_mor_exactly_once_batch_replay(spark, table):
    root = table
    ups = spark.createDataFrame([(3, -9, 3)], "k long, v long, ts_k long")
    v = mb.merge_manifest_table_mor(
        spark, ups, root, "t", key_cols="k", batch_id="m1",
        compact_files_per_bucket=100,
    )
    assert mb.merge_manifest_table_mor(
        spark, ups, root, "t", key_cols="k", batch_id="m1",
        compact_files_per_bucket=100,
    ) == v
    assert mb.current_version(root, "t") == v
    got = mb.read_manifest_table(spark, root, "t").filter(F.col("k") == 3)
    assert [(r["k"], r["v"]) for r in got.collect()] == [(3, -9)]


def test_mor_position_cap_routes_bulk_updates_to_cow(spark, table):
    root = table
    big = _mk(spark, 0, 300, v_mult=5)
    with pytest.raises(ValueError, match="copy-on-write"):
        mb.merge_manifest_table_mor(
            spark, big, root, "t", key_cols="k", max_positions=100,
            compact_files_per_bucket=100,
        )
    # nothing published by the refused attempt
    assert mb.current_version(root, "t") == 0


def test_mor_change_feed_emits_deletes_and_inserts(spark, table):
    root = table
    ups = spark.createDataFrame(
        [(5, -1, 5), (6, -2, 6), (900, -3, 900)], "k long, v long, ts_k long"
    )
    mb.merge_manifest_table_mor(spark, ups, root, "t", key_cols="k",
                                compact_files_per_bucket=100)
    feed = mb.read_manifest_changes(spark, root, "t", from_version=0)
    rows = [(r["_change_type"], r["k"], r["v"]) for r in feed.collect()]
    assert sorted(r for r in rows if r[0] == "delete") == [
        ("delete", 5, 10), ("delete", 6, 12)
    ]
    assert sorted(r for r in rows if r[0] == "insert") == [
        ("insert", 5, -1), ("insert", 6, -2), ("insert", 900, -3)
    ]


def test_mor_feed_replay_reproduces_snapshot(spark, table):
    """Replay equivalence across a window mixing MoR upserts with the
    other write classes."""
    root = table
    base_v = mb.current_version(root, "t")
    before = _content(spark, root, "t", version=base_v)
    mb.merge_manifest_table_mor(
        spark,
        spark.createDataFrame([(1, -1, 1), (777, -7, 777)],
                              "k long, v long, ts_k long"),
        root, "t", key_cols="k", compact_files_per_bucket=100,
    )
    mb.append_manifest_table(
        spark, _mk(spark, 1000, 1020), root, "t",
        compact_files_per_bucket=100,
    )
    mb.delete_manifest_rows_mor(
        spark, spark.createDataFrame([(1,), (1000,)], "k long"),
        root, "t", key_cols="k",
    )
    mb.merge_manifest_table(
        spark, spark.createDataFrame([(2, -2, 2)], "k long, v long, ts_k long"),
        root, "t", key_cols="k",
    )
    feed = mb.read_manifest_changes(spark, root, "t", from_version=base_v)
    replayed = Counter(before)
    for r in sorted(
        feed.collect(),
        key=lambda r: (r["_commit_version"], r["_change_type"]),
    ):
        key = (r["k"], r["v"], r["ts_k"])
        if r["_change_type"] == "delete":
            replayed[key] -= 1
            if not replayed[key]:
                del replayed[key]
        else:
            replayed[key] += 1
    assert replayed == _content(spark, root, "t")


def test_mor_mirror_converges(spark, table):
    root = table
    mb.create_manifest_mirror(spark, root, "t", "t_m")
    try:
        mb.merge_manifest_table_mor(
            spark,
            spark.createDataFrame([(9, -9, 9), (888, -8, 888)],
                                  "k long, v long, ts_k long"),
            root, "t", key_cols="k", compact_files_per_bucket=100,
        )
        mb.sync_manifest_mirror(spark, root, "t_m", key_cols="k")
        assert _content(spark, root, "t_m") == _content(spark, root, "t")
    finally:
        mb.drop_catalog_entries(spark, root, "t_m")


def test_mor_on_shredded_table(spark, tmp_path):
    root = str(tmp_path)
    df = spark.range(0, 60).selectExpr(
        "id AS k",
        """to_json(named_struct('a', id * 3, 'b', CAST(id AS STRING)))
           AS payload""",
    )
    shred = {"column": "payload", "fields": {"a": "bigint", "b": "string"}}
    mb.create_manifest_table(
        spark, df, root, "sh", bucket_cols="k", num_buckets=2, shred=shred,
    )
    try:
        ups = spark.range(5, 8).selectExpr(
            "id AS k",
            "to_json(named_struct('a', -id, 'b', 'upd')) AS payload",
        )
        mb.merge_manifest_table_mor(spark, ups, root, "sh", key_cols="k",
                                    compact_files_per_bucket=100)
        got = mb.read_manifest_table_shredded(
            spark, root, "sh", {"a": "bigint", "b": "string"},
            base_cols="k",
        )
        rows = {r["k"]: (r["a"], r["b"]) for r in got.collect()}
        assert len(rows) == 60
        assert rows[5] == (-5, "upd") and rows[10] == (30, "10")
    finally:
        mb.drop_catalog_entries(spark, root, "sh")
