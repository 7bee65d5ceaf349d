"""Incremental change feed over manifest tables (round 11): per-commit
row-level diffs derived from the manifests' rewritten-region file
sets.  The contract under test: replaying the feed onto the
from-version snapshot reproduces the to-version snapshot EXACTLY
(multiset semantics), commit by commit, through every write-path op.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb

SCHEMA = "k long, v long, ts_k long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snapshot_counter(spark, root, table, version):
    rows = mb.read_manifest_table(spark, root, table, version).collect()
    return Counter((r["k"], r["v"], r["ts_k"]) for r in rows)


def _feed_counters(spark, root, table, from_v, to_v):
    ch = mb.read_manifest_changes(
        spark, root, table, from_version=from_v, to_version=to_v
    ).collect()
    ins = Counter(
        (r["k"], r["v"], r["ts_k"]) for r in ch
        if r["_change_type"] == "insert"
    )
    dels = Counter(
        (r["k"], r["v"], r["ts_k"]) for r in ch
        if r["_change_type"] == "delete"
    )
    return ins, dels


def _assert_replay(spark, root, table, from_v, to_v):
    before = _snapshot_counter(spark, root, table, from_v)
    after = _snapshot_counter(spark, root, table, to_v)
    ins, dels = _feed_counters(spark, root, table, from_v, to_v)
    replayed = before + ins
    replayed.subtract(dels)
    replayed = +replayed  # drop zero/negative entries
    assert replayed == after, (
        f"feed replay {from_v}->{to_v} diverged: "
        f"extra={replayed - after} missing={after - replayed}"
    )


def test_scripted_ops_changes_exact(spark, tmp_path):
    root = str(tmp_path)
    init = [(k, k * 10, k) for k in range(100)]
    mb.create_manifest_table(
        spark, _df(spark, init), root, "cf",
        bucket_cols="k", num_buckets=4, sort_cols="ts_k",
    )
    try:
        # v1: append
        mb.append_manifest_table(
            spark, _df(spark, [(k, k * 10, k) for k in range(100, 120)]),
            root, "cf", compact_files_per_bucket=100,
        )
        # v2: merge — update 5 keys (all genuinely changed: an update
        # that writes an identical row is correctly NOT a change, so
        # avoid k=0 where -k == k*10 == 0), insert 2
        mb.merge_manifest_table(
            spark,
            _df(spark, [(k, -k - 1, k) for k in range(5)]
                + [(200, 1, 200), (201, 2, 201)]),
            root, "cf", key_cols="k",
        )
        # v3: COW delete of 3 keys
        mb.delete_manifest_rows(
            spark, spark.createDataFrame([(10,), (11,), (12,)], "k long"),
            root, "cf", key_cols="k",
        )
        # v4: MoR delete of 2 keys
        mb.delete_manifest_rows_mor(
            spark, spark.createDataFrame([(20,), (21,)], "k long"),
            root, "cf", key_cols="k",
        )
        ch = mb.read_manifest_changes(spark, root, "cf", from_version=0)
        got = {
            (r["_commit_version"], r["_change_type"],
             r["k"], r["v"], r["ts_k"])
            for r in ch.collect()
        }
        want = (
            {(1, "insert", k, k * 10, k) for k in range(100, 120)}
            | {(2, "delete", k, k * 10, k) for k in range(5)}
            | {(2, "insert", k, -k - 1, k) for k in range(5)}
            | {(2, "insert", 200, 1, 200), (2, "insert", 201, 2, 201)}
            | {(3, "delete", k, k * 10, k) for k in (10, 11, 12)}
            | {(4, "delete", k, k * 10, k) for k in (20, 21)}
        )
        assert got == want
        assert ch.count() == len(want)  # multiplicity 1 everywhere
        # windowed feed: only v3..v4
        ch2 = mb.read_manifest_changes(spark, root, "cf",
                                       from_version=2, to_version=4)
        assert {r["_commit_version"] for r in ch2.collect()} == {3, 4}
        # and replay equivalence over every window
        for a in range(0, 5):
            for b in range(a, 5):
                _assert_replay(spark, root, "cf", a, b)
    finally:
        mb.drop_catalog_entries(spark, root, "cf")


def test_content_preserving_rewrites_emit_no_changes(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _df(spark, [(k, k, k) for k in range(60)]), root, "np",
        bucket_cols="k", num_buckets=2, sort_cols="ts_k",
        shred=None,
    )
    try:
        v_before = mb.current_version(root, "np")
        mb.rebucket_manifest_table(spark, root, "np", num_buckets=4)
        # forced compaction via tiny threshold
        mb.append_manifest_table(
            spark, _df(spark, [(100, 100, 100)]), root, "np",
            compact_files_per_bucket=1,
        )
        to_v = mb.current_version(root, "np")
        ch = mb.read_manifest_changes(
            spark, root, "np", from_version=v_before, to_version=to_v
        ).collect()
        # the rebucket and the compaction contribute nothing; the
        # append contributes its one row
        assert [(r["_change_type"], r["k"]) for r in ch] == [("insert", 100)]
        _assert_replay(spark, root, "np", v_before, to_v)
    finally:
        mb.drop_catalog_entries(spark, root, "np")


def test_feed_replay_property_random_walk(spark, tmp_path):
    """Model-based property: across a random interleaving of every
    write op (append/merge/COW delete/range delete/MoR delete/
    rebucket), snapshot(a) + feed(a->b) == snapshot(b) for sampled
    version windows."""
    rng = random.Random(1123)
    root = str(tmp_path)
    next_k = 200

    def fresh(n):
        nonlocal next_k
        rows = [(k, rng.randrange(50), k) for k in range(next_k, next_k + n)]
        next_k += n
        return rows

    mb.create_manifest_table(
        spark, _df(spark, [(k, k % 7, k) for k in range(120)]), root, "pw",
        bucket_cols="k", num_buckets=2, sort_cols="ts_k",
    )
    try:
        for _ in range(10):
            live = [
                r["k"] for r in
                mb.read_manifest_table(spark, root, "pw")
                .select("k").collect()
            ]
            op = rng.choice(["append", "merge", "delete", "delete_range",
                             "delete_mor", "rebucket"])
            if op == "append":
                mb.append_manifest_table(
                    spark, _df(spark, fresh(rng.randrange(5, 25))),
                    root, "pw", compact_files_per_bucket=3,
                )
            elif op == "merge" and live:
                ks = rng.sample(live, min(6, len(live)))
                mb.merge_manifest_table(
                    spark,
                    _df(spark, [(k, rng.randrange(50), k) for k in ks]
                        + fresh(2)),
                    root, "pw", key_cols="k",
                )
            elif op == "delete" and live:
                ks = rng.sample(live, min(4, len(live)))
                mb.delete_manifest_rows(
                    spark,
                    spark.createDataFrame([(k,) for k in ks], "k long"),
                    root, "pw", key_cols="k",
                )
            elif op == "delete_range":
                lo = rng.randrange(0, next_k)
                mb.delete_manifest_range(spark, root, "pw",
                                         lower=lo, upper=lo + 15)
            elif op == "delete_mor" and live:
                ks = rng.sample(live, min(3, len(live)))
                mb.delete_manifest_rows_mor(
                    spark,
                    spark.createDataFrame([(k,) for k in ks], "k long"),
                    root, "pw", key_cols="k",
                )
            else:
                cur = mb.read_manifest(root, "pw")["num_buckets"]
                mb.rebucket_manifest_table(
                    spark, root, "pw", num_buckets=(4 if cur == 2 else 2)
                )
        latest = mb.current_version(root, "pw")
        # full-history replay plus three random windows
        _assert_replay(spark, root, "pw", 0, latest)
        for _ in range(3):
            a = rng.randrange(0, latest)
            b = rng.randrange(a, latest + 1)
            _assert_replay(spark, root, "pw", a, b)
    finally:
        mb.drop_catalog_entries(spark, root, "pw")


def test_changes_window_guards(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _df(spark, [(1, 1, 1)]), root, "g",
        bucket_cols="k", num_buckets=2,
    )
    try:
        with pytest.raises(ValueError, match="newer than"):
            mb.read_manifest_changes(spark, root, "g",
                                     from_version=3, to_version=1)
        with pytest.raises(ValueError, match="no parent"):
            mb.read_manifest_changes(spark, root, "g", from_version=-1)
        # empty window: no commits, typed empty feed
        ch = mb.read_manifest_changes(spark, root, "g", from_version=0)
        assert ch.count() == 0
        assert "_change_type" in ch.columns
        # expired history raises the retention hint
        for i in range(4):
            mb.append_manifest_table(
                spark, _df(spark, [(10 + i, 1, 1)]), root, "g",
                compact_files_per_bucket=100,
            )
        mb.expire_generations(spark, root, "g", keep=2)
        with pytest.raises(FileNotFoundError, match="expired"):
            mb.read_manifest_changes(spark, root, "g", from_version=0)
    finally:
        mb.drop_catalog_entries(spark, root, "g")


def test_append_only_feed_plans_no_join(spark, tmp_path):
    """Plan guard: an append commit's changes ARE its new files — the
    feed must read them directly, with no diff join anywhere in the
    plan (at 100 TB the append path is the hot one: a nightly
    incremental consumer reads the day's files, joins nothing).  The
    null-safe diff join may appear only for commits that rewrote
    files."""
    import contextlib
    import io

    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _df(spark, [(k, k, k) for k in range(50)]), root, "ap",
        bucket_cols="k", num_buckets=2,
    )
    try:
        for i in range(2):
            mb.append_manifest_table(
                spark, _df(spark, [(100 + i, 1, 1)]), root, "ap",
                compact_files_per_bucket=100,
            )
        ch = mb.read_manifest_changes(spark, root, "ap", from_version=0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ch.explain()
        plan = buf.getvalue()
        for node in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "CartesianProduct",
                     "BroadcastNestedLoopJoin"):
            assert node not in plan, f"append-only feed planned a {node}"
        assert ch.count() == 2
    finally:
        mb.drop_catalog_entries(spark, root, "ap")


def test_feed_handles_map_typed_shred_columns(spark, tmp_path):
    """Review regression: the diff groups on every physical column,
    and Spark cannot group by MapType — which the shred spec
    legitimately produces.  Top-level maps diff via their key-sorted
    entry arrays (a bijection) and come back out as maps."""
    root = str(tmp_path)
    rows = spark.range(0, 40).select(
        F.col("id").alias("k"),
        F.to_json(
            F.struct(F.create_map(F.lit("a"), F.col("id")).alias("m"))
        ).alias("payload"),
    )
    mb.create_manifest_table(
        spark, rows, root, "mp", bucket_cols="k", num_buckets=2,
        shred={"column": "payload", "fields": {"m": "map<string, bigint>"}},
    )
    try:
        upd = spark.range(0, 3).select(
            F.col("id").alias("k"),
            F.to_json(
                F.struct(
                    F.create_map(F.lit("b"), F.col("id") + 100).alias("m")
                )
            ).alias("payload"),
        )
        mb.merge_manifest_table(spark, upd, root, "mp", key_cols="k")
        ch = mb.read_manifest_changes(spark, root, "mp", from_version=0)
        got = sorted(
            (r["_change_type"], r["k"],
             dict(r["_shred_payload_m"] or {}))
            for r in ch.collect()
        )
        want = sorted(
            [("delete", k, {"a": k}) for k in range(3)]
            + [("insert", k, {"b": k + 100}) for k in range(3)]
        )
        assert got == want
    finally:
        mb.drop_catalog_entries(spark, root, "mp")
