"""Transactional secondary index (round 12): posting-list index
maintained in the same commit_multi_table transaction as its base,
point lookups scanning only posted buckets, crash injection between
the two staged writes, and the rebucket refusal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb
from curw_mike_data_handler_spark.sources import manifest_index as mi


def _mk(spark, lo, hi):
    # secondary column c = k % 997: values spread over a few buckets
    return spark.range(lo, hi).selectExpr(
        "id AS k", "id % 997 AS c", "id * 2 AS v"
    )


@pytest.fixture()
def indexed(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 2000), root, "base",
        bucket_cols="k", num_buckets=8, sort_cols="k",
    )
    mi.create_manifest_index(spark, root, "base", "base_by_c", column="c")
    yield root
    mb.drop_catalog_entries(spark, root, "base")
    mb.drop_catalog_entries(spark, root, "base_by_c")


def _lookup_rows(spark, root, value):
    got = mi.read_manifest_point_indexed(
        spark, root, "base", "base_by_c", value
    )
    return sorted((r["k"], r["c"], r["v"]) for r in got.collect())


def test_index_lookup_answers_and_prunes(spark, indexed):
    root = indexed
    want = sorted((k, k % 997, k * 2) for k in range(2000) if k % 997 == 5)
    assert _lookup_rows(spark, root, 5) == want
    # absent value: empty, not an error
    assert _lookup_rows(spark, root, 1500) == []
    # the probe beats the full scan (the efficiency contract)
    scanned, total = mi.indexed_lookup_files(root, "base", "base_by_c", 5)
    assert 0 < scanned < total


def test_append_with_index_is_atomic_and_lookup_ignores_unindexed(
    spark, indexed
):
    root = indexed
    mi.append_with_index(
        spark, _mk(spark, 2000, 2500), root, "base", "base_by_c",
        batch_id="ap1", compact_files_per_bucket=100,
    )
    want = sorted((k, k % 997, k * 2) for k in range(2500) if k % 997 == 5)
    assert _lookup_rows(spark, root, 5) == want
    # junk appended OUTSIDE any transaction: plain readers see it,
    # the txn-atomic indexed lookup must NOT (it would also be
    # index-uncovered — the atomicity contract keeps it invisible
    # rather than wrong)
    junk = spark.createDataFrame([(900001, 5, -1)], "k long, c long, v long")
    mb.append_manifest_table(spark, junk, root, "base",
                             compact_files_per_bucket=100)
    assert _lookup_rows(spark, root, 5) == want
    plain = mb.read_manifest_table(spark, root, "base")
    assert plain.filter(F.col("k") == 900001).count() == 1
    # replay of the SAME batch_id: no-op, same txn version
    v1 = mi.append_with_index(
        spark, _mk(spark, 2000, 2500), root, "base", "base_by_c",
        batch_id="ap1", compact_files_per_bucket=100,
    )
    assert mb._txn_batch_published(root, "ap1") == v1


def test_crash_between_staged_writes_is_invisible_then_replayable(
    spark, indexed, monkeypatch
):
    """Kill the writer AFTER staging the base batch but BEFORE staging
    the index postings: nothing is visible to any reader (plain or
    atomic), and the batch_id replay completes the commit."""
    root = indexed
    before = _lookup_rows(spark, root, 7)
    base_rows = mb.read_manifest_table(spark, root, "base").count()
    orig = mb._write_manifest_file
    staged = []

    def crash_second(root_, table, manifest):
        if table == "base_by_c" and staged:
            raise RuntimeError("injected crash between staged writes")
        if table in ("base", "base_by_c"):
            staged.append(table)
        return orig(root_, table, manifest)

    monkeypatch.setattr(mb, "_write_manifest_file", crash_second)
    with pytest.raises(RuntimeError, match="between staged writes"):
        mi.append_with_index(
            spark, _mk(spark, 3000, 3100), root, "base", "base_by_c",
            batch_id="cr1", compact_files_per_bucket=100,
        )
    monkeypatch.setattr(mb, "_write_manifest_file", orig)
    # torn state is structurally impossible: nothing visible anywhere
    assert mb.read_manifest_table(spark, root, "base").count() == base_rows
    assert _lookup_rows(spark, root, 7) == before
    # the documented replay completes it exactly-once
    mi.append_with_index(
        spark, _mk(spark, 3000, 3100), root, "base", "base_by_c",
        batch_id="cr1", compact_files_per_bucket=100,
    )
    want = sorted((k, k % 997, k * 2)
                  for k in list(range(2000)) + list(range(3000, 3100))
                  if k % 997 == 7)
    assert _lookup_rows(spark, root, 7) == want


def test_rebucketed_base_is_refused(spark, indexed):
    root = indexed
    mb.rebucket_manifest_table(spark, root, "base", num_buckets=4)
    with pytest.raises(ValueError, match="rebuild the index"):
        mi.append_with_index(
            spark, _mk(spark, 5000, 5010), root, "base", "base_by_c",
        )
    # the lookup still works at the PINNED (pre-rebucket) versions —
    # the pins are what make this safe
    assert _lookup_rows(spark, root, 5) == sorted(
        (k, k % 997, k * 2) for k in range(2000) if k % 997 == 5
    )
    # but once a new txn pins the rebucketed base, the lookup refuses
    mb.pin_tables_txn(root, ["base"])
    with pytest.raises(ValueError, match="rebuild the index"):
        mi.read_manifest_point_indexed(spark, root, "base", "base_by_c", 5)


def test_not_an_index_and_unpinned_errors(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 50), root, "plain",
        bucket_cols="k", num_buckets=2,
    )
    try:
        with pytest.raises(ValueError, match="INDEX metadata"):
            mi.append_with_index(
                spark, _mk(spark, 50, 60), root, "plain", "plain",
            )
        with pytest.raises(KeyError, match="not pinned"):
            mi.read_manifest_point_indexed(
                spark, root, "plain", "plain", 5
            )
    finally:
        mb.drop_catalog_entries(spark, root, "plain")


def test_index_pins_the_built_snapshot_not_current(spark, tmp_path,
                                                   monkeypatch):
    """Review regression (r12): create_manifest_index must pin the
    EXACT base version its postings were computed over — pinning
    'current' would adopt a concurrent append the postings never saw
    and silently omit its rows from every lookup."""
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 500), root, "base",
        bucket_cols="k", num_buckets=4, sort_cols="k",
    )
    try:
        # a competitor appends BETWEEN the posting build and the pin
        orig = mb.pin_tables_txn

        def racing_pin(root_, tables, **kw):
            mb.append_manifest_table(
                spark, _mk(spark, 500, 600), root_, "base",
                compact_files_per_bucket=100,
            )
            return orig(root_, tables, **kw)

        monkeypatch.setattr(mb, "pin_tables_txn", racing_pin)
        mi.create_manifest_index(spark, root, "base", "ix", column="c")
        monkeypatch.setattr(mb, "pin_tables_txn", orig)
        cat = mb.read_txn_catalog(root)
        # pinned at the INDEXED snapshot (v0), not the racer's v1
        assert cat["tables"]["base"] == 0
        # lookups over the pinned pair are complete for that snapshot
        got = mi.read_manifest_point_indexed(spark, root, "base", "ix", 5)
        assert sorted(r["k"] for r in got.collect()) == [5]
    finally:
        mb.drop_catalog_entries(spark, root, "base")
        mb.drop_catalog_entries(spark, root, "ix")


def test_exact_pin_refuses_regression_and_mismatched_table(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 100), root, "base",
        bucket_cols="k", num_buckets=4, sort_cols="k",
    )
    mi.create_manifest_index(spark, root, "base", "ix", column="c")
    try:
        # a newer pin exists (normal txn append) …
        mi.append_with_index(spark, _mk(spark, 100, 150), root,
                             "base", "ix", compact_files_per_bucket=100)
        # … so an EXACT pin at the stale version must refuse, not
        # silently publish an inconsistent group
        with pytest.raises(mb.ConcurrentWriteError, match="stale"):
            mb.pin_tables_txn(root, {"base": 0})
        # and the lookup guards against a same-spec WRONG base
        mb.create_manifest_table(
            spark, _mk(spark, 0, 100), root, "decoy",
            bucket_cols="k", num_buckets=4, sort_cols="k",
        )
        mb.pin_tables_txn(root, ["decoy"])
        with pytest.raises(ValueError, match="indexes 'base'"):
            mi.read_manifest_point_indexed(spark, root, "decoy", "ix", 5)
    finally:
        mb.drop_catalog_entries(spark, root, "base")
        mb.drop_catalog_entries(spark, root, "ix")
        mb.drop_catalog_entries(spark, root, "decoy")
