"""O(1) batch-id dedupe (r11 verdict #6): every manifest carries a
bounded ``recent_batch_ids`` index, so the exactly-once replay check
reads ONE manifest on the common path instead of walking the chain —
with the head-first walk kept as the fallback for pre-feature chains
and cap-saturated indexes.
"""

from __future__ import annotations

import json

import pytest

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(
        spark, _mk(spark, 0, 40), root, "t", bucket_cols="k", num_buckets=2,
    )
    yield root
    mb.drop_catalog_entries(spark, root, "t")


def _reads_counted(monkeypatch):
    """Patch read_manifest to count calls; returns the counter list."""
    calls = []
    orig = mb.read_manifest

    def counting(root, table, version=None):
        calls.append(version)
        return orig(root, table, version)

    monkeypatch.setattr(mb, "read_manifest", counting)
    return calls


def test_lookup_is_one_manifest_read_hit_and_miss(spark, table, monkeypatch):
    root = table
    v1 = mb.append_manifest_table(
        spark, _mk(spark, 40, 50), root, "t",
        batch_id="b1", compact_files_per_bucket=100,
    )
    v2 = mb.merge_manifest_table(
        spark, _mk(spark, 0, 5), root, "t", key_cols="k", batch_id="b2",
    )
    mb.append_manifest_table(  # batch-less commit: index carried
        spark, _mk(spark, 50, 55), root, "t", compact_files_per_bucket=100,
    )
    calls = _reads_counted(monkeypatch)
    # HIT: returns the landed version, reading ONLY the head manifest
    assert mb._batch_id_published(root, "t", "b1") == v1
    assert mb._batch_id_published(root, "t", "b2") == v2
    # authoritative MISS (index below its cap): still one read
    assert mb._batch_id_published(root, "t", "nope") is None
    assert len(calls) == 3, f"chain walked: {calls}"


def test_compaction_restamps_at_compacted_version(spark, table):
    root = table
    # low threshold: the append's second generation compacts at once
    v = mb.append_manifest_table(
        spark, _mk(spark, 40, 90), root, "t",
        batch_id="bc", compact_files_per_bucket=1,
    )
    m = mb.read_manifest(root, "t")
    assert m.get("compacted_from") is not None
    # newest index entry wins: the compacted version, matching the
    # head-first walk's answer
    assert mb._batch_id_published(root, "t", "bc") == v
    # replaying the append is a no-op returning the same version
    assert mb.append_manifest_table(
        spark, _mk(spark, 40, 90), root, "t",
        batch_id="bc", compact_files_per_bucket=1,
    ) == v


def test_prefeature_chain_falls_back_to_walk(spark, table):
    root = table
    v1 = mb.append_manifest_table(
        spark, _mk(spark, 40, 50), root, "t",
        batch_id="old", compact_files_per_bucket=100,
    )
    # simulate a pre-feature chain: strip the index from every
    # manifest (as if written before the feature existed)
    for v in range(mb.current_version(root, "t") + 1):
        p = mb._manifest_path(root, "t", v)
        m = json.load(open(p))
        m.pop("recent_batch_ids", None)
        with open(p, "w") as fh:
            json.dump(m, fh)
    # the walk still finds the batch (no index, no fast path)
    assert mb._batch_id_published(root, "t", "old") == v1
    assert mb._batch_id_published(root, "t", "nope") is None
    # and a new publish on the stripped chain does NOT birth a fresh
    # (incomplete) index that would misreport "old" as unpublished
    mb.append_manifest_table(
        spark, _mk(spark, 50, 55), root, "t", compact_files_per_bucket=100,
    )
    assert "recent_batch_ids" not in mb.read_manifest(root, "t")
    assert mb._batch_id_published(root, "t", "old") == v1


def test_saturated_index_falls_back_to_walk(spark, table, monkeypatch):
    root = table
    v1 = mb.append_manifest_table(
        spark, _mk(spark, 40, 50), root, "t",
        batch_id="evicted", compact_files_per_bucket=100,
    )
    # shrink the cap so the next stamp evicts "evicted" from the index
    monkeypatch.setattr(mb, "_RECENT_BATCH_IDS_CAP", 1)
    mb.append_manifest_table(
        spark, _mk(spark, 50, 60), root, "t",
        batch_id="newer", compact_files_per_bucket=100,
    )
    recent = mb.read_manifest(root, "t")["recent_batch_ids"]
    assert [e[0] for e in recent] == ["newer"]  # saturated, evicted
    # the saturated index cannot prove a miss: the walk takes over
    # and still finds the evicted batch
    assert mb._batch_id_published(root, "t", "evicted") == v1


def test_direct_batch_stamp_without_index_is_rejected(spark, table):
    """The write-time guard: a manifest whose batch_id the index
    misses must never reach disk (it would defeat exactly-once)."""
    root = table
    m = dict(mb.read_manifest(root, "t"))
    m["version"] = 99
    m["batch_id"] = "smuggled"
    with pytest.raises(ValueError, match="recent_batch_ids"):
        mb._write_manifest_file(root, "t", m)


def test_multi_table_txn_stamps_index(spark, tmp_path):
    root = str(tmp_path)
    for t in ("a", "b"):
        mb.create_manifest_table(
            spark, _mk(spark, 0, 20), root, t,
            bucket_cols="k", num_buckets=2,
        )
    try:
        mb.commit_multi_table(
            spark, root,
            {"a": _mk(spark, 20, 30), "b": _mk(spark, 20, 25)},
            batch_id="txn9",
        )
        for t in ("a", "b"):
            recent = mb.read_manifest(root, t)["recent_batch_ids"]
            assert [f"txn9:{t}", 1] in [list(e) for e in recent]
            assert mb._batch_id_published(root, t, f"txn9:{t}") == 1
    finally:
        for t in ("a", "b"):
            mb.drop_catalog_entries(spark, root, t)
