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


def test_merge_with_index_posts_changed_values_atomically(spark, indexed):
    """Round-12 roadmap #2: a value-CHANGING upsert through
    merge_with_index keeps the posting superset property — the new
    values are posted in the same transaction as the base's COW
    rewrite, so a lookup on a value that exists only post-merge is
    complete, and the base merge itself is exact."""
    root = indexed
    # k=10..14 move to brand-new c values; k=9000 is a pure insert
    ups = spark.createDataFrame(
        [(k, 5000 + k, -k) for k in range(10, 15)] + [(9000, 5001, -1)],
        "k long, c long, v long",
    )
    mi.merge_with_index(
        spark, ups, root, "base", "base_by_c", key_cols="k",
        batch_id="mg1", compact_files_per_bucket=100,
    )
    # new values are found through the index…
    assert _lookup_rows(spark, root, 5010) == [(10, 5010, -10)]
    # …including the inserted key's (which shares c=5001 with nothing)
    assert _lookup_rows(spark, root, 5001) == [(9000, 5001, -1)]
    # the moved rows no longer answer their OLD value (stale postings
    # keep the bucket scanned; the equality filter settles the rows) —
    # k=1007/1008 share c=10/11 (k % 997) and stay
    assert _lookup_rows(spark, root, 10) == [(1007, 10, 2014)]
    assert _lookup_rows(spark, root, 11) == [(1008, 11, 2016)]
    # untouched values stay complete
    assert _lookup_rows(spark, root, 5) == sorted(
        (k, k % 997, k * 2) for k in range(2000) if k % 997 == 5
    )
    # the base merge is an exact upsert (plain snapshot agrees)
    plain = mb.read_manifest_table(spark, root, "base")
    assert plain.filter(F.col("k") == 10).collect()[0]["c"] == 5010
    assert plain.count() == 2001
    # replay of the SAME batch_id: no-op at the committed txn version
    v1 = mi.merge_with_index(
        spark, ups, root, "base", "base_by_c", key_cols="k",
        batch_id="mg1", compact_files_per_bucket=100,
    )
    assert mb._txn_batch_published(root, "mg1") == v1


def test_merge_with_index_crash_between_staged_writes(
    spark, indexed, monkeypatch
):
    """Kill the writer AFTER staging one side of the (merge, posting)
    pair but BEFORE the catalog swap: nothing is visible anywhere,
    and the batch_id replay completes the commit exactly-once."""
    root = indexed
    before_new = _lookup_rows(spark, root, 7777)
    before_base = mb.read_manifest_table(spark, root, "base").count()
    orig = mb._write_manifest_file
    staged = []

    def crash_second(root_, table, manifest):
        if staged and table in ("base", "base_by_c"):
            raise RuntimeError("injected crash between staged writes")
        if table in ("base", "base_by_c"):
            staged.append(table)
        return orig(root_, table, manifest)

    ups = spark.createDataFrame([(20, 7777, -20)], "k long, c long, v long")
    monkeypatch.setattr(mb, "_write_manifest_file", crash_second)
    with pytest.raises(RuntimeError, match="between staged writes"):
        mi.merge_with_index(
            spark, ups, root, "base", "base_by_c", key_cols="k",
            batch_id="mcr", compact_files_per_bucket=100,
        )
    monkeypatch.setattr(mb, "_write_manifest_file", orig)
    assert mb.read_manifest_table(spark, root, "base").count() == before_base
    assert _lookup_rows(spark, root, 7777) == before_new
    mi.merge_with_index(
        spark, ups, root, "base", "base_by_c", key_cols="k",
        batch_id="mcr", compact_files_per_bucket=100,
    )
    assert _lookup_rows(spark, root, 7777) == [(20, 7777, -20)]
    assert mb.read_manifest_table(spark, root, "base").count() == before_base


def test_commit_multi_table_merge_validation(spark, indexed):
    root = indexed
    ups = spark.createDataFrame([(1, 1, 1)], "k long, c long, v long")
    with pytest.raises(ValueError, match="both appends and merges"):
        mb.commit_multi_table(
            spark, root, {"base": ups},
            merges={"base": {"updates": ups, "key_cols": "k"}},
        )
    with pytest.raises(ValueError, match="no tables to commit"):
        mb.commit_multi_table(spark, root, {})
    # merge keys must cover the bucket columns (same rule as the
    # single-table merge — bucket pruning needs the row's bucket)
    with pytest.raises(ValueError, match="bucket columns"):
        mi.merge_with_index(
            spark, ups, root, "base", "base_by_c", key_cols="c",
        )


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


def test_merge_with_index_rewrites_only_touched_buckets(spark, indexed):
    """Plan-shape guard for the STAGED merge (r12): the transactional
    merge must keep the single-table merge's exact bucket pruning —
    one updated key rewrites exactly its bucket's files, everything
    else hard-links (at 100 TB this is the difference between a
    bounded rewrite and a table-wide one)."""
    root = indexed
    m0 = mb.read_manifest(root, "base")
    ups = spark.createDataFrame([(42, 4242, -42)], "k long, c long, v long")
    b42 = spark.createDataFrame([(42,)], "k long").select(
        mb.spark_bucket_id(m0["num_buckets"], "k").alias("b")
    ).collect()[0]["b"]
    touched = [f for f in m0["files"] if mb._file_bucket(f) == b42]
    mi.merge_with_index(
        spark, ups, root, "base", "base_by_c", key_cols="k",
        compact_files_per_bucket=100,
    )
    m1 = mb.read_manifest(root, "base")
    assert m1["op"] == "merge"
    assert m1["rewritten_files"] == len(touched)
    assert m1["linked_files"] == len(m0["files"]) - len(touched)
    # hard links, not copies: untouched files share inodes with the
    # parent generation
    import os as _os

    tdir = mb._table_dir(root, "base")
    shared = 0
    for f in m0["files"]:
        if mb._file_bucket(f) == b42:
            continue
        p0 = _os.path.join(tdir, m0["generation"], f)
        p1 = _os.path.join(tdir, m1["generation"], f)
        if _os.path.exists(p1) and _os.stat(p0).st_ino == _os.stat(p1).st_ino:
            shared += 1
    assert shared == len(m0["files"]) - len(touched)


def test_txn_path_compacts_past_the_bucket_bound(spark, indexed):
    """Review regression (r12): indexed tables are maintained
    EXCLUSIVELY through commit_multi_table, which used to defer
    compaction to 'later appends' that can never come — the file
    count grew one per bucket per commit and compact_files_per_bucket
    was a dead knob.  The amortized compaction now runs after the
    catalog swap, so both base and index file counts stay bounded
    across a chain of transactional commits."""
    root = indexed
    for i in range(4):
        mi.append_with_index(
            spark, _mk(spark, 2000 + i * 50, 2050 + i * 50),
            root, "base", "base_by_c", compact_files_per_bucket=2,
        )
    for t in ("base", "base_by_c"):
        m = mb.read_manifest(root, t)
        assert max(mb.files_per_bucket(m).values()) <= 2, (
            t, mb.files_per_bucket(m),
        )
    # compaction is content-preserving and the txn pins pre-compaction
    # versions: the atomic lookup still answers exactly
    want = sorted((k, k % 997, k * 2) for k in range(2200) if k % 997 == 5)
    assert _lookup_rows(spark, root, 5) == want


def test_index_random_walk_lookups_match_model(spark, tmp_path):
    """Model-based walk over the MAINTAINED write surface (round 12):
    interleave append_with_index / merge_with_index (value-changing
    and inserting) / key deletes, and after every step check indexed
    point lookups against a plain dict model for a probe set that
    includes moved-away values, post-merge-only values, and absent
    values — the superset property must hold at every intermediate
    version, not just the end state."""
    import random

    rng = random.Random(20260817)
    root = str(tmp_path)
    model: dict[int, tuple[int, int]] = {}  # k -> (c, v)
    next_k = 0

    def fresh(n):
        nonlocal next_k
        rows = [(k, rng.randrange(50), k) for k in range(next_k, next_k + n)]
        next_k += n
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, c long, v long")

    init = fresh(150)
    mb.create_manifest_table(
        spark, df_of(init), root, "base",
        bucket_cols="k", num_buckets=4, sort_cols="k",
    )
    model.update({k: (c, v) for k, c, v in init})
    mi.create_manifest_index(spark, root, "base", "ix", column="c")

    def check():
        # probe live values, recently vacated ones, and a never-seen
        # value; the lookup must equal the model's filter exactly
        live = sorted({c for c, _ in model.values()})
        probes = set(rng.sample(live, min(4, len(live)))) | {98765, 49}
        for c in probes:
            got = sorted(
                (r["k"], r["v"])
                for r in mi.read_manifest_point_indexed(
                    spark, root, "base", "ix", c
                ).collect()
            )
            want = sorted(
                (k, v) for k, (cc, v) in model.items() if cc == c
            )
            assert got == want, f"value {c}: {got} != {want}"

    check()
    try:
        for step in range(10):
            op = rng.choice(["append", "merge_change", "merge_insert",
                             "delete"])
            if op == "append":
                rows = fresh(rng.randrange(5, 25))
                mi.append_with_index(
                    spark, df_of(rows), root, "base", "ix",
                    compact_files_per_bucket=100,
                )
                model.update({k: (c, v) for k, c, v in rows})
            elif op == "merge_change" and model:
                # move existing keys to values 100.. (never in fresh's
                # 0..49 range): post-merge-only values must resolve
                keys = rng.sample(sorted(model), min(6, len(model)))
                rows = [(k, 100 + rng.randrange(20), -k) for k in keys]
                mi.merge_with_index(
                    spark, df_of(rows), root, "base", "ix", key_cols="k",
                    compact_files_per_bucket=100,
                )
                model.update({k: (c, v) for k, c, v in rows})
            elif op == "merge_insert":
                rows = fresh(rng.randrange(1, 6)) + (
                    [(k, 100 + rng.randrange(20), -k)
                     for k in rng.sample(sorted(model),
                                         min(3, len(model)))]
                    if model else []
                )
                mi.merge_with_index(
                    spark, df_of(rows), root, "base", "ix", key_cols="k",
                    compact_files_per_bucket=100,
                )
                model.update({k: (c, v) for k, c, v in rows})
            elif op == "delete" and model:
                doomed = rng.sample(sorted(model), min(4, len(model)))
                mb.delete_manifest_rows(
                    spark,
                    spark.createDataFrame([(k,) for k in doomed],
                                          "k long"),
                    root, "base", key_cols="k",
                )
                # key deletes happen OUTSIDE the txn: pin the new base
                # so the atomic lookup sees it (the index needs no
                # maintenance — vacated postings are the harmless
                # superset)
                mb.pin_tables_txn(root, ["base"])
                for k in doomed:
                    model.pop(k)
            else:
                continue
            check()
    finally:
        mb.drop_catalog_entries(spark, root, "base")
        mb.drop_catalog_entries(spark, root, "ix")


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
