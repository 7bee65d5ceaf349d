"""Multi-table atomic commit (round 11): per-table appends publish
first, one root-level txn-catalog pointer swap pins {table: version}
LAST — crash anywhere in between and an atomic reader still sees the
previous cross-table snapshot in full, never a mixture; the replayed
commit completes with every already-published append deduped by its
batch_id.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb


def _fact(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 10 AS v")


def _dim(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id AS w")


@pytest.fixture()
def two_tables(spark, tmp_path):
    root = str(tmp_path)
    mb.create_manifest_table(spark, _fact(spark, 0, 100), root, "fact",
                             bucket_cols="k", num_buckets=2)
    mb.create_manifest_table(spark, _dim(spark, 0, 10), root, "dim",
                             bucket_cols="k", num_buckets=2)
    yield root
    mb.drop_catalog_entries(spark, root, "fact")
    mb.drop_catalog_entries(spark, root, "dim")


def _counts(spark, root):
    snap = mb.read_tables_atomic(spark, root, ["fact", "dim"])
    return snap["fact"].count(), snap["dim"].count()


def test_commit_and_atomic_read(spark, two_tables):
    root = two_tables
    v0 = mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 100, 150), "dim": _dim(spark, 10, 15)},
        batch_id="t0",
    )
    assert v0 == 0
    assert _counts(spark, root) == (150, 15)
    cat = mb.read_txn_catalog(root)
    assert cat["version"] == 0 and cat["batch_id"] == "t0"
    assert set(cat["tables"]) == {"fact", "dim"}
    # second commit advances; time travel pins the first group
    v1 = mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 150, 160), "dim": _dim(spark, 15, 16)},
        batch_id="t1",
    )
    assert v1 == 1
    assert _counts(spark, root) == (160, 16)
    old = mb.read_tables_atomic(spark, root, ["fact", "dim"], txn_version=0)
    assert (old["fact"].count(), old["dim"].count()) == (150, 15)
    # a table never committed through a txn is refused loudly
    mb.create_manifest_table(spark, _dim(spark, 0, 5), root, "loose",
                             bucket_cols="k", num_buckets=2)
    try:
        with pytest.raises(KeyError, match="never been committed"):
            mb.read_tables_atomic(spark, root, ["fact", "loose"])
    finally:
        mb.drop_catalog_entries(spark, root, "loose")


def test_crash_mid_staging_leaves_nothing_visible_anywhere(
    spark, two_tables, monkeypatch
):
    """THE verdict-#3 crash injection, strengthened by the staged
    design: kill the writer after the FIRST table's batch is staged.
    Nothing was published to ANY read path — not the atomic view, not
    even the single-table reads (the review's torn-mixture scenario,
    where a later transaction pinned a crashed one's half-published
    batch, is impossible because uncommitted batches never enter the
    chain).  The retry re-stages from scratch, exactly once."""
    root = two_tables
    mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 100, 150), "dim": _dim(spark, 10, 15)},
        batch_id="base",
    )
    orig = mb._write_manifest_file
    staged: list[str] = []

    def crash_after_first(root_, table, manifest):
        orig(root_, table, manifest)
        staged.append(table)
        if len(staged) == 1:
            raise RuntimeError("injected crash mid-staging")

    monkeypatch.setattr(mb, "_write_manifest_file", crash_after_first)
    with pytest.raises(RuntimeError, match="injected crash"):
        mb.commit_multi_table(
            spark, root,
            {"fact": _fact(spark, 150, 200), "dim": _dim(spark, 15, 20)},
            batch_id="tx-crash",
        )
    # dim staged first (sorted order) — but NOTHING is visible, on any
    # read path: all-old everywhere
    assert staged == ["dim"]
    assert _counts(spark, root) == (150, 15)
    assert mb.read_manifest_table(spark, root, "dim").count() == 15
    assert mb.read_manifest_table(spark, root, "fact").count() == 150
    # no claim debris anywhere (the exception path released them)
    for t in ("fact", "dim", mb._TXN):
        mdir = os.path.join(root, t, "manifests")
        if os.path.isdir(mdir):
            assert not [f for f in os.listdir(mdir)
                        if f.startswith("claim-")]

    # the crash-retry: nothing of the crashed attempt was visible, so
    # the commit simply re-stages both tables and lands exactly once
    monkeypatch.setattr(mb, "_write_manifest_file", orig)
    v = mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 150, 200), "dim": _dim(spark, 15, 20)},
        batch_id="tx-crash",
    )
    assert _counts(spark, root) == (200, 20)
    # exactly once: no duplicate keys in either table
    snap = mb.read_tables_atomic(spark, root, ["fact", "dim"])
    for t in ("fact", "dim"):
        assert snap[t].count() == snap[t].select("k").distinct().count()
    # a second replay of the completed txn is a version-stable no-op
    assert mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 150, 200), "dim": _dim(spark, 15, 20)},
        batch_id="tx-crash",
    ) == v
    assert _counts(spark, root) == (200, 20)


def test_crashed_txn_is_never_pinned_by_later_transactions(
    spark, two_tables, monkeypatch
):
    """Review regression (the second pass's top txn finding): under
    the old publish-then-swap flow, a crashed T1's half-published fact
    batch entered the chain, and a later T2 pinning fact past it
    exposed T1's fact rows without T1's dim rows.  Staging makes that
    impossible: T1's crashed batch was never in the chain, so T2's
    commit contains exactly T2."""
    root = two_tables
    t1_rows = set(range(500, 520))
    orig = mb._write_manifest_file

    def crash_fact(root_, table, manifest):
        orig(root_, table, manifest)
        if table == "fact":
            raise RuntimeError("T1 dies after staging fact")

    monkeypatch.setattr(mb, "_write_manifest_file", crash_fact)
    with pytest.raises(RuntimeError, match="T1 dies"):
        mb.commit_multi_table(
            spark, root,
            {"fact": _fact(spark, 500, 520)},  # fact-only: stages fact
            batch_id="t1",
        )
    monkeypatch.setattr(mb, "_write_manifest_file", orig)
    # T2 commits on the same tables — and must NOT carry T1's rows
    mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 900, 910), "dim": _dim(spark, 10, 12)},
        batch_id="t2",
    )
    snap = mb.read_tables_atomic(spark, root, ["fact", "dim"])
    fact_ks = {r["k"] for r in snap["fact"].collect()}
    assert not (fact_ks & t1_rows), (
        "a later transaction exposed the crashed T1's half-staged batch"
    )
    assert set(range(900, 910)) <= fact_ks
    assert mb.read_manifest_table(spark, root, "fact").count() == 110
    # T1's replay still lands its batch exactly once afterwards
    mb.commit_multi_table(spark, root,
                          {"fact": _fact(spark, 500, 520)}, batch_id="t1")
    snap2 = mb.read_tables_atomic(spark, root, ["fact"])
    ks2 = {r["k"] for r in snap2["fact"].collect()}
    assert t1_rows <= ks2
    assert snap2["fact"].count() == snap2["fact"].select("k").distinct().count()


def test_crash_between_catalog_swap_and_roll_forward_repairs(
    spark, two_tables, monkeypatch
):
    """Crash AFTER the catalog swap (the commit point) but BEFORE the
    per-table LATEST roll-forward: atomic readers already see the full
    new snapshot (the commit happened); single-table LATEST lags until
    the next writer completes the roll-forward."""
    root = two_tables
    orig = mb._swap_latest

    def crash(root_, table, version):
        raise RuntimeError("dies before roll-forward")

    monkeypatch.setattr(mb, "_swap_latest", crash)
    with pytest.raises(RuntimeError, match="before roll-forward"):
        mb.commit_multi_table(
            spark, root,
            {"fact": _fact(spark, 100, 130), "dim": _dim(spark, 10, 13)},
            batch_id="tx",
        )
    monkeypatch.setattr(mb, "_swap_latest", orig)
    # the commit POINT passed: atomic view is all-new
    assert _counts(spark, root) == (130, 13)
    # single-table LATEST lags (crash window), version pinned anyway
    assert mb.read_manifest_table(spark, root, "fact").count() == 100
    # any later writer completes the roll-forward and builds on top
    mb.append_manifest_table(spark, _fact(spark, 130, 140), root, "fact",
                             compact_files_per_bucket=100)
    assert mb.read_manifest_table(spark, root, "fact").count() == 140
    fact = mb.read_manifest_table(spark, root, "fact")
    assert fact.count() == fact.select("k").distinct().count()
    # dim repairs on its next write too
    mb.append_manifest_table(spark, _dim(spark, 13, 14), root, "dim",
                             compact_files_per_bucket=100)
    assert mb.read_manifest_table(spark, root, "dim").count() == 14


def test_crash_before_catalog_swap_then_retry(spark, two_tables, monkeypatch):
    """Both tables published, writer dies BEFORE the catalog pointer
    swap: atomic readers still all-old; the retry dedupes both appends
    and only swaps the pointer."""
    root = two_tables
    mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 100, 110), "dim": _dim(spark, 10, 11)},
        batch_id="base",
    )
    orig = mb._publish_txn

    def crash(root_, cat):
        raise RuntimeError("injected crash before catalog swap")

    monkeypatch.setattr(mb, "_publish_txn", crash)
    with pytest.raises(RuntimeError, match="before catalog swap"):
        mb.commit_multi_table(
            spark, root,
            {"fact": _fact(spark, 110, 120), "dim": _dim(spark, 11, 12)},
            batch_id="tx2",
        )
    assert _counts(spark, root) == (110, 11)  # all-old
    monkeypatch.setattr(mb, "_publish_txn", orig)
    mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 110, 120), "dim": _dim(spark, 11, 12)},
        batch_id="tx2",
    )
    assert _counts(spark, root) == (120, 12)
    snap = mb.read_tables_atomic(spark, root, ["fact", "dim"])
    for t in ("fact", "dim"):
        assert snap[t].count() == snap[t].select("k").distinct().count()


def test_expire_never_removes_txn_pinned_version(spark, two_tables):
    """Retention composes with the txn catalog: the version an atomic
    reader resolves stays readable even when it falls outside the
    per-table keep window."""
    root = two_tables
    mb.commit_multi_table(
        spark, root, {"fact": _fact(spark, 100, 120)}, batch_id="pin",
    )
    pinned = mb.read_txn_catalog(root)["tables"]["fact"]
    # advance fact far past the keep window OUTSIDE any txn
    for i in range(3):
        mb.append_manifest_table(
            spark, _fact(spark, 200 + i * 10, 210 + i * 10), root, "fact",
            compact_files_per_bucket=100,
        )
    expired = mb.expire_generations(spark, root, "fact", keep=1)
    assert pinned not in expired
    # the atomic snapshot still reads the pinned version exactly
    snap = mb.read_tables_atomic(spark, root, ["fact"])
    assert snap["fact"].count() == 120


def test_concurrent_commits_serialize(spark, two_tables):
    """Two threads committing to the same tables: the claim CAS
    serializes both the per-table appends and the catalog swaps — both
    transactions land, in some order, each atomic."""
    import threading

    root = two_tables
    errors: list = []

    def committer(tag: str, lo: int):
        try:
            mb.commit_multi_table(
                spark, root,
                {"fact": _fact(spark, lo, lo + 10),
                 "dim": _dim(spark, lo, lo + 5)},
                batch_id=tag,
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=committer, args=(f"c{i}", 1000 * (i + 1)))
        for i in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    cat = mb.read_txn_catalog(root)
    assert cat["version"] == 1  # two commits, two catalog versions
    assert _counts(spark, root) == (120, 20)
    snap = mb.read_tables_atomic(spark, root, ["fact", "dim"])
    for t in ("fact", "dim"):
        assert snap[t].count() == snap[t].select("k").distinct().count()


def test_post_commit_compaction_failure_does_not_fail_the_txn(
    spark, two_tables, monkeypatch
):
    """Review regression (r12): the amortized compaction runs AFTER
    the durable catalog swap — a failure there must not surface as a
    transaction failure, or a batch_id-less caller's natural retry
    would re-apply the committed batch (duplicate rows, no error)."""
    root = two_tables

    def boom(*a, **kw):
        raise RuntimeError("injected compaction failure")

    monkeypatch.setattr(mb, "_maybe_compact", boom)
    v = mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 100, 120), "dim": _dim(spark, 10, 12)},
        compact_files_per_bucket=1,  # would certainly fire
    )
    assert isinstance(v, int)
    assert _counts(spark, root) == (120, 12)
    # the bound re-fires on the next commit once compaction works
    monkeypatch.undo()
    mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 120, 140), "dim": _dim(spark, 12, 14)},
        compact_files_per_bucket=1,
    )
    for t in ("fact", "dim"):
        m = mb.read_manifest(root, t)
        assert max(mb.files_per_bucket(m).values()) <= 1
    assert _counts(spark, root) == (140, 14)


def test_reserved_table_names_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="reserved"):
        mb.create_manifest_table(
            spark, _dim(spark, 0, 5), str(tmp_path), "_txn",
            bucket_cols="k", num_buckets=2,
        )


def test_interleaved_commits_never_pin_backward(spark, two_tables):
    """Review regression (the round's top finding): T1 and T2 both
    append to fact; T2's catalog swap lands FIRST pinning fact at the
    later version.  T1's later swap must keep that pin (monotone max),
    not roll it back to T1's own earlier fact version — a backward pin
    would tear T2's atomicity (its dim visible, its fact rows not).
    Simulated deterministically: T1's per-table append lands, T2 runs
    whole, then T1's commit resumes (its append dedupes by batch_id to
    the LANDED version, not the head)."""
    root = two_tables
    # T1's append lands first (as if T1 crashed before its swap)
    v_t1_fact = mb.append_manifest_table(
        spark, _fact(spark, 100, 110), root, "fact",
        batch_id="t1:fact", compact_files_per_bucket=100,
    )
    # T2 commits whole on top
    mb.commit_multi_table(
        spark, root,
        {"fact": _fact(spark, 200, 210), "dim": _dim(spark, 10, 12)},
        batch_id="t2",
    )
    cat_after_t2 = mb.read_txn_catalog(root)
    assert cat_after_t2["tables"]["fact"] > v_t1_fact
    # T1 resumes: its fact append dedupes to v_t1_fact; the swap must
    # NOT move fact's pin backward past T2's
    mb.commit_multi_table(
        spark, root, {"fact": _fact(spark, 100, 110)}, batch_id="t1",
    )
    cat = mb.read_txn_catalog(root)
    assert cat["tables"]["fact"] >= cat_after_t2["tables"]["fact"], (
        "T1's replayed swap rolled fact's pin backward, tearing T2"
    )
    snap = mb.read_tables_atomic(spark, root, ["fact", "dim"])
    ks = {r["k"] for r in snap["fact"].collect()}
    # both T1's and T2's fact batches visible atomically
    assert set(range(100, 110)) <= ks and set(range(200, 210)) <= ks
    assert snap["dim"].count() == 12


def test_completed_txn_replay_after_later_txns_is_pure_noop(spark, two_tables):
    """Review regression: the batch-id dedupe must walk the catalog
    CHAIN — a head-only check would let a replay of txn A arriving
    after txn B re-run the swap and re-pin A's stale versions."""
    root = two_tables
    va = mb.commit_multi_table(
        spark, root, {"fact": _fact(spark, 100, 110)}, batch_id="a",
    )
    vb = mb.commit_multi_table(
        spark, root, {"fact": _fact(spark, 110, 120)}, batch_id="b",
    )
    head = mb.read_txn_catalog(root)
    # replay of A: returns A's catalog version, changes NOTHING
    assert mb.commit_multi_table(
        spark, root, {"fact": _fact(spark, 100, 110)}, batch_id="a",
    ) == va
    assert mb.read_txn_catalog(root) == head
    assert mb.read_tables_atomic(spark, root, ["fact"])["fact"].count() == 120
    assert vb == head["version"]


def test_txn_time_travel_survives_expire_until_catalog_expiry(
    spark, two_tables
):
    """Review regression: versions pinned by OLDER retained catalogs
    (txn time travel) must survive expire_generations; expiring the
    catalogs themselves (expire_txn_catalogs) is what releases them."""
    root = two_tables
    mb.commit_multi_table(spark, root, {"fact": _fact(spark, 100, 120)},
                          batch_id="old")
    pinned_old = mb.read_txn_catalog(root)["tables"]["fact"]
    for i in range(3):
        mb.commit_multi_table(
            spark, root, {"fact": _fact(spark, 200 + 10 * i, 210 + 10 * i)},
            batch_id=f"new{i}",
        )
    expired = mb.expire_generations(spark, root, "fact", keep=1)
    assert pinned_old not in expired
    old_snap = mb.read_tables_atomic(spark, root, ["fact"], txn_version=0)
    assert old_snap["fact"].count() == 120
    # retire the old catalogs: their pins become expirable
    dropped = mb.expire_txn_catalogs(root, keep=1)
    assert 0 in dropped
    expired2 = mb.expire_generations(spark, root, "fact", keep=1)
    assert pinned_old in expired2
    with pytest.raises(FileNotFoundError):
        mb.read_tables_atomic(spark, root, ["fact"], txn_version=0)
