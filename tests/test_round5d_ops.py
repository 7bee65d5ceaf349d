"""Invariant tests for the round-5d batch (CDC apply, BOM rollup,
trending decay, path trigrams, regression-residual top-k, SNM
blocking).  Cross-engine parity is covered by test_catalog_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from curw_mike_data_handler_spark import catalog

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_cdc_snapshot_semantics(spark):
    rows = catalog.QUERIES["cdc_apply_changelog"](spark, SF).collect()
    keys = [r.key for r in rows]
    assert len(keys) == len(set(keys)), "one snapshot row per surviving key"
    # tombstoned keys must be absent: recompute last-op from the log
    from curw_mike_data_handler_spark.sources.tables import load_table
    from pyspark.sql import Window

    ev = load_table(spark, SF, "events")
    log = ev.select(
        (F.col("event_id") % 300).alias("key"),
        "event_type",
        F.unix_micros("ts").alias("v"),
        "event_id",
    )
    w = Window.partitionBy("key").orderBy(
        F.col("v").desc(), F.col("event_id").desc()
    )
    last = log.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    deleted = {r.key for r in last.filter("event_type = 'error'").collect()}
    assert deleted.isdisjoint(set(keys)), "last-op-delete keys must vanish"


def test_bom_rollup_conservation(spark):
    rows = catalog.QUERIES["bom_subtree_rollup"](spark, SF).collect()
    part = spark.read.parquet(f"{SF}/part.parquet")
    total = part.select(
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).alias("t")
    ).collect()[0].t
    n = part.count()
    by_anc = {r.ancestor: r for r in rows}
    # the root (0) sees every part exactly once despite chain repeats
    assert by_anc[0].n_desc == n
    assert by_anc[0].subtree_cents == total
    # every node's subtree is contained in its parent's
    for r in rows:
        if r.ancestor > 0:
            parent = by_anc[r.ancestor // 10]
            assert r.n_desc <= parent.n_desc
            assert r.subtree_cents <= parent.subtree_cents


def test_trending_decay_bounds(spark):
    rows = catalog.QUERIES["trending_decay_counts"](spark, SF).collect()
    for r in rows:
        assert 0.0 < r.decayed <= r.n_events, (
            "decay weights are in (0, 1], so the score is bounded by the count"
        )


def test_path_trigrams_ranked(spark):
    rows = sorted(
        catalog.QUERIES["session_path_trigrams"](spark, SF01).collect(),
        key=lambda r: r.rn,
    )
    assert 0 < len(rows) <= 10
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_residual_topk_is_exactly_ranked(spark):
    rows = catalog.QUERIES["a16_regression_residual_topk"](spark, SF01).collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append(r)
    assert set(by_grp) == {"A", "N", "R"}
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, 21))
        # |z| must be non-increasing with rank: the exact integer
        # ranking key is an affine transform of z within a group
        zs = [abs(r.z) for r in rs]
        assert all(a >= b - 1e-9 for a, b in zip(zs, zs[1:]))


def _plan(spark, name, sf=SF):
    import contextlib
    import io

    df = catalog.QUERIES[name](spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_cdc_single_key_exchange(spark):
    # both windows and the final projection ride ONE hash(key) exchange
    plan = _plan(spark, "cdc_apply_changelog")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bom_rollup_no_join_one_aggregate(spark):
    plan = _plan(spark, "bom_subtree_rollup")
    assert "Join" not in plan, "ancestor chain must not become a join"
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Generate explode" in plan


def test_trigrams_share_user_exchange(spark):
    # session-id window + lag chain refine the same hash(user) keys;
    # the only other exchanges are the tiny census rollup + its
    # single-partition ranking window
    plan = _plan(spark, "session_path_trigrams")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_a16_broadcast_model_and_group_limit(spark):
    plan = _plan(spark, "a16_regression_residual_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan, "rank<=20 must prune before full sort"


def test_snm_pairs_subset_of_exhaustive_edit1(spark):
    snm = {
        (r.word_a, r.word_b)
        for r in catalog.QUERIES["snm_candidate_pairs"](spark, SF01).collect()
    }
    assert snm, "sf0.01 part vocabulary contains edit-1 neighbors"
    # FastSS (fuzzy_join_edit1) has exact recall over the same vocab:
    # every SNM survivor must appear there (SNM trades recall for a
    # w·|vocab| candidate bound; verified pairs are always true pairs)
    full = {
        (r.word_a, r.word_b)
        for r in catalog.QUERIES["fuzzy_join_edit1"](spark, SF01).collect()
    }
    assert snm <= full
    for a, b in snm:
        assert a < b


def test_sliding_distinct_matches_bruteforce(spark):
    out = {
        r.day: r.distinct_users
        for r in catalog.QUERIES["sliding_distinct_users"](spark, SF).collect()
    }
    from curw_mike_data_handler_spark.sources.tables import load_table

    ud = (
        load_table(spark, SF, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .collect()
    )
    import datetime

    by_day: dict[str, set] = {}
    for r in ud:
        for k in range(7):
            day = (r.d + datetime.timedelta(days=k)).strftime("%Y-%m-%d")
            by_day.setdefault(day, set()).add(r.user_id)
    assert out == {d: len(s) for d, s in by_day.items()}
