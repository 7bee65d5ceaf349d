"""Invariant + plan-shape tests for the round-5 statistics batch
(survival / KS / Gini / Mann-Whitney / z-test / drawdown / debounce /
entropy).  Cross-engine value parity is covered by test_catalog_parity;
these pin the mathematical invariants and the shuffle shapes the
operators rely on at scale.
"""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from curw_mike_data_handler_spark import catalog

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return catalog.QUERIES[name](spark, SF).collect()


def _plan(spark, name: str) -> str:
    df = catalog.QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_km_curve_monotone(spark):
    rows = sorted(_rows(spark, "survival_km_curve"), key=lambda r: r.t)
    assert rows, "curve must be non-empty"
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 < r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9, "survival must be non-increasing"
        if prev_n is not None:
            assert r.n_risk < prev_n, "risk set shrinks strictly at event times"
        assert 0 < r.d < r.n_risk
        prev_s, prev_n = r.survival, r.n_risk


def test_ks_statistic_bounds(spark):
    (r,) = _rows(spark, "stats_ks_two_sample")
    assert 0.0 <= r.ks_d <= 1.0
    assert 0 <= r.d_num <= r.n1 * r.n2
    assert abs(r.ks_d - r.d_num / (r.n1 * r.n2)) < 1e-6


def test_gini_bounds(spark):
    rows = _rows(spark, "gini_nation_revenue")
    assert len(rows) == 25
    for r in rows:
        # lower bound is exactly 0 for a 1-customer nation
        assert -1e-9 <= r.gini < 1.0
        assert r.n_customers >= 1


def test_mannwhitney_bounds(spark):
    (r,) = _rows(spark, "stats_mannwhitney")
    assert 0 <= r.u1 <= r.n1 * r.n2
    # z of the same two samples should broadly agree in sign/scale with KS
    assert abs(r.z) < 50


def test_ab_ztest_partition(spark):
    (r,) = _rows(spark, "ab_ztest_orders")
    total = catalog.QUERIES["o1_top10_orders"]  # avoid re-reading table schema
    assert r.na + r.nb == 1500  # sf0.001 orders row count
    assert 0 <= r.xa <= r.na and 0 <= r.xb <= r.nb
    assert abs(r.lift) <= 1.0


def test_max_drawdown_nonnegative_and_tied_to_event(spark):
    rows = _rows(spark, "w14_max_drawdown")
    assert rows
    for r in rows:
        assert r.max_dd_cents >= 0
        assert abs(r.max_dd - r.max_dd_cents / 100.0) < 1e-9


def test_debounce_partitions_events_and_is_idempotent(spark):
    rows = _rows(spark, "events_debounce")
    n_events = sum(r.burst_len for r in rows)
    total = (
        catalog.QUERIES["a5_distinct"](spark, SF).sparkSession.read.parquet(
            f"{SF}/events.parquet"
        )
    ).count()
    assert n_events == total, "bursts must partition the event set"
    # kept events are >gap apart by construction: every burst keeps
    # exactly one representative, and representatives never collide
    keys = [(r.user_id, r.event_type, r.burst_id) for r in rows]
    assert len(keys) == len(set(keys))
    kept = {r.kept_event for r in rows}
    assert len(kept) == len(rows), "one distinct kept event per burst"


def test_entropy_bounds(spark):
    rows = _rows(spark, "entropy_user_mix")
    for r in rows:
        assert -1e-9 <= r.entropy <= math.log(r.n_types) + 1e-9
        assert r.n_types >= 1 and r.n_events >= r.n_types


def test_drawdown_single_exchange(spark):
    # all three windows + the rollup share one hash(user_id) exchange;
    # the only other exchange is the final single-partition collect-side
    plan = _plan(spark, "w14_max_drawdown")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_debounce_single_exchange(spark):
    plan = _plan(spark, "events_debounce")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_km_windows_on_census_only(spark):
    # the single-partition windows must sit ABOVE the per-duration
    # census aggregate (they see |distinct durations| rows, not orders)
    plan = _plan(spark, "survival_km_curve")
    assert "Window" in plan and "HashAggregate" in plan
    first_window = plan.index("Window")
    assert "HashAggregate" in plan[first_window:], (
        "census aggregate must appear below the window in the plan"
    )
