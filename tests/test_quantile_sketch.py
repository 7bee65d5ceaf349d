"""Property tests for the deterministic merge-prune quantile summary
(operators/quantiles.py) — the exact regime, the self-reported error
bound in the approximate regime, mergeability, and state bounds.
"""

from __future__ import annotations

import bisect
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from curw_mike_data_handler_spark.operators.quantiles import (
    MergePruneSummary,
    rank_for,
)


def _true_rank_error(sorted_data: list[int], est: int, rank: int) -> int:
    """0 if ``est`` occupies rank ``rank`` in the multiset, else the
    distance from ``rank`` to est's closest true rank."""
    lo = bisect.bisect_left(sorted_data, est) + 1
    hi = bisect.bisect_right(sorted_data, est)
    if lo <= rank <= hi:
        return 0
    return min(abs(rank - lo), abs(rank - hi))


@given(
    st.lists(st.integers(min_value=-10**9, max_value=10**9),
             min_size=1, max_size=400)
)
@settings(max_examples=150, deadline=None)
def test_exact_regime_is_order_statistic(data):
    """capacity ≥ n ⇒ no compaction ⇒ quantile_at_rank IS the sorted
    multiset's order statistic, for every rank."""
    s = MergePruneSummary(capacity=512)
    s.insert_many(data)
    srt = sorted(data)
    assert s.rank_error_bound() == 0
    assert s.state_items() == len(data)
    for rank in range(1, len(data) + 1):
        assert s.quantile_at_rank(rank) == srt[rank - 1]


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_approximate_regime_honors_self_reported_bound(data):
    """Tight capacity, arbitrary split into partition summaries merged
    in arbitrary order: every estimate's true rank error stays within
    the summary's OWN err bound — the envelope is a hard contract, not
    folklore."""
    n = data.draw(st.integers(min_value=50, max_value=3000))
    seed = data.draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = random.Random(seed)
    values = [rng.randrange(-(10**6), 10**6) for _ in range(n)]
    n_parts = data.draw(st.integers(min_value=1, max_value=8))
    parts = [MergePruneSummary(capacity=32) for _ in range(n_parts)]
    for i, v in enumerate(values):
        parts[i % n_parts].insert(v)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == n
    srt = sorted(values)
    bound = merged.rank_error_bound()
    for num, den in ((1, 2), (9, 10), (99, 100), (1, 100)):
        rank = rank_for(num, den, n)
        est = merged.quantile_at_rank(rank)
        assert _true_rank_error(srt, est, rank) <= bound


def test_weight_conservation_under_compaction():
    """Compaction must conserve total weight exactly: n equals the
    weighted item total at every moment (the odd-element holdback)."""
    s = MergePruneSummary(capacity=16)
    rng = random.Random(3)
    for i in range(1, 2001):
        s.insert(rng.randrange(1000))
        total = sum(len(b) << lvl for lvl, b in enumerate(s.levels))
        assert total == s.n == i


def test_state_is_logarithmic_not_linear():
    """The whole point: state grows O(capacity · log(n/capacity)),
    not O(n)."""
    s = MergePruneSummary(capacity=64)
    rng = random.Random(11)
    s.insert_many(rng.randrange(10**9) for _ in range(100_000))
    # 64 · log2(100000/64) ≈ 64 · 10.6 ≈ 680; assert a safe ceiling
    assert s.state_items() <= 64 * 14
    assert len(s.levels) <= 14


def test_determinism_same_fold_same_answer():
    """Identical insertion chunking ⇒ identical summaries (no RNG in
    compaction) — the property that makes cross-engine/cross-run gate
    checks possible at all."""
    rng = random.Random(5)
    values = [rng.randrange(10**6) for _ in range(5000)]
    outs = []
    for _ in range(2):
        s = MergePruneSummary(capacity=48)
        for i in range(0, len(values), 137):
            s.insert_many(values[i:i + 137])
        outs.append(
            [s.quantile_at_rank(rank_for(q, 100, s.n))
             for q in (1, 25, 50, 75, 90, 99)]
        )
    assert outs[0] == outs[1]


def test_merge_matches_single_summary_in_exact_regime():
    """With no compaction anywhere, merge order is irrelevant and the
    merged summary equals the single-pass one value-for-value."""
    rng = random.Random(9)
    values = [rng.randrange(10**6) for _ in range(900)]
    single = MergePruneSummary(capacity=1024)
    single.insert_many(values)
    chunks = [values[i::7] for i in range(7)]
    parts = []
    for ch in chunks:
        p = MergePruneSummary(capacity=1024)
        p.insert_many(ch)
        parts.append(p)
    rng.shuffle(parts)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    for rank in range(1, 901, 37):
        assert merged.quantile_at_rank(rank) == single.quantile_at_rank(rank)


def test_serialization_round_trip_preserves_everything():
    s = MergePruneSummary(capacity=32)
    rng = random.Random(13)
    s.insert_many(rng.randrange(10**6) for _ in range(10_000))
    s2 = MergePruneSummary.from_state(32, *s.to_state())
    assert s2.n == s.n and s2.err2 == s.err2
    assert s2.levels == s.levels and s2.parities == s.parities
    # and the round-tripped summary keeps folding identically
    more = [rng.randrange(10**6) for _ in range(500)]
    s.insert_many(more)
    s2.insert_many(more)
    assert s.levels == s2.levels and s.err2 == s2.err2


def test_rank_for_matches_sql_integer_formula():
    for n in (1, 2, 3, 10, 99, 100, 101, 10**9):
        assert rank_for(1, 2, n) == (n + 1) // 2
        assert rank_for(9, 10, n) == (9 * n + 9) // 10
        assert rank_for(99, 100, n) == (99 * n + 99) // 100
        assert 1 <= rank_for(1, 100, n) <= n


def test_merge_rejects_capacity_mismatch_and_tiny_capacity():
    with pytest.raises(ValueError):
        MergePruneSummary(capacity=1)
    a, b = MergePruneSummary(capacity=8), MergePruneSummary(capacity=16)
    with pytest.raises(ValueError):
        a.merge(b)


def test_empty_summary_queries_none():
    s = MergePruneSummary(capacity=8)
    assert s.quantile_at_rank(1) is None
    assert s.n == 0 and s.state_items() == 0
