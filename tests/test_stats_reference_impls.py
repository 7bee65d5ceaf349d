"""Independent pure-Python reference implementations of the round-5
statistics operators, compared against the Spark results.

The DuckDB oracles prove ENGINE parity (same formula, two engines);
these prove the FORMULA: Kaplan-Meier against a direct product over
the raw customer table, KS/Mann-Whitney against textbook definitions
computed from raw value lists, Gini against the sorted-sum definition
— three independently-written computations per statistic in total.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from curw_mike_data_handler_spark import catalog

SF = "/root/testdata/sf0.01"


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_km_against_direct_product(spark):
    rows = {r.t: r for r in catalog.QUERIES["survival_km_curve"](spark, SF).collect()}
    # raw lifetimes straight from parquet, no SQL shared with the oracle
    life = _duck(f"""
        SELECT date_diff('day', min(o_orderdate), max(o_orderdate)),
               CASE WHEN max(o_orderdate) <
                    (SELECT max(o_orderdate) FROM '{SF}/orders.parquet')
                    - INTERVAL 180 DAY THEN 1 ELSE 0 END
        FROM '{SF}/orders.parquet' GROUP BY o_custkey
    """)
    durs = sorted({d for d, _ in life})
    s = 1.0
    for t in durs:
        n_risk = sum(1 for d, _ in life if d >= t)
        d_ev = sum(1 for d, e in life if d == t and e == 1)
        if d_ev == 0 or d_ev >= n_risk:
            continue
        s *= 1.0 - d_ev / n_risk
        r = rows[t]
        assert r.n_risk == n_risk and r.d == d_ev
        assert abs(r.survival - s) < 2e-6, (t, r.survival, s)
    assert set(rows) == {
        t for t in durs
        if 0 < sum(1 for d, e in life if d == t and e == 1)
        < sum(1 for d, _ in life if d >= t)
    }


def _two_samples():
    vals = _duck(f"""
        SELECT event_type, CAST(round(value * 100) AS BIGINT)
        FROM '{SF}/events.parquet' WHERE event_type IN ('view', 'purchase')
    """)
    xs = sorted(v for t, v in vals if t == "view")
    ys = sorted(v for t, v in vals if t == "purchase")
    return xs, ys


def test_ks_against_textbook(spark):
    (r,) = catalog.QUERIES["stats_ks_two_sample"](spark, SF).collect()
    xs, ys = _two_samples()
    n1, n2 = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    cx = cy = i = j = 0
    d = 0.0
    for v in grid:
        while i < n1 and xs[i] <= v:
            i += 1
        while j < n2 and ys[j] <= v:
            j += 1
        d = max(d, abs(i / n1 - j / n2))
    assert (r.n1, r.n2) == (n1, n2)
    assert abs(r.ks_d - d) < 2e-6


def test_mannwhitney_against_textbook(spark):
    (r,) = catalog.QUERIES["stats_mannwhitney"](spark, SF).collect()
    xs, ys = _two_samples()
    n1, n2 = len(xs), len(ys)
    pooled = sorted(xs + ys)
    # midranks
    rank_of: dict[int, float] = {}
    k = 0
    for v, cnt in sorted(Counter(pooled).items()):
        rank_of[v] = k + (cnt + 1) / 2.0
        k += cnt
    r1 = sum(rank_of[v] for v in xs)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    ties = Counter(pooled)
    tie3 = sum(t**3 - t for t in ties.values())
    var = (n1 * n2 / 12.0) * (
        (n1 + n2 + 1) - tie3 / ((n1 + n2) * (n1 + n2 - 1))
    )
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert abs(r.u1 - u1) < 1e-6
    assert abs(r.z - z) < 2e-6


def test_gini_against_sorted_sum(spark):
    rows = {r.nationkey: r for r in
            catalog.QUERIES["gini_nation_revenue"](spark, SF).collect()}
    rev = _duck(f"""
        SELECT c.c_nationkey, CAST(sum(round(o.o_totalprice * 100)) AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    """)
    by_nation: dict[int, list[int]] = {}
    for nk, x in rev:
        by_nation.setdefault(nk, []).append(x)
    for nk, xs in by_nation.items():
        xs.sort()
        n, sx = len(xs), sum(xs)
        g = (2.0 * sum((i + 1) * x for i, x in enumerate(xs))
             - (n + 1) * sx) / (n * sx)
        r = rows[nk]
        assert r.n_customers == n
        assert abs(r.gini - g) < 2e-6
