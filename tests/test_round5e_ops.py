"""Invariant tests for the round-5e batch (time-series, affinity,
governance, eval widening).  Cross-engine parity is covered by
test_catalog_parity; these attest the semantics the oracle can't —
identity-vs-simulation equivalence, conservation laws, plan shapes.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from curw_mike_data_handler_spark import catalog
from curw_mike_data_handler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_clamped_balance_identity_equals_simulation(spark):
    """The prefix-min identity must agree with the sequential
    floor-clamp simulation row for row — the whole point of the
    operator is replacing that loop."""
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    rows = sorted(
        ev.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    sim_final: dict[int, int] = {}
    sim_peak: dict[int, int] = defaultdict(int)
    for r in rows:
        d = round(r.value * 100)
        if r.event_type in ("purchase", "error"):
            d = -d
        b = max(0, sim_final.get(r.user_id, 0) + d)
        sim_final[r.user_id] = b
        sim_peak[r.user_id] = max(sim_peak[r.user_id], b)
    out = {
        r.user_id: r
        for r in catalog.QUERIES["clamped_running_balance"](spark, SF).collect()
    }
    assert set(out) == set(sim_final)
    for uid, r in out.items():
        assert r.final_balance == round(sim_final[uid] / 100.0, 2), uid
        assert r.peak_balance == round(sim_peak[uid] / 100.0, 2), uid


def test_cusum_changepoint_matches_bruteforce(spark):
    ev = load_table(spark, SF, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    by_type = defaultdict(list)
    for r in ev.collect():
        by_type[r.event_type].append((r.ts, r.event_id, round(r.value * 100)))
    expected = {}
    for t, obs in by_type.items():
        obs.sort(key=lambda x: (x[0], x[1]))
        n = len(obs)
        tot = sum(v for _, _, v in obs)
        s, best, best_ts = 0, -1, None
        for ts, _eid, v in obs:
            s += v * n - tot
            if abs(s) > best:
                best, best_ts = abs(s), ts
        expected[t] = (n, best_ts, round(best / n / 100.0, 6))
    out = catalog.QUERIES["cusum_changepoint"](spark, SF).collect()
    assert len(out) == len(expected)
    for r in out:
        n, ts, peak = expected[r.event_type]
        assert r.n_events == n
        assert r.changepoint_ts == ts.strftime("%Y-%m-%d %H:%M:%S")
        assert r.cusum_peak == peak


def test_theilsen_median_within_slope_range(spark):
    rows = catalog.QUERIES["theilsen_trend"](spark, SF).collect()
    assert rows, "every series present"
    for r in rows:
        assert r.n_pairs == r.n_buckets * (r.n_buckets - 1) // 2
        # a median of slopes on this bounded synthetic data stays small
        assert abs(r.median_slope_per_hour) < 1e4


def test_acf_lag_pairing_respects_gaps(spark):
    """n_pairs at lag k must equal the number of buckets whose k-back
    neighbor EXISTS — not n_buckets − k (the window-lag fallacy on a
    gappy series)."""
    ev = load_table(spark, SF, "events")
    ser = (
        ev.groupBy(
            "event_type",
            (F.unix_micros("ts") / F.lit(catalog.STEP_US)).cast("long").alias("b"),
        )
        .count()
    )
    buckets = defaultdict(set)
    for r in ser.collect():
        buckets[r.event_type].add(r.b)
    out = catalog.QUERIES["ts_autocorrelation"](spark, SF).collect()
    for r in out:
        bs = buckets[r.event_type]
        exact = sum(1 for b in bs if b - r.lag in bs)
        assert r.n_pairs == exact, (r.event_type, r.lag)
        assert -1.0 <= r.acf <= 1.0


def test_m4_envelope_and_conservation(spark):
    out = catalog.QUERIES["m4_downsample"](spark, SF).collect()
    ev_n = load_table(spark, SF, "events").count()
    assert sum(r.n for r in out) == ev_n, "every row in exactly one bucket"
    for r in out:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max


def test_scd2_snapshot_exactly_one_state_per_user_day(spark):
    out = catalog.QUERIES["scd2_daily_snapshot"](spark, SF).collect()
    seen = set()
    per_user_days = defaultdict(list)
    for r in out:
        key = (r.user_id, r.day)
        assert key not in seen, "duplicate (user, day) snapshot"
        seen.add(key)
        per_user_days[r.user_id].append(r.day)
    # day coverage per user is contiguous (no gaps between first and last)
    from datetime import date, timedelta

    for uid, days in per_user_days.items():
        ds = sorted(date.fromisoformat(d) for d in days)
        span = (ds[-1] - ds[0]).days + 1
        assert len(ds) == span, f"gap in user {uid} snapshot days"
        assert ds[-1] + timedelta(days=0) >= ds[0]


def test_target_encode_loo_reconstruction(spark):
    """loo·(n−1) + y must reconstruct the segment total for every row."""
    out = catalog.QUERIES["target_encode_loo"](spark, SF)
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("y")
    )
    j = out.join(o, "o_orderkey")
    seg = j.groupBy("segment").agg(
        F.count("*").alias("n"), F.sum("y").alias("tot")
    )
    chk = j.join(seg, "segment").select(
        "segment",
        (
            F.col("loo_encoding") * 100.0 * (F.col("n") - 1)
            + F.col("y")
            - F.col("tot")
        ).alias("resid"),
    )
    bad = chk.filter(F.abs(F.col("resid")) > 0.5 * (F.col("n") - 1)).count()
    assert bad == 0, "LOO encoding fails the reconstruction identity"


def test_abc_classes_partition_and_order(spark):
    rows = {r.klass: r for r in catalog.QUERIES["abc_classification"](spark, SF).collect()}
    part_n = (
        load_table(spark, SF, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == part_n
    assert abs(sum(r.rev_share for r in rows.values()) - 1.0) < 1e-5
    if "A" in rows and "C" in rows:
        assert rows["A"].rev_share > rows["C"].rev_share


def test_lorenz_curve_monotone_convex(spark):
    rows = sorted(
        catalog.QUERIES["lorenz_curve_deciles"](spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 10
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    shares = [r.rev_share for r in rows]
    assert shares == sorted(shares), "deciles sorted ascending by revenue"
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)


def test_gdpr_cascade_conservation_and_plan(spark):
    q = catalog.QUERIES["gdpr_erasure_cascade"]
    rows = {r.tbl: r for r in q(spark, SF).collect()}
    c = load_table(spark, SF, "customer")
    assert rows["customer"].n_erased == c.filter("c_acctbal < 0").count()
    for t in ("customer", "orders", "lineitem"):
        base = load_table(spark, SF, t).count()
        assert rows[t].n_erased + rows[t].n_surviving == base
    plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, "erasure cohort must broadcast"


def test_jaccard_overlap_bounds(spark):
    rows = catalog.QUERIES["audience_overlap_jaccard"](spark, SF).collect()
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.both_users <= min(r.sz_a, r.sz_b)


def test_feature_hashing_census_conserves_vocab(spark):
    rows = catalog.QUERIES["feature_hashing_census"](spark, SF).collect()
    assert sum(r.n_features for r in rows) == sum(
        r.load * r.n_buckets for r in rows
    )
    assert sum(r.n_buckets for r in rows) <= 256


def test_confusion_stats_cells_partition_sources(spark):
    rows = catalog.QUERIES["classifier_confusion_stats"](spark, SF).collect()
    d = load_table(spark, SF, "documents")
    per_source = {r.source: r["count"] for r in d.groupBy("source").count().collect()}
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == per_source[r.source]
        assert 0.0 <= r.f1 <= 1.0
        assert -1.0 <= r.cohens_kappa <= 1.0


def test_twa_duration_conservation(spark):
    """Per (series, day): held microseconds = day-end − first event ts."""
    rows = catalog.QUERIES["time_weighted_average"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    first = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
        .collect()
    )
    t0s = {(r.event_type, r.day.isoformat()): r.t0 for r in first}
    day_us = 86_400_000_000
    from datetime import date

    for r in rows:
        t0 = t0s[(r.event_type, r.day)]
        day_start = date.fromisoformat(r.day).toordinal() - date(1970, 1, 1).toordinal()
        day_end_us = (day_start + 1) * day_us
        assert r.held_us == day_end_us - t0, (r.event_type, r.day)


def test_bellman_ford_dominated_by_bfs_and_negative_assortativity(spark):
    """Weighted costs must be reachable exactly where 4-hop BFS from
    the same seeds reaches (same edge relation), and the bipartite
    graph must be disassortative."""
    wp = {r.node: r.min_cost for r in catalog.QUERIES["graph_weighted_paths"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    e0 = li.select(
        F.col("l_suppkey").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 200).alias("b"),
    ).distinct()
    e = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = (
        load_table(spark, SF, "supplier")
        .filter(F.col("s_nationkey") % 5 == 3)
        .select(F.col("s_suppkey").alias("node"))
    )
    from curw_mike_data_handler_spark.operators.graph import bfs_distances

    bfs = {
        r.node: r.dist
        for r in bfs_distances(e, seeds, max_depth=4).collect()
    }
    assert set(wp) == set(bfs), "weighted reach == unweighted reach at equal depth"
    for node, cost in wp.items():
        assert cost >= 0.0
        assert (cost == 0.0) == (bfs[node] == 0)
    r = catalog.QUERIES["graph_assortativity"](spark, SF).collect()[0]
    assert r.assortativity < 0, "bipartite fan-out graph must be disassortative"


def test_trajectory_moves_and_od_conservation(spark):
    """n_moves per user = events−1; total OD flow (pre-limit) + self
    loops = total hops.  Both queries share the hop relation."""
    traj = {r.user_id: r for r in catalog.QUERIES["trajectory_path_length"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    per_user = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    for uid, n in per_user.items():
        if n >= 2:
            assert traj[uid].n_moves == n - 1, uid
            assert traj[uid].total_km >= 0.0
    out = catalog.QUERIES["od_flow_matrix"](spark, SF).collect()
    assert len(out) <= 20
    flows = [r.flow for r in out]
    assert flows == sorted(flows, reverse=True)
    for r in out:
        assert r.src != r.dst
        assert 1 <= r.n_users <= r.flow


def test_token_bucket_python_reference(spark):
    """The applyInPandas fold must match an independent plain-Python
    simulation, and throttling must be non-vacuous at gate params."""
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    rows = sorted(ev.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    import collections

    state = {}
    counts = collections.Counter()
    adm = collections.Counter()
    CAP, RATE = 20_000, 100
    for r in rows:
        t_us = int(r.ts.timestamp() * 1_000_000)
        lvl, prev = state.get(r.user_id, (CAP, None))
        if prev is not None:
            lvl = min(CAP, lvl + (t_us - prev) * RATE // 1_000_000_000)
        cost = round(r.value * 100)
        if lvl >= cost:
            lvl -= cost
            adm[r.user_id] += 1
        counts[r.user_id] += 1
        state[r.user_id] = (lvl, t_us)
    out = {r.user_id: r for r in catalog.QUERIES["token_bucket_throttle"](spark, SF).collect()}
    assert set(out) == set(counts)
    for uid, r in out.items():
        assert r.n_events == counts[uid]
        assert r.n_admitted == adm[uid], uid
        assert r.final_level_cents == state[uid][0], uid
    assert sum(r.n_throttled for r in out.values()) > 0, "vacuous params"


def test_fifo_conservation(spark):
    """Per part: matched quantity == min(total inflow, total outflow)
    — FIFO must allocate every coverable unit exactly once."""
    out = {r.l_partkey: r for r in catalog.QUERIES["fifo_allocation"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_returnflag").isin("N", "R")
    )
    tot = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "N", F.round("l_quantity")).otherwise(0)
            ).alias("tin"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.round("l_quantity")).otherwise(0)
            ).alias("tout"),
        )
        .collect()
    )
    for r in tot:
        want = int(min(r.tin, r.tout))
        got = out[r.l_partkey].matched_qty if r.l_partkey in out else 0
        assert got == want, (r.l_partkey, got, want)


def test_max_concurrency_bruteforce(spark):
    ev = load_table(spark, SF, "events").select("event_type", "ts", "event_id")
    rows = ev.collect()
    from collections import defaultdict

    pts = defaultdict(list)
    for r in rows:
        t = int(r.ts.timestamp() * 1_000_000)
        pts[r.event_type].append((t, 1, r.event_id))
        pts[r.event_type].append((t + 1_800_000_000, -1, r.event_id))
    out = {r.event_type: r for r in catalog.QUERIES["max_concurrency_sweep"](spark, SF).collect()}
    for t, ps in pts.items():
        ps.sort()
        c, peak = 0, 0
        for _, d, _ in ps:
            c += d
            peak = max(peak, c)
        assert out[t].peak_concurrency == peak, t


def test_kcore_reaches_fixpoint_and_subgraph_closed(spark):
    """After 5 rounds: every survivor has deg >= 4 (fixpoint reached)
    and survivor degrees only count edges to other survivors."""
    rows = catalog.QUERIES["graph_kcore"](spark, SF).collect()
    nodes = {r.node for r in rows}
    assert nodes, "4-core must be non-empty on this graph"
    for r in rows:
        assert r.deg >= 4, (r.node, r.deg)
    li = load_table(spark, SF, "lineitem")
    e0 = li.select(
        F.col("l_suppkey").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 200).alias("b"),
    ).distinct().collect()
    from collections import Counter

    deg = Counter()
    for e in e0:
        if e.a in nodes and e.b in nodes:
            deg[e.a] += 1
            deg[e.b] += 1
    for r in rows:
        assert deg[r.node] == r.deg, r.node


def test_wasserstein_matches_pure_python(spark):
    """W1 must equal the textbook sum |F1-F2| dx computed in pure
    Python over the same integer cents."""
    ev = load_table(spark, SF, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).collect()
    a = sorted(round(r.value * 100) for r in ev if r.event_type == "purchase")
    b = sorted(round(r.value * 100) for r in ev if r.event_type == "view")
    vals = sorted(set(a) | set(b))
    import bisect

    n1, n2 = len(a), len(b)
    acc = 0
    for v, nxt in zip(vals, vals[1:]):
        f1 = bisect.bisect_right(a, v)
        f2 = bisect.bisect_right(b, v)
        acc += abs(f1 * n2 - f2 * n1) * (nxt - v)
    want = round(acc / n1 / n2 / 100.0, 6)
    r = catalog.QUERIES["stats_wasserstein_1d"](spark, SF).collect()[0]
    assert (r.n1, r.n2) == (n1, n2)
    assert r.wasserstein == want


def test_chi2_matches_pure_python(spark):
    rows = load_table(spark, SF, "customer").select(
        "c_nationkey", "c_mktsegment"
    ).collect()
    from collections import Counter

    obs = Counter((r.c_nationkey, r.c_mktsegment) for r in rows)
    rtot = Counter(r.c_nationkey for r in rows)
    ctot = Counter(r.c_mktsegment for r in rows)
    n = len(rows)
    acc = 0
    for (rk, ck), o in obs.items():
        num = (o * n - rtot[rk] * ctot[ck]) ** 2 * 10_000
        acc += num // (n * rtot[rk] * ctot[ck])
    want = round(acc / 1e4, 4)
    r = catalog.QUERIES["chi2_independence"](spark, SF).collect()[0]
    assert r.n_cells == len(obs)
    assert r.dof == (len(rtot) - 1) * (len(ctot) - 1)
    assert r.chi2 == want


def test_wavelet_energy_matches_pure_python(spark):
    ev = load_table(spark, SF, "events").collect()
    from collections import defaultdict

    ser = defaultdict(lambda: defaultdict(int))
    for r in ev:
        b = int(r.ts.timestamp() * 1_000_000) // catalog.STEP_US
        ser[r.event_type][b] += round(r.value * 100)
    out = {r.event_type: r for r in catalog.QUERIES["wavelet_energy_levels"](spark, SF).collect()}
    for t, buckets in ser.items():
        level = dict(buckets)
        energies = []
        for _ in range(3):
            nxt, det = defaultdict(int), defaultdict(int)
            for b, s in level.items():
                nxt[b // 2] += s
                det[b // 2] += s if b % 2 == 0 else -s
            energies.append(sum(d * d for d in det.values()))
            level = dict(nxt)
        r = out[t]
        assert r.energy_l1 == round(energies[0] / 1e4, 4), t
        assert r.energy_l2 == round(energies[1] / 1e4, 4), t
        assert r.energy_l3 == round(energies[2] / 1e4, 4), t
