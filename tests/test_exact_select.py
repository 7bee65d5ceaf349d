"""Round-13 distributed exact order-statistic selection (r12 verdict
#1): bit-identity against Spark's holistic ``percentile`` and plan
guards proving the holistic aggregate is gone from the exact-path
gates."""

import random

import pytest
from pyspark.sql import functions as F

from curw_mike_data_handler_spark import catalog
from curw_mike_data_handler_spark.operators.robust import (
    exact_grouped_percentiles,
    select_values_at_ranks,
)

PROBS = [0.0, 0.01, 0.37, 0.49, 0.5, 0.51, 0.9, 0.99, 1.0]


def _ref(df, probs, by):
    q = F.percentile("v", F.array(*[F.lit(p) for p in probs])).alias("q")
    rows = (df.groupBy(*by).agg(q) if by else df.agg(q)).collect()
    return {tuple(r[b] for b in by): list(r["q"]) for r in rows}


def _got(df, probs, by, nb):
    rows = exact_grouped_percentiles(
        df, "v", probs, by=by, num_buckets=nb
    ).collect()
    return {tuple(r[b] for b in by): list(r["__q"]) for r in rows}


def _bit_equal(a, b):
    return len(a) == len(b) and all(
        (x == y) or (x != x and y != y) for x, y in zip(a, b)
    )


@pytest.mark.parametrize(
    "kind,n,ngroups,nb",
    [
        ("int", 400, 3, 4),       # multi-bucket narrowing, tiny buckets
        ("int", 1, 1, 4096),      # single-row group
        ("int", 2, 1, 3),         # two rows: interpolation between them
        ("int_ties", 600, 3, 5),  # heavy ties across bucket boundaries
        ("double", 500, 4, 8),    # double keys (theilsen's slope shape)
        ("double", 3, 2, 2),      # degenerate buckets
    ],
)
def test_bit_identity_vs_holistic_percentile(spark, kind, n, ngroups, nb):
    rng = random.Random(20260818 + n + nb)
    rows = []
    for _ in range(n):
        g = f"g{rng.randrange(ngroups)}"
        if kind == "int":
            v = rng.randrange(-(10**6), 10**6)
        elif kind == "int_ties":
            v = rng.randrange(-5, 6)
        else:
            v = rng.gauss(0, 1e5)
        rows.append((g, v))
    schema = "grp string, v " + (
        "double" if kind == "double" else "long"
    )
    df = spark.createDataFrame(rows, schema)
    ref = _ref(df, PROBS, ["grp"])
    got = _got(df, PROBS, ["grp"], nb)
    assert set(ref) == set(got)
    for g in ref:
        assert _bit_equal(ref[g], got[g]), (g, ref[g], got[g])


def test_bit_identity_global(spark):
    rng = random.Random(7)
    df = spark.createDataFrame(
        [(rng.randrange(0, 100),) for _ in range(300)], "v long"
    )
    ref = _ref(df, [0.01, 0.5, 0.99], [])
    got = _got(df, [0.01, 0.5, 0.99], [], 7)
    assert _bit_equal(ref[()], got[()])


def test_nulls_ignored_like_percentile(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("a", None), ("a", 5)],
        "grp string, v long",
    )
    ref = _ref(df, [0.5], ["grp"])
    got = _got(df, [0.5], ["grp"], 4)
    assert _bit_equal(ref[("a",)], got[("a",)])


def test_weighted_rank_selection_matches_window_formula(spark):
    """select_values_at_ranks at rank ⌈tw/2⌉ == the lower weighted
    median the previous window formulation computed (min v with
    2·cum ≥ total), including zero-weight values."""
    rng = random.Random(99)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(-50, 50), rng.randrange(0, 5))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, __v long, __w long")
    from pyspark.sql import Window

    g = df.groupBy("grp", "__v").agg(F.sum("__w").alias("w"))
    cum = g.select(
        "grp",
        "__v",
        F.sum("w").over(Window.partitionBy("grp").orderBy("__v")).alias("cw"),
        F.sum("w").over(Window.partitionBy("grp")).alias("tw"),
    )
    ref = {
        r["grp"]: r["m"]
        for r in cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("grp")
        .agg(F.min("__v").alias("m"))
        .collect()
    }
    tot = df.groupBy("grp").agg(
        F.sum("__w").alias("__tw"),
        F.min(F.col("__v").cast("double")).alias("__vmin"),
        F.max(F.col("__v").cast("double")).alias("__vmax"),
    )
    targets = tot.select(
        "grp",
        F.lit(0).cast("long").alias("__tid"),
        F.expr("(__tw + 1) div 2").alias("__target"),
    )
    got = {
        r["grp"]: r["__key"]
        for r in select_values_at_ranks(
            df,
            ["grp"],
            targets,
            tot.select("grp", "__vmin", "__vmax"),
            num_buckets=6,
        ).collect()
    }
    assert ref == got


def test_n_col_matches_count(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(17)] + [("b", 1)], "grp string, v long"
    )
    rows = exact_grouped_percentiles(
        df, "v", [0.5], by=["grp"], n_col="n"
    ).collect()
    n = {r["grp"]: r["n"] for r in rows}
    assert n == {"a": 17, "b": 1}


GATES = [
    "a9_quantiles",
    "a14_winsorized_mean",
    "approx_quantiles_contract",
    "theilsen_trend",
    "mad_anomalies",
    "conversion_latency_quantiles",
    "classifier_confusion_stats",
    "weighted_median_price",
]


def test_plan_guard_no_holistic_percentile(spark, sf_dir):
    """The r13 contract: none of the exact-percentile gates may plan
    Spark's holistic Percentile aggregate (single-task group buffer).
    percentile_approx (the mergeable sketch) stays where declared."""
    for name in GATES:
        df = catalog.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        compact = plan.replace("percentile_approx", "PAPPROX")
        assert "percentile(" not in compact, name
    # the contract gate keeps its sketch side
    df = catalog.QUERIES["approx_quantiles_contract"](spark, sf_dir)
    assert "percentile_approx" in (
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_nan_inf_mixed_groups_match_percentile(spark):
    """Review finding r13: NaN/±Inf in a group must neither poison the
    finite values' bucketing nor drop the group — results must stay
    bit-identical to F.percentile (NaN counts as a value that sorts
    last; −Inf first)."""
    nan, inf = float("nan"), float("inf")
    rows = (
        [("a", 1.0), ("a", 2.0), ("a", nan)]
        + [("b", 1.0), ("b", 2.0), ("b", inf)]
        + [("c", -inf), ("c", 5.0), ("c", 7.0)]
        + [("d", nan), ("d", nan)]
        + [("e", inf), ("e", -inf)]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    probs = [0.0, 0.5, 1.0]
    ref = _ref(df, probs, ["grp"])
    got = _got(df, probs, ["grp"], 4)
    assert set(ref) == set(got)
    for g in ref:
        assert _bit_equal(ref[g], got[g]), (g, ref[g], got[g])


def test_empty_input_global_n_col_is_zero(spark):
    """Review finding r13: a by=[] selection over an EMPTY relation
    must report n_col = 0 (count semantics), not NULL."""
    df = spark.createDataFrame([], "v long")
    rows = exact_grouped_percentiles(
        df, "v", [0.5], by=[], n_col="n"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 0
    assert rows[0]["__q"] == [None]
