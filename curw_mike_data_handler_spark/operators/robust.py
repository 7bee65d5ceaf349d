"""Robust statistics over value columns: quantiles, winsorized means.

Scale contract (SCALE.md "Percentiles"): Spark's ``percentile`` is a
HOLISTIC aggregate — every value in the group is buffered into the
final merge, so an exact global percentile over a 100-TB column OOMs
the merging task.  Every entry point here therefore defaults to
``exact=False`` → ``approx_percentile`` (the mergeable KLL/GK-style
sketch, bounded memory, error ≤ 1/accuracy quantile ranks — the bound
``approx_quantiles_contract`` attests empirically).  ``exact=True``
exists for gate-scale oracle attestation ONLY: the catalog queries pin
it so DuckDB's ``quantile_cont`` hash-compares exactly, but nothing on
the 100-TB path may pass it (a plan guard asserts the default plan
contains no holistic percentile).

Reference parity: the reference clamps known-bad sentinel codes
(`replace_negative_numbers_with_nan`, rf_linux:118); winsorizing is the
same defense for unknown-bad magnitudes, expressed as thresholds + one
grouped aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_ACCURACY = 10_000


def quantile_agg(
    col: str | Column,
    probs: list[float],
    *,
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
) -> Column:
    """Aggregate expression for the given quantiles of ``col``.

    ``exact=False`` (default, the at-scale path): ``approx_percentile``
    — a mergeable sketch, partial-aggregated map-side like any
    algebraic aggregate.  ``exact=True``: holistic ``percentile`` with
    the linear-interpolation definition DuckDB's ``quantile_cont``
    shares — gate-scale attestation only.  Returns an array column in
    ``probs`` order either way."""
    c = F.col(col) if isinstance(col, str) else col
    parr = F.array(*[F.lit(p) for p in probs])
    if exact:
        return F.percentile(c, parr)
    return F.percentile_approx(c, parr, F.lit(accuracy))


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    *,
    by: list[str] | None = None,
    names: list[str] | None = None,
    scale: float = 1.0,
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` → one row per group with
    one column per prob (``names`` or ``p50``-style defaults), each
    divided by ``scale`` and rounded to 6 dp (the catalog's cents
    convention)."""
    names = names or [f"p{int(p * 100)}" for p in probs]
    q = quantile_agg(value_col, probs, exact=exact, accuracy=accuracy).alias("__q")
    g = df.groupBy(*(by or [])).agg(q) if by else df.agg(q)
    return g.select(
        *(by or []),
        *[
            F.round(F.col("__q")[i] / scale, 6).alias(n)
            for i, n in enumerate(names)
        ],
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    *,
    by: list[str],
    lo: float = 0.01,
    hi: float = 0.99,
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Clip ``value_col`` (integer cents) at the GLOBAL [lo, hi]
    quantiles, then average per group → (by…, n, n_clip_lo, n_clip_hi,
    wins_mean).

    Plan shape: one threshold pass (sketch by default; holistic only
    under ``exact=True``) broadcast as a 1-row cross join into one
    grouped aggregate — two scans, one exchange, no fan-out.  Clipped
    values re-integerize (round to cents) so the group mean is an
    exact integer sum in both engines under ``exact=True``."""
    vals = df.select(*by, F.col(value_col).alias("v"))
    q = vals.agg(
        quantile_agg("v", [lo, hi], exact=exact, accuracy=accuracy).alias("q")
    ).select(F.col("q")[0].alias("lo"), F.col("q")[1].alias("hi"))
    j = vals.crossJoin(F.broadcast(q))
    vd = F.col("v").cast("double")
    clipped = F.round(F.least(F.greatest(vd, F.col("lo")), F.col("hi"))).cast("long")
    n = F.count("*")
    return j.groupBy(*by).agg(
        n.alias("n"),
        F.sum((vd < F.col("lo")).cast("long")).alias("n_clip_lo"),
        F.sum((vd > F.col("hi")).cast("long")).alias("n_clip_hi"),
        F.round(F.sum(clipped).cast("double") / 100.0 / n, 6).alias("wins_mean"),
    )


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 10,
    by: list[str] | None = None,
    tie_cols: list[str] | None = None,
    bin_col: str = "decile",
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Append an equi-depth bucket column (1..k) to ``df``.

    ``exact=False`` (default — the at-scale path): compute k-1
    approx-quantile bin EDGES per group (mergeable sketch → a tiny
    one-row-per-group edges relation), broadcast them back, and assign
    buckets with a map-only array count — no window, no total sort,
    no single-partition stage.  Bucket populations are equal to within
    sketch error; a value equal to an edge lands deterministically in
    the lower bucket.

    ``exact=True`` (gate-scale oracle attestation ONLY): ``ntile(k)``
    over the (value, *tie_cols) total order — bit-identical to a SQL
    oracle's ntile (both engines deal the first n mod k buckets one
    extra row), but each window partition is ONE task sorting its
    whole group; nothing on the 100-TB path may pass it.  The plan
    guard in tests/test_plan_shapes.py pins that the default path
    contains no window/ntile.

    The bucket column is int on both paths; callers cast to match
    their oracle (DuckDB ntile returns BIGINT).

    NULL handling: ``value_col`` is expected non-null (every catalog
    caller feeds a cleaned column).  The exact path orders
    ``asc_nulls_last`` so that if NULLs do appear they land in the TOP
    bucket exactly as DuckDB's default ``ORDER BY`` (NULLS LAST for
    ASC) deals them — Spark's bare ``asc`` is NULLS FIRST, which would
    silently bucket NULLs opposite the oracle.  The approx path drops
    NULLs from the sketch (``percentile_approx`` ignores them) and
    pins NULL rows to bucket ``k`` for the same nulls-last semantics.
    """
    from pyspark.sql import Window

    if exact:
        order = [
            F.asc_nulls_last(c) for c in [value_col, *(tie_cols or [])]
        ]
        w = (
            Window.partitionBy(*by).orderBy(*order)
            if by
            else Window.orderBy(*order)
        )
        return df.withColumn(bin_col, F.ntile(k).over(w))
    probs = [i / k for i in range(1, k)]
    agg = F.percentile_approx(
        F.col(value_col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    ).alias("__edges")
    if by:
        edges = df.groupBy(*by).agg(agg)
        joined = df.join(F.broadcast(edges), by)
    else:
        joined = df.crossJoin(F.broadcast(df.groupBy().agg(agg)))
    v = F.col(value_col)
    return joined.withColumn(
        bin_col,
        F.when(v.isNull(), F.lit(k)).otherwise(
            F.size(F.filter(F.col("__edges"), lambda e: e < v)) + F.lit(1)
        ),
    ).drop("__edges")


def distribution_ranks(
    df: DataFrame,
    value_col: str,
    *,
    by: list[str] | None = None,
    tie_cols: list[str] | None = None,
    pct_col: str = "pct_rank",
    cume_col: str = "cume",
    exact: bool = False,
    resolution: int = 1_000,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Append distribution-position columns — ``pct_col`` ≈
    ``percent_rank`` ((rank−1)/(n−1)) and ``cume_col`` ≈ ``cume_dist``
    (rows ≤ current / n) of ``value_col`` within each ``by`` group.

    ``exact=False`` (default — the at-scale path): estimate the
    per-group CDF once with a mergeable quantile sketch — ``resolution``
    +1 edges at probs 0, 1/m, …, 1 (``percentile_approx`` keeps exact
    min/max at the endpoints) plus the group count, a one-row-per-group
    relation broadcast back — then assign each row its interpolated CDF
    position MAP-ONLY: locate the straddling edge pair with an array
    scan and linearly interpolate inside it.  No window, no total sort,
    no single-task-per-hot-key stage; error is bounded by sketch rank
    error (≤ 1/accuracy) + interpolation width (≤ 1/resolution) + tie
    mass.  Both output columns carry the same CDF estimate (the exact
    definitions differ by strict-vs-nonstrict comparison and n−1 vs n —
    O(ties + 1/n), inside the sketch error), except ``cume_col`` is
    floored at 1/n (cume_dist's exact lower bound).

    ``exact=True`` (gate-scale oracle attestation ONLY): the real
    ``percent_rank``/``cume_dist`` window over the (value, *tie_cols)
    ``asc_nulls_last`` total order — bit-identical to a SQL oracle
    (DuckDB ASC is NULLS LAST), but each window partition is ONE task
    sorting its whole group; nothing on the 100-TB path may pass it
    (plan guard in tests/test_plan_shapes.py).

    NULL handling: ``value_col`` is expected non-null; if NULLs appear
    the exact path ranks them last (nulls-last order) and the approx
    path pins them to CDF 1.0 for the same semantics.

    This is the w8/w11 straggler-class fix (VERDICT r6 "What's wrong"
    #2): percent_rank over a fact partitioned by a handful of enum
    keys is a single-task sort of ~the whole corpus per key.
    """
    from pyspark.sql import Window

    if exact:
        order = [
            F.asc_nulls_last(c) for c in [value_col, *(tie_cols or [])]
        ]
        w = (
            Window.partitionBy(*by).orderBy(*order)
            if by
            else Window.orderBy(*order)
        )
        return df.withColumn(pct_col, F.percent_rank().over(w)).withColumn(
            cume_col, F.cume_dist().over(w)
        )

    m = resolution
    probs = [i / m for i in range(0, m + 1)]
    agg = [
        F.percentile_approx(
            F.col(value_col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("__edges"),
        F.count(F.col(value_col)).alias("__n"),
    ]
    if by:
        sketch = df.groupBy(*by).agg(*agg)
        joined = df.join(F.broadcast(sketch), by)
    else:
        joined = df.crossJoin(F.broadcast(df.groupBy().agg(*agg)))

    v = F.col(value_col).cast("double")
    edges = F.transform(F.col("__edges"), lambda e: e.cast("double"))
    # 0-based index of the edge interval [e_j, e_{j+1}) containing v:
    # count of edges <= v, minus one, clamped into [0, m-1].
    j = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m - 1),
            F.size(F.filter(edges, lambda e: e <= v)) - F.lit(1),
        ),
    )
    e_lo = F.element_at(edges, j + F.lit(1))
    e_hi = F.element_at(edges, j + F.lit(2))
    frac = F.when(e_hi > e_lo, (v - e_lo) / (e_hi - e_lo)).otherwise(F.lit(0.5))
    cdf = F.least(
        F.lit(1.0),
        F.greatest(F.lit(0.0), (j.cast("double") + frac) / F.lit(float(m))),
    )
    cdf = F.when(F.col(value_col).isNull(), F.lit(1.0)).otherwise(cdf)
    return (
        joined.withColumn(pct_col, cdf)
        .withColumn(
            cume_col,
            F.greatest(F.col(pct_col), F.lit(1.0) / F.col("__n").cast("double")),
        )
        .drop("__edges", "__n")
    )
