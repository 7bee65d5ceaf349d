"""Distributed per-key prefix aggregation (running sum / running max).

The straggler class behind several catalog windows (VERDICT r6 #2's
sibling, audited in SCALE.md "Enum-key windows"): a running aggregate
``over (PARTITION BY enum_key ORDER BY ...)`` on a fact table makes
each window partition ONE task sorting and scanning its whole key's
slice — with a handful of event types that is ~the whole corpus per
task at 100 TB.

``bucketed_running_agg`` is the classic two-phase parallel scan,
expressed in DataFrame ops:

1. split each key's order domain into ``n_buckets`` ranges via a
   mergeable quantile sketch over an order-preserving numeric
   surrogate of the leading order column (the same
   edges-broadcast device as ``robust.equidepth_bins``);
2. per (key, bucket) partial aggregates — one map-side-combined
   groupBy over a tiny |keys|×buckets relation;
3. exclusive prefix over the bucket partials (a window over that tiny
   relation only) → per-bucket OFFSETS, broadcast back;
4. the running aggregate within each (key, bucket) partition +
   offset — the fact-scale window now partitions on (key, bucket),
   so the largest task is ~1/n_buckets of a key's slice.

Unlike the approx CDF in ``robust.distribution_ranks`` this is EXACT —
bucket edges only have to partition the order domain consistently, not
accurately, so the sketch's rank error moves work between tasks but
never changes a result.  The same plan therefore serves the oracle
gate and the 100-TB path; there is no ``exact=`` switch.

Frame-edge semantics match SQL windows: an empty frame (first row of
the first bucket under ``inclusive=False``) yields NULL, not 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_ACCURACY = 10_000


def _order_surrogate(df: DataFrame, order_col: str) -> Column:
    """Order-preserving numeric surrogate of the leading order column:
    numerics pass through, zoned timestamps become epoch micros, NTZ
    timestamps become zone-independent wall SECONDS (sub-second rows
    share a bucket), dates become epoch days, strings map to their
    first 14 UTF-8 bytes as a big-endian integer (monotone in the
    string order; ties beyond 14 bytes merely share a bucket and are
    re-ordered by the full composite inside it)."""
    dt = df.schema[order_col].dataType
    c = F.col(order_col)
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c)
    if isinstance(dt, T.TimestampNTZType):
        # zone-INDEPENDENT wall-time seconds: casting to timestamp and
        # taking unix_micros is NOT order-preserving across a DST
        # spring-forward gap (the session-zone interpretation maps the
        # skipped wall hour above the following one).  Field extraction
        # on NTZ is pure, and the surrogate only needs monotone
        # NON-decreasing — sub-second ties just share a bucket and
        # re-order inside it by the full composite.  The day term must
        # be LONG before the multiply: unix_date is IntegerType and a
        # 32-bit product overflows past 2038 (ANSI crash / non-ANSI
        # wraparound breaking monotonicity).
        return (
            F.unix_date(F.to_date(c)).cast("long") * F.lit(86_400)
            + F.hour(c) * F.lit(3_600)
            + F.minute(c) * F.lit(60)
            + F.second(c)
        )
    if isinstance(dt, T.DateType):
        return F.unix_date(c)
    if isinstance(dt, (T.StringType,)):
        # first 14 UTF-8 bytes as a big-endian integer, assembled from
        # two 7-byte conv() chunks (conv is 64-bit; 7 bytes < 2^56) —
        # monotone in the string order, evaluated in double (the
        # surrogate is only ever a bucketing key, 53-bit precision
        # just moves bucket edges, never results); strings sharing a
        # 14-byte prefix share a bucket and re-order inside it
        hx = F.rpad(F.hex(F.substring(c.cast("binary"), 1, 14)), 28, "0")
        hi = F.conv(F.substring(hx, 1, 14), 16, 10).cast("double")
        lo = F.conv(F.substring(hx, 15, 14), 16, 10).cast("double")
        return hi * F.lit(72057594037927936.0) + lo  # 2^56
    if isinstance(dt, T.NumericType):
        return c
    # anything else would fall through to an opaque cast('double')
    # AnalysisException (or NULL buckets under non-ANSI) far from the
    # call site — fail here with the actual offender (ADVICE r7)
    raise ValueError(
        f"unsupported order column type {dt.simpleString()} for "
        f"{order_col!r}: expected numeric, timestamp, date, or string "
        "(pass bucket_key= for anything else)"
    )


def _bucketize(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    n_buckets: int,
    accuracy: int,
    bucket_key: Column | None = None,
) -> DataFrame:
    """Shared first phase of every operator here: append ``__b`` —
    the row's order-domain bucket from per-group approx-quantile
    edges over the order surrogate, broadcast back.  Equal leading
    order keys always share a bucket; bucket boundaries respect the
    order, so per-(by, __b) windows compose into the global order."""
    key = (bucket_key if bucket_key is not None
           else _order_surrogate(df, order_cols[0])).cast("double")
    d = df.withColumn("__ok", key)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    eagg = F.percentile_approx(
        F.col("__ok"), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    ).alias("__edges")
    if by:
        edges = d.groupBy(*by).agg(eagg)
        j = d.join(F.broadcast(edges), by)
    else:
        j = d.crossJoin(F.broadcast(d.groupBy().agg(eagg)))
    ok = F.col("__ok")
    return j.withColumn(
        "__b", F.size(F.filter(F.col("__edges"), lambda e: e < ok))
    ).drop("__ok", "__edges")


def bucketed_running_agg(
    df: DataFrame,
    value_col: str,
    *,
    by: list[str] | None,
    order_cols: list[str],
    out_col: str,
    agg: str = "sum",
    inclusive: bool = True,
    n_buckets: int = 64,
    bucket_key: Column | None = None,
    accuracy: int = DEFAULT_ACCURACY,
    bucket_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = running ``agg`` (``"sum"`` or ``"max"``) of
    ``value_col`` over rows ordered by ``order_cols`` within each
    ``by`` group — result identical to
    ``F.{sum,max}(value_col).over(Window.partitionBy(*by)
    .orderBy(*order_cols).rowsBetween(unboundedPreceding,
    0 if inclusive else -1))`` but with the fact-scale window
    partitioned on (by…, bucket) instead of the possibly-tiny ``by``
    key alone.  ``bucket_key`` overrides the order surrogate (any
    numeric Column monotone non-decreasing in the leading order
    column).  ``bucket_col`` names an EXISTING bucket-id column (e.g.
    from ``bucketed_lag(keep_bucket_col=...)`` over the same
    (by, order) domain) — the sketch/broadcast pass is skipped
    entirely and that column is consumed instead; it must respect the
    order (equal leading order keys share a bucket, boundaries
    non-decreasing in the order), which any _bucketize output does."""
    from pyspark.sql import Window

    if agg not in ("sum", "max"):
        raise ValueError(f"unsupported running agg {agg!r}")
    fn = F.sum if agg == "sum" else F.max
    by = by or []
    if bucket_col is not None:
        if bucket_col not in df.columns:
            raise ValueError(
                f"bucket_col {bucket_col!r} not in {df.columns}"
            )
        j = df.withColumnRenamed(bucket_col, "__b")
    else:
        j = _bucketize(df, by, order_cols, n_buckets, accuracy, bucket_key)

    # tiny relation: ≤ |by| × n_buckets rows — windows over it are safe
    totals = j.groupBy(*by, "__b").agg(fn(value_col).alias("__t"))
    woff = (
        Window.partitionBy(*by).orderBy("__b")
        if by
        else Window.orderBy("__b")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(*by, "__b", fn("__t").over(woff).alias("__off"))

    j2 = j.join(F.broadcast(offs), [*by, "__b"])
    frame_end = 0 if inclusive else -1
    wloc = (
        Window.partitionBy(*by, "__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    local = fn(value_col).over(wloc)
    off = F.col("__off")
    if agg == "sum":
        zero = F.lit(0).cast(df.schema[value_col].dataType)
        combined = F.when(local.isNull() & off.isNull(), F.lit(None)).otherwise(
            F.coalesce(local, zero) + F.coalesce(off, zero)
        )
    else:
        # greatest skips NULLs and is NULL only when both are — exactly
        # the empty-frame/running-max composition semantics
        combined = F.greatest(local, off)
    return j2.withColumn(out_col, combined).drop("__b", "__off")


def _thin_edges(edges: Column, spacing: int, integral: bool) -> Column:
    """Keep a subset of the (already ascending) sketch-edge array with
    pairwise gaps >= ``spacing``, duplicates dropped (``spacing=0`` is
    pure deduplication).  The per-group edge array is <= n_buckets-1
    elements and lives on the broadcast side, so this fold is
    O(n_buckets) per group — no extra pass over the data.

    Why: ``bucketed_range_agg`` copies a row into every later bucket
    whose edge falls inside [t, t + lookback); with surviving edges at
    least ``2·lookback`` apart, any such half-open window holds at
    most ONE edge — a hard ≤1 carry copy per row bound on every order
    domain, including coarse/point-mass ones where the raw sketch
    repeats values.  Dropping an edge only merges two buckets (exact;
    it moves work, never results).

    try_add: last + spacing overflowing long means no further edge can
    qualify — NULL upper bound ⟹ don't append."""
    sp = F.lit(int(spacing)) if integral else F.lit(float(spacing))
    empty = F.array().cast("array<long>" if integral else "array<double>")

    def step(acc: Column, e: Column) -> Column:
        last = F.get(acc, F.size(acc) - F.lit(1))  # NULL when empty
        ub = F.try_add(last, sp)
        keep = last.isNull() | ((e > last) & ub.isNotNull() & (e >= ub))
        return F.when(keep, F.array_append(acc, e)).otherwise(acc)

    return F.aggregate(edges, empty, step)


def bucketed_range_agg(
    df: DataFrame,
    value_col: str,
    *,
    by: list[str] | None,
    order_col: str,
    lookback: int,
    out_col: str,
    agg: str = "sum",
    count_col: str | None = None,
    n_buckets: int = 32,
    accuracy: int = DEFAULT_ACCURACY,
    edge_spacing: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = ``agg`` of ``value_col`` over the trailing
    RANGE frame [order_col − lookback, order_col] within each ``by``
    group — result identical to ``F.{sum,max}(value_col).over(
    Window.partitionBy(*by).orderBy(order_col)
    .rangeBetween(-lookback, 0))`` but partitioned on (by…, bucket):
    the bounded lookback admits the classic bucket + overlap carry-in
    rewrite, so no single task ever sorts a whole enum key's slice.

    ``order_col`` must be numeric (epoch micros for time frames).
    Mechanics: rows bucket by sketch edges over the order domain; each
    row is additionally COPIED into every later bucket whose boundary
    edge falls inside [t, t + lookback) — those carry rows complete
    the trailing frames that cross a bucket boundary, and only base
    rows are emitted.  EXACT like ``bucketed_running_agg`` — edge
    placement moves work, never results — so the same plan serves the
    oracle gate and the 100-TB path.  ``count_col`` optionally emits
    the frame row count too (the same frame, one window pass).

    Carry volume is #edges within ``lookback`` of each row, so the
    per-group edge set is THINNED to a minimum spacing of
    ``edge_spacing`` (default ``2·lookback``) before bucketing: any
    half-open window of length ``lookback`` then holds at most ONE
    surviving edge — a hard ≤ 1 carry copy per row on every domain,
    including the coarse/point-mass regime where the raw sketch
    repeats values and n_buckets=64 over ~30 distinct days paid ~4.3
    copies/row (r8 verdict #5).  Thinning only merges buckets (fewer,
    wider), never changes results; ``n_buckets`` remains the UPPER
    bound on parallelism.  Pass a smaller ``edge_spacing`` (≥ 1) to
    trade carry copies for finer buckets when groups are extremely
    dense per lookback-span; ``lookback = 0`` degrades to plain
    deduplication of the sketch edges."""
    from pyspark.sql import Window

    if agg not in ("sum", "max"):
        raise ValueError(f"unsupported range agg {agg!r}")
    if int(lookback) != lookback:
        # rangeBetween takes longs: a fractional lookback would frame
        # on int(lookback) while the carry test used the full value —
        # two silently different frames (ADVICE r7)
        raise ValueError(f"lookback must be integral, got {lookback!r}")
    fn = F.sum if agg == "sum" else F.max
    by = by or []

    # sketch + carry comparisons in the ORDER column's own arithmetic
    # when it is integral (percentile_approx returns observed values,
    # so edges stay long and e < ok + lookback is exact); double only
    # for fractional order columns, where values beyond 2^53 would
    # round — there the carry test could miss an edge inside the
    # rounding gap, so fractional callers must keep |order| < 2^53
    # (every catalog caller passes unix_micros longs: exact path)
    dt = df.schema[order_col].dataType
    integral = isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    d = df.withColumn(
        "__ok", F.col(order_col).cast("long" if integral else "double")
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    eagg = F.percentile_approx(
        F.col("__ok"), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    ).alias("__edges")

    if edge_spacing is None:
        edge_spacing = 2 * int(lookback)
    elif int(edge_spacing) != edge_spacing or edge_spacing < 0:
        raise ValueError(
            f"edge_spacing must be a non-negative integer, got {edge_spacing!r}"
        )
    if by:
        edges = d.groupBy(*by).agg(eagg).withColumn(
            "__edges", _thin_edges(F.col("__edges"), edge_spacing, integral)
        )
        j = d.join(F.broadcast(edges), by)
    else:
        j = d.crossJoin(
            F.broadcast(
                d.groupBy()
                .agg(eagg)
                .withColumn(
                    "__edges",
                    _thin_edges(F.col("__edges"), edge_spacing, integral),
                )
            )
        )
    ok = F.col("__ok")
    lb = F.lit(int(lookback)) if integral else F.lit(float(lookback))
    # home bucket, plus one carry copy per edge e_i in [t, t+lookback):
    # edge POSITION i separates bucket i from i+1, so the copy goes to
    # bucket i+1.  Mapping by the edge's VALUE rank instead breaks on
    # duplicate sketch edges (a point mass holding ≥ 2/n_buckets of a
    # group makes percentile_approx repeat the value): every duplicate
    # shares one rank, so the buckets above the mass silently lost
    # their carries and trailing frames there under-counted (ADVICE r7
    # high — repro: 300 rows at t=50, lookback 10).
    # try_add keeps the long path total: ok + lb overflows only when
    # ok > MAX - lb, and then every edge e >= ok is certainly inside
    # the lookback — so NULL (overflow) means carry, never an ANSI
    # ARITHMETIC_OVERFLOW task failure or a wrapped-negative dropped
    # carry.
    home = F.size(F.filter(F.col("__edges"), lambda e: e < ok))
    ub = F.try_add(ok, lb)
    j = j.withColumn("__home", home).withColumn(
        "__carries",
        F.filter(
            F.transform(
                F.col("__edges"),
                lambda e, i: F.when(
                    (e >= ok) & (ub.isNull() | (e < ub)), i + F.lit(1)
                ),
            ),
            lambda b: b.isNotNull(),
        ),
    )
    expanded = j.select(
        *df.columns,
        "__home",
        F.explode(
            F.array_union(F.array(F.col("__home")), F.col("__carries"))
        ).alias("__b"),
    )
    w = (
        Window.partitionBy(*by, "__b")
        .orderBy(order_col)
        .rangeBetween(-int(lookback), 0)
    )
    out = expanded.withColumn(out_col, fn(value_col).over(w))
    if count_col is not None:
        out = out.withColumn(count_col, F.count("*").over(w))
    return (
        out.filter(F.col("__b") == F.col("__home"))
        .drop("__home", "__b")
    )


def bucketed_lag(
    df: DataFrame,
    cols: list[str],
    *,
    by: list[str] | None,
    order_cols: list[str],
    prefix: str = "lag_",
    n_buckets: int = 64,
    bucket_key: Column | None = None,
    accuracy: int = DEFAULT_ACCURACY,
    keep_bucket_col: str | None = None,
) -> DataFrame:
    """Append ``{prefix}{c}`` = ``lag(c, 1)`` over the (by…,
    order_cols) total order for each c in ``cols`` — identical to the
    plain window lag, but the fact-scale window partitions on (by…,
    bucket): within a bucket the ordinary lag applies, and each
    bucket's FIRST row takes its predecessor from a tiny per-bucket
    boundary relation (the last row of every non-empty bucket,
    lag-chained across buckets and broadcast back).  The first row of
    a group's first non-empty bucket lags to NULL, exactly as the
    plain window does.  EXACT; same plan for the oracle gate and the
    100-TB path.

    ``keep_bucket_col``: expose the row's bucket id under that name so
    a downstream ``bucketed_running_agg(bucket_col=...)`` over the
    SAME (by, order) domain reuses this pass's bucketing instead of
    re-sketching edges and re-broadcasting them."""
    from pyspark.sql import Window

    by = by or []
    j = _bucketize(df, by, order_cols, n_buckets, accuracy, bucket_key)

    okey = F.struct(*[F.col(c) for c in order_cols])
    last = j.groupBy(*by, "__b").agg(
        F.max_by(F.struct(*[F.col(c) for c in cols]), okey).alias("__last")
    )
    wb = (
        Window.partitionBy(*by).orderBy("__b")
        if by
        else Window.orderBy("__b")
    )
    # previous NON-EMPTY bucket's last row (the relation only has
    # non-empty buckets, so lag(1) over it skips empties for free)
    bounds = last.select(
        *by, "__b", F.lag("__last").over(wb).alias("__prev_last")
    )
    j2 = j.join(F.broadcast(bounds), [*by, "__b"])
    w = Window.partitionBy(*by, "__b").orderBy(*order_cols)
    rn = F.row_number().over(w)
    out = j2.withColumn("__rn1", rn == 1)
    for c in cols:
        out = out.withColumn(
            prefix + c,
            F.when(F.col("__rn1"), F.col("__prev_last")[c]).otherwise(
                F.lag(c).over(w)
            ),
        )
    out = out.drop("__prev_last", "__rn1")
    if keep_bucket_col is not None:
        return out.withColumnRenamed("__b", keep_bucket_col)
    return out.drop("__b")
