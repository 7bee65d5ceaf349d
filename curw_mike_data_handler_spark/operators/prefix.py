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
    numerics pass through, timestamps become epoch micros, strings map
    to their first 15 UTF-8 bytes as a big-endian integer (monotone in
    the string order; ties beyond 15 bytes merely share a bucket and
    are re-ordered by the full composite inside it)."""
    dt = df.schema[order_col].dataType
    c = F.col(order_col)
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c)
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
    return c


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
    column)."""
    from pyspark.sql import Window

    if agg not in ("sum", "max"):
        raise ValueError(f"unsupported running agg {agg!r}")
    fn = F.sum if agg == "sum" else F.max
    by = by or []

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
    j = j.withColumn(
        "__b", F.size(F.filter(F.col("__edges"), lambda e: e < ok))
    ).drop("__ok", "__edges")

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
