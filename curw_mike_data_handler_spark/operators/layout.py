"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional file skipping is THE data-layout lever at 100-TB
scale: parquet readers prune files/row-groups with min/max statistics,
but a table sorted on one column has useless bounds on every other.
Interleaving the bits of two (or more) dimension keys gives a single
sort key whose contiguous ranges are small axis-aligned rectangles, so
files written in Z-key order carry TIGHT min/max bounds on BOTH
dimensions and a predicate on either one skips most files
(Delta/Iceberg ``OPTIMIZE ZORDER BY`` is exactly this; the idea is
Morton 1966).

The key is pure integer bit-arithmetic — built here as a compile-time
Python loop over Spark column expressions (whole-stage-codegen'd JVM
shifts at runtime, no UDF) and mirrored as a generated SQL string so
DuckDB oracles compute bit-identical keys.  ``zorder_write`` is the
end-to-end sink: repartitionByRange on the key → sortWithinPartitions
→ parquet, producing one tight bounding box per output file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column | str, y: Column | str, *, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Z-order key (x gets even bit positions, y odd).

    The expression is an OR-fold of ``2*bits`` shift/mask terms,
    entirely JVM-side integer ops inside one codegen span — the same
    loop a native engine would compile, unrolled into the plan."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        ybit = F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = out.bitwiseOR(xbit).bitwiseOR(ybit)
    return out


def morton_key_sql(x: str, y: str, *, bits: int = 8) -> str:
    """The DuckDB/ANSI mirror of ``morton_key`` — generated from the
    same loop so both engines interleave identically."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    *,
    x_col: str,
    y_col: str,
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by Z-order of (x_col, y_col):
    range-partition on the Morton key (equal-size files via range
    sampling, no single-task global sort), sort within each partition,
    drop the helper column at the writer.  Downstream scans with a
    predicate on EITHER dimension prune most files from the parquet
    footer min/max stats alone."""
    keyed = df.withColumn("__zkey", morton_key(x_col, y_col, bits=bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
