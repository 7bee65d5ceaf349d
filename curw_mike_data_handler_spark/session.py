"""SparkSession factory with scale-oriented defaults.

Tuned for correctness tests on ``local[N]`` but configured the way a
1000-executor cluster job would be: AQE on (runtime coalescing + skew
join handling), explicit shuffle partitioning, Arrow for any pandas
interchange, UTC session timezone (the reference does +05:30 offset
arithmetic by hand — we keep instants in UTC and apply the offset as a
display concern; see functions/timegrid.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# These are per-session defaults, not hard requirements; callers can
# override any of them via ``extra_conf``.
_BASE_CONF = {
    # Adaptive execution: runtime partition coalescing, skew-join
    # splitting, and plan re-optimization from real stats. At 100 TB
    # this is what turns a static 'shuffle.partitions' guess into
    # right-sized partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Session timezone pinned: all timestamp arithmetic is
    # instant-based; the reference's UTC+05:30 is offset math.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / mapInPandas / toPandas interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables here (station/coeff/nation/part...) are tiny;
    # raise the broadcast ceiling so dim joins never shuffle the fact.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Scan parallelism: 128 MiB splits is the sweet spot for parquet
    # on object storage.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # pandas-written parquet may carry TIMESTAMP(NANOS) which Spark has
    # no native type for; read as long and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # tz-naive parquet timestamps (isAdjustedToUTC=false) must come back
    # as TIMESTAMP (LTZ, naive value taken as UTC epoch micros) — the
    # same reading DuckDB gives the oracle side.  Set here, not only in
    # the table loader, so EVERY parquet read path (maintenance sweeps,
    # bucketed tables, raw spark.read in tests) behaves identically
    # regardless of call order.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Spark 4 ANSI mode breaks the reference's permissive casts
    # (strings→double with junk rows); the engine validates explicitly.
    "spark.sql.ansi.enabled": "false",
}


def get_spark(
    app_name: str = "curw-mike-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster pass ~2-3x total executor cores, or rely on AQE coalescing
    from a higher initial value.
    """
    master = master or os.environ.get("SPARK_MASTER", f"local[{DEFAULT_CPUS}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", DEFAULT_CPUS))
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
