"""AQE skew-join handling — the runtime answer to skewed join keys
at 100 TB (SCALE.md's salting discussion is the manual fallback; this
test proves the AUTOMATIC path engages on this engine's session).

A join key with one hot value concentrates a partition far above its
siblings; with adaptive skew-join enabled Spark splits the oversized
partition into sub-partitions at runtime (replicating the matching
build side), which shows up as ``skew=true`` on the SortMergeJoin in
the final adaptive plan.  The thresholds are lowered to trip on
test-sized data; production defaults (256 MB) scale the same logic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    # a constant-key hot partition compresses to ~tens of KB,
    # so the trip threshold must sit well below it
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # a downstream op that needs the join's hash partitioning (e.g. a
    # groupBy on the key) vetoes the skew split unless forced
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # hot key: 95% of the left side lands on k=0
        left = spark.range(200_000).select(
            F.when(F.col("id") < 190_000, 0)
            .otherwise(F.col("id") % 64)
            .alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        right = spark.range(4_000).select(
            (F.col("id") % 64).alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k").agg(F.count("*").alias("n"))
        n_out = j.collect()[0].n
        per_right = {r.k: r["count"] for r in right.groupBy("k").count().collect()}
        per_left = {r.k: r["count"] for r in left.groupBy("k").count().collect()}
        assert n_out == sum(
            n * per_right.get(k, 0) for k, n in per_left.items()
        ), "skew split must not change the join result"
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not mark the hot join partition as skewed:\n"
            + plan[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
