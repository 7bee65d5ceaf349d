"""Parquet table loading for the driver's TPC-H-ish test schema."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # tz-naive parquet timestamps (timestamp[us], isAdjustedToUTC=false)
    # must come back as TIMESTAMP (LTZ) with the naive value taken as
    # UTC epoch micros — the same reading DuckDB gives the oracle side.
    # Spark 4 would otherwise infer TIMESTAMP_NTZ, which unix_micros()
    # and window() reject.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) read as long nanos → truncate to micros
        # (exactly what micro-precision engines do with nanos parquet).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so queries can be spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
