#!/usr/bin/env python
"""Isolated replay-family bench: cold + warm pass in a fresh JVM.

Evidence harness for OPTIMIZATION_r12 §1: fresh JVM, cold then warm
pass over the nine replay gates, noop sink, one JSON line per pass."""
import sys, time, json

sys.path.insert(0, "/root/repo")
from curw_mike_data_handler_spark import catalog, get_spark
SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "stream_interval_join_replay", "stream_dedup_watermark_replay",
    "stream_asof_spine_replay", "stream_outer_interval_join_replay",
    "stream_full_outer_interval_join_replay", "stream_quantile_drift_replay",
    "stream_shred_ingest_replay", "stream_cow_upsert_replay",
    "stream_manifest_cdf_replay",
]
spark = get_spark(app_name="bench-replay-family", extra_conf={
    "spark.driver.memory": "16g",
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
})
spark.sparkContext.setLogLevel("ERROR")
catalog.QUERIES["a5_distinct"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
spark.range(64).repartition(16).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode("overwrite").save()
for label in ("cold", "warm"):
    t = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        catalog.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t[name] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"pass": label, "total": round(sum(t.values()), 2), "queries": t}), flush=True)
spark.stop()
