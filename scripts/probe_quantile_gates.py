#!/usr/bin/env python
"""Round-13 probe: time + dump plans for the exact-percentile gate family.

Usage: probe_quantile_gates.py [before|after] [sf_dir]
Writes plans/r13/<name>_{before|after}.txt and prints per-query noop wall.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from curw_mike_data_handler_spark import catalog, get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
NAMES = [
    "a9_quantiles",
    "a14_winsorized_mean",
    "approx_quantiles_contract",
    "theilsen_trend",
    "weighted_median_price",
    "mad_anomalies",
    "conversion_latency_quantiles",
    "classifier_confusion_stats",
]

spark = get_spark(app_name="probe-quantiles", extra_conf={"spark.driver.memory": "16g"})
spark.sparkContext.setLogLevel("ERROR")
# warm JVM + python workers
catalog.QUERIES["a5_distinct"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

out = {}
plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
os.makedirs(plans_dir, exist_ok=True)
for name in NAMES:
    df = catalog.QUERIES[name](spark, SF_DIR)
    with open(os.path.join(plans_dir, f"{name}_{TAG}.txt"), "w") as fh:
        fh.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
    times = []
    for _ in range(3):
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        catalog.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    out[name] = times
    print(name, times, flush=True)
print(json.dumps({"tag": TAG, "sf": SF_DIR, "times": out}))
spark.stop()
