"""Streaming quantile-drift monitor e2e (streaming/quantiles.py):
checkpoint-restart equivalence, the measured state-size bound under a
TIGHT capacity (the production regime the driver gate's exact regime
cannot exercise), and the replay harness's state-metrics capture.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from curw_mike_data_handler_spark.operators.quantiles import (
    MergePruneSummary,
    rank_for,
)
from curw_mike_data_handler_spark.streaming.quantiles import (
    quantile_drift_stream,
)

BOUNDARY_US = 1_700_000_000_000_000  # fixed epoch-µs split for tests


def _mk_rows(rng, n, *, key, before_frac=0.5, lo=0, hi=10_000):
    rows = []
    for _ in range(n):
        before = rng.random() < before_frac
        t = BOUNDARY_US + (-1 if before else 1) * rng.randrange(1, 10**9)
        rows.append((key, rng.randrange(lo, hi), t))
    return rows


def _write_csv(path, rows):
    path.write_text("".join(f"{k},{c},{t}\n" for k, c, t in rows))


def _schema_df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, cents bigint, t_us bigint"
    ).select("key", "cents", F.timestamp_micros("t_us").alias("ts"))


def _run_stream(spark, src, ckpt, capacity, latest):
    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            prev = latest.get(r["key"])
            if prev is None or r["n_ref"] + r["n_cur"] >= prev["n_ref"] + prev["n_cur"]:
                latest[r["key"]] = r.asDict()

    stream = (
        spark.readStream.schema("key string, cents bigint, t_us bigint")
        .option("maxFilesPerTrigger", "1")
        .csv(str(src))
        .select("key", "cents", F.timestamp_micros("t_us").alias("ts"))
    )
    out = quantile_drift_stream(
        stream, "key", "cents", "ts",
        boundary_us=BOUNDARY_US, capacity=capacity,
    )
    (out.writeStream.foreachBatch(sink).outputMode("update")
     .option("checkpointLocation", str(ckpt))
     .trigger(availableNow=True).start().awaitTermination())


def test_drift_snapshot_matches_batch_across_restarts(spark, tmp_path):
    """History dribbled over three checkpointed availableNow runs must
    end at the same snapshot as one batch fold of everything (exact
    regime: capacity ≥ n), including the drift columns."""
    rng = random.Random(42)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    latest: dict = {}

    batches = [
        _mk_rows(rng, 120, key="a") + _mk_rows(rng, 80, key="b", lo=5000, hi=20000),
        _mk_rows(rng, 90, key="a", before_frac=0.2),
        _mk_rows(rng, 150, key="b", before_frac=0.8) + _mk_rows(rng, 40, key="a"),
    ]
    fed: list = []
    for i, rows in enumerate(batches):
        _write_csv(src / f"b{i}.csv", rows)
        fed.extend(rows)
        _run_stream(spark, src, ckpt, 1 << 16, latest)

    for key in ("a", "b"):
        ref_vals = sorted(c for k, c, t in fed if k == key and t < BOUNDARY_US)
        cur_vals = sorted(c for k, c, t in fed if k == key and t >= BOUNDARY_US)
        snap = latest[key]
        assert snap["n_ref"] == len(ref_vals) and snap["n_cur"] == len(cur_vals)
        assert snap["err_bound"] == 0
        for lbl, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            er = ref_vals[rank_for(num, den, len(ref_vals)) - 1]
            ec = cur_vals[rank_for(num, den, len(cur_vals)) - 1]
            assert snap[f"{lbl}_ref"] == er, (key, lbl)
            assert snap[f"{lbl}_cur"] == ec, (key, lbl)
            assert snap[f"drift_{lbl}"] == ec - er, (key, lbl)


def test_tight_capacity_state_bound_and_error_envelope(spark, tmp_path):
    """The production regime: capacity ≪ n.  The emitted state_items
    column (live state measured inside the operator) must stay within
    the O(capacity·log) envelope while n grows 100×, and the emitted
    quantiles must sit within the summary's own err_bound of the true
    ranks — measured, not asserted in prose."""
    import bisect

    rng = random.Random(7)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    latest: dict = {}
    capacity = 64

    fed: list = []
    for i in range(3):
        rows = _mk_rows(rng, 2000, key="x", before_frac=0.5)
        _write_csv(src / f"b{i}.csv", rows)
        fed.extend(rows)
        _run_stream(spark, src, ckpt, capacity, latest)

    snap = latest["x"]
    n = snap["n_ref"] + snap["n_cur"]
    assert n == len(fed)
    # state bound: 2 summaries × capacity × levels(≤14) — vs n=6000 raw
    assert snap["state_items"] <= 2 * capacity * 14
    assert snap["state_items"] < n / 3
    assert snap["err_bound"] > 0  # compaction really fired
    for half, pred in (("ref", lambda t: t < BOUNDARY_US),
                       ("cur", lambda t: t >= BOUNDARY_US)):
        vals = sorted(c for k, c, t in fed if pred(t))
        for lbl, num, den in (("p50", 1, 2), ("p90", 9, 10)):
            rank = rank_for(num, den, len(vals))
            est = snap[f"{lbl}_{half}"]
            lo = bisect.bisect_left(vals, est) + 1
            hi = bisect.bisect_right(vals, est)
            err = 0 if lo <= rank <= hi else min(abs(rank - lo), abs(rank - hi))
            assert err <= snap["err_bound"], (half, lbl, err)


def test_stream_fold_is_shared_with_batch_summary(spark, tmp_path):
    """The stream's numbers are reproducible by folding the same rows
    through the BATCH MergePruneSummary with the same capacity — the
    reconciliation contract (shared code, not a re-implementation)."""
    rng = random.Random(3)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    latest: dict = {}
    rows = _mk_rows(rng, 500, key="z", before_frac=0.4)
    _write_csv(src / "a.csv", rows)
    _run_stream(spark, src, ckpt, 1 << 16, latest)

    ref = MergePruneSummary(1 << 16)
    cur = MergePruneSummary(1 << 16)
    ref.insert_many(c for k, c, t in rows if t < BOUNDARY_US)
    cur.insert_many(c for k, c, t in rows if t >= BOUNDARY_US)
    snap = latest["z"]
    assert snap["p50_ref"] == ref.quantile_at_rank(rank_for(1, 2, ref.n))
    assert snap["p90_cur"] == cur.quantile_at_rank(rank_for(9, 10, cur.n))
    assert snap["state_items"] == ref.state_items() + cur.state_items()


def test_replay_harness_captures_state_metrics(spark):
    """replay_file_stream's progress_out (r9 verdict #6): the harness
    must report per-operator state rows/bytes and trigger count so
    BENCH_sf1 and the e2e tests can MEASURE streaming state."""
    from curw_mike_data_handler_spark.streaming.replay import (
        replay_file_stream,
    )

    rng = random.Random(11)
    df = _schema_df(spark, _mk_rows(rng, 400, key="m"))
    progress: dict = {}

    def plan(stream):
        return quantile_drift_stream(
            stream, "key", "cents", "ts",
            boundary_us=BOUNDARY_US, capacity=1 << 16,
        )

    out = replay_file_stream(
        spark, df, plan, output_mode="update", n_files=3,
        progress_out=progress,
    )
    assert out.count() >= 1
    assert progress["num_triggers"] >= 3
    assert progress["max_state_rows"] >= 1
    assert progress["max_state_bytes"] > 0
    assert isinstance(progress["state_operators"], list)


def test_null_timestamps_belong_to_neither_half(spark, tmp_path):
    """Review regression: a NULL event time belongs to NEITHER drift
    half (SQL-twin semantics: `t < bd` is NULL → the row joins into no
    side) — it must not fold into `current` via NaN comparison."""
    rng = random.Random(1)
    src = tmp_path / "src"
    src.mkdir()
    rows = _mk_rows(rng, 100, key="n")
    _write_csv(src / "a.csv", rows)
    # append rows with an EMPTY timestamp field (csv → null)
    with open(src / "a.csv", "a") as fh:
        for _ in range(50):
            fh.write("n,999999,\n")
    latest: dict = {}
    _run_stream(spark, src, tmp_path / "ckpt", 1 << 16, latest)
    snap = latest["n"]
    assert snap["n_ref"] + snap["n_cur"] == 100  # null-t rows excluded
