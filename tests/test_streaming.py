"""Structured Streaming ingestion tests (SURVEY §2.9): availableNow
exactly-once file processing with checkpointed progress + foreachBatch
upsert — the cron-as-stream replacement for the reference's 40-minute
mtime polling.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from curw_mike_data_handler_spark.sources.upsert import ParquetMergeTable
from curw_mike_data_handler_spark.streaming.file_watch import (
    run_available_now,
    stream_csv_dir,
)

SCHEMA = StructType(
    [
        StructField("tms_id", StringType()),
        StructField("time", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _write(path, rows):
    path.write_text("".join(f"{i},{t},{v}\n" for i, t, v in rows))


def test_available_now_exactly_once(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    table = ParquetMergeTable(spark, str(tmp_path / "tbl"), ["tms_id", "time"], SCHEMA)

    _write(inbox / "a.csv", [("s1", "2020-05-22 00:00:00", 1.0),
                             ("s1", "2020-05-22 00:15:00", 2.0)])

    def sink(batch_df, batch_id):
        table.merge(batch_df)

    stream = stream_csv_dir(spark, str(inbox), SCHEMA, header=False)
    run_available_now(stream, ckpt, sink)
    assert table.read().count() == 2

    # second tick with no new files: nothing reprocessed
    run_available_now(stream_csv_dir(spark, str(inbox), SCHEMA, header=False), ckpt, sink)
    assert table.read().count() == 2

    # new file with one overlapping key → upsert, not duplicate
    _write(inbox / "b.csv", [("s1", "2020-05-22 00:15:00", 20.0),
                             ("s1", "2020-05-22 00:30:00", 3.0)])
    run_available_now(stream_csv_dir(spark, str(inbox), SCHEMA, header=False), ckpt, sink)
    got = {(r["tms_id"], str(r["time"])): r["value"] for r in table.read().collect()}
    assert len(got) == 3
    assert got[("s1", "2020-05-22 00:15:00")] == 20.0  # last writer wins


def test_watermarked_window_stream_late_data(spark, tmp_path):
    """Streaming A1: right-closed buckets finalize exactly once when the
    watermark passes; later-than-watermark rows are dropped."""
    from curw_mike_data_handler_spark.streaming.windowed import (
        windowed_sum_right_closed_stream,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], str(r["time"]), r["value"]) for r in batch_df.collect()
        )

    def tick():
        stream = windowed_sum_right_closed_stream(
            stream_csv_dir(spark, str(inbox), SCHEMA, header=False),
            step_minutes=15,
            watermark="20 minutes",
            time_col="time",
            value_col="value",
            key_cols=("tms_id",),
        )
        run_available_now(stream, ckpt, sink)

    # boundary row 00:15:00 belongs to the bucket it ENDS (right-closed)
    _write(inbox / "a.csv", [("s1", "2020-05-22 00:05:00", 5.0),
                             ("s1", "2020-05-22 00:15:00", 1.0),
                             ("s1", "2020-05-22 00:20:00", 2.0),
                             ("s1", "2020-05-22 00:50:00", 3.0)])
    tick()

    # 00:10 arrives after the watermark (00:30) passed its bucket → dropped;
    # 01:40 advances the watermark to 01:20 → buckets 00:30 and 01:00 finalize
    _write(inbox / "b.csv", [("s1", "2020-05-22 00:10:00", 99.0),
                             ("s1", "2020-05-22 01:40:00", 7.0)])
    tick()

    got = {(k, t): v for k, t, v in out}
    assert len(out) == len(got), "each bucket must be emitted exactly once"
    assert got[("s1", "2020-05-22 00:15:00")] == 6.0  # 5.0 + boundary 1.0
    assert got[("s1", "2020-05-22 00:30:00")] == 2.0  # late 99.0 NOT included
    assert got[("s1", "2020-05-22 01:00:00")] == 3.0
    # 01:45 bucket not finalized yet (watermark 01:20 < 01:45)
    assert ("s1", "2020-05-22 01:45:00") not in got


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Replayed keys are admitted exactly once: duplicates within the
    watermark horizon are dropped across micro-batches, with bounded
    state (SURVEY §2.9 idempotence, stream-side)."""
    from curw_mike_data_handler_spark.streaming.dedupe import dedup_stream

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], str(r["time"]), r["value"]) for r in batch_df.collect()
        )

    def tick():
        stream = dedup_stream(
            stream_csv_dir(spark, str(inbox), SCHEMA, header=False),
            key_cols=("tms_id", "time"),
            time_col="time",
            watermark="30 minutes",
        )
        run_available_now(stream, ckpt, sink)

    # in-batch duplicate: same (tms_id, time) twice → one survivor
    _write(inbox / "a.csv", [("s1", "2020-05-22 00:00:00", 1.0),
                             ("s1", "2020-05-22 00:00:00", 1.0),
                             ("s1", "2020-05-22 00:05:00", 2.0)])
    tick()

    # cross-batch replay of 00:05 within the watermark → dropped;
    # genuinely new key admitted
    _write(inbox / "b.csv", [("s1", "2020-05-22 00:05:00", 2.0),
                             ("s1", "2020-05-22 00:10:00", 3.0)])
    tick()

    keys = [(k, t) for k, t, _ in out]
    assert len(keys) == len(set(keys)), f"duplicate keys emitted: {out}"
    assert set(keys) == {
        ("s1", "2020-05-22 00:00:00"),
        ("s1", "2020-05-22 00:05:00"),
        ("s1", "2020-05-22 00:10:00"),
    }


def test_stream_static_dim_enrichment(spark, tmp_path):
    """Stream-static join: the streaming fact enriches against a static
    dimension (the reference's dict-lookup J4 in streaming form).  The
    static side re-resolves per micro-batch; unknown stations drop via
    the inner join exactly like the batch membership filter P6."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    dim = spark.createDataFrame(
        [("s1", "Hanwella"), ("s2", "Glencourse")], "tms_id string, station string"
    )

    _write(inbox / "a.csv", [("s1", "2020-05-22 00:00:00", 1.0),
                             ("s2", "2020-05-22 00:00:00", 2.0),
                             ("sX", "2020-05-22 00:00:00", 9.0)])

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    stream = stream_csv_dir(spark, str(inbox), SCHEMA, header=False).join(dim, "tms_id")
    run_available_now(stream, ckpt, sink)
    got = {(r["station"], r["value"]) for r in out}
    assert got == {("Hanwella", 1.0), ("Glencourse", 2.0)}  # sX dropped


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live streams joined directly on key + bounded time range —
    matches emit without a DB round-trip, range bound keeps join state
    finite, and cross-batch pairs match from retained state."""
    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark.streaming.joins import stream_interval_join

    views_dir = tmp_path / "views"
    buys_dir = tmp_path / "buys"
    views_dir.mkdir()
    buys_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], str(r["view_time"]), str(r["buy_time"])) for r in batch_df.collect()
        )

    def tick():
        views = stream_csv_dir(spark, str(views_dir), SCHEMA, header=False).select(
            "tms_id", F.col("time").alias("view_time"), F.col("value").alias("view_value")
        )
        buys = stream_csv_dir(spark, str(buys_dir), SCHEMA, header=False).select(
            "tms_id", F.col("time").alias("buy_time"), F.col("value").alias("buy_value")
        )
        joined = stream_interval_join(
            views, buys, ("tms_id",), "view_time", "buy_time",
            max_lag_minutes=30, watermark="2 hours",
        )
        run_available_now(joined, ckpt, sink)

    _write(views_dir / "v1.csv", [("s1", "2020-05-22 00:00:00", 1.0),
                                  ("s1", "2020-05-22 01:00:00", 2.0),
                                  ("s2", "2020-05-22 00:00:00", 3.0)])
    _write(buys_dir / "b1.csv", [("s1", "2020-05-22 00:10:00", 10.0),   # in range of view 00:00
                                 ("s1", "2020-05-22 01:20:00", 20.0),   # in range of view 01:00
                                 ("s1", "2020-05-22 02:30:00", 30.0),   # no view within 30 min
                                 ("s2", "2020-05-22 00:40:00", 40.0)])  # outside 30-min bound
    tick()
    assert set(out) == {
        ("s1", "2020-05-22 00:00:00", "2020-05-22 00:10:00"),
        ("s1", "2020-05-22 01:00:00", "2020-05-22 01:20:00"),
    }

    # cross-batch: a buy in the NEXT micro-batch matches a view held in
    # join state from the previous one (watermark hasn't evicted it)
    _write(buys_dir / "b2.csv", [("s2", "2020-05-22 00:20:00", 50.0)])
    tick()
    assert ("s2", "2020-05-22 00:00:00", "2020-05-22 00:20:00") in set(out)
    assert len(out) == 3


def test_session_window_stream_matches_batch(spark, tmp_path):
    """The SAME F.session_window aggregation runs in batch and in a
    watermarked stream; on identical input the finalized streaming
    sessions must equal the batch sessions — the batch/stream unity
    that makes the native operator preferable to hand-rolled state
    when gap-merge semantics suffice."""
    from pyspark.sql import functions as F

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rows = [
        ("s1", "2020-05-22 00:00:00", 1.0),
        ("s1", "2020-05-22 00:10:00", 2.0),   # merges (gap 10m < 30m)
        ("s1", "2020-05-22 01:00:00", 4.0),   # 50m gap → new session
        ("s2", "2020-05-22 00:05:00", 8.0),
        # watermark pusher so every real session finalizes
        ("s3", "2020-05-22 09:00:00", 0.0),
    ]
    _write(inbox / "a.csv", rows)

    def sessionize(df):
        return (
            df.groupBy("tms_id", F.session_window("time", "30 minutes").alias("sw"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select(
                "tms_id",
                F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
                "n",
                "total",
            )
        )

    batch = {
        (r["tms_id"], r["s"]): (r["n"], r["total"])
        for r in sessionize(spark.read.schema(SCHEMA).csv(str(inbox))).collect()
    }

    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], r["s"], r["n"], r["total"]) for r in batch_df.collect()
        )

    stream = sessionize(
        stream_csv_dir(spark, str(inbox), SCHEMA, header=False).withWatermark(
            "time", "1 minute"
        )
    )
    run_available_now(stream, ckpt, sink)

    got = {(k, s): (n, t) for k, s, n, t in out}
    finalized = {k: v for k, v in batch.items() if k[0] != "s3"}
    assert got == finalized, (got, finalized)


def test_transform_with_state_latest_version(spark, tmp_path):
    """transformWithStateInPandas latest-version store: per key, a row
    is emitted only when the maximum version ADVANCES — newer versions
    shadow older ones across micro-batches, stale/duplicate replays
    emit nothing, and state survives restarts via the checkpoint
    (SURVEY §2.9 fgt-latest semantics, stream-side)."""
    import pytest
    from pyspark.sql.types import DoubleType, LongType, StringType

    from curw_mike_data_handler_spark.streaming.latest_state import (
        HAS_TWS,
        latest_version_stream,
    )

    if not HAS_TWS:
        pytest.skip(
            "transformWithStateInPandas runtime unavailable (its Python "
            "driver worker needs google.protobuf, absent in this env); "
            "processor logic covered by test_latest_version_processor_logic "
            "and the SAME semantics run e2e on applyInPandasWithState in "
            "test_apws_latest_version_store_advances_and_survives_restart"
        )

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("version", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["key"], r["version"], r["value"]) for r in batch_df.collect()
        )

    def tick():
        stream = latest_version_stream(
            stream_csv_dir(spark, str(inbox), schema, header=False)
        )
        run_available_now(stream, ckpt, sink)

    # batch 1: two keys; s1 sees versions 1 and 3 in ONE batch → only
    # the max (3) is emitted
    (inbox / "a.csv").write_text("s1,1,10.0\ns1,3,30.0\ns2,1,100.0\n")
    tick()
    assert sorted(out) == [("s1", 3, 30.0), ("s2", 1, 100.0)]

    # batch 2: stale version for s1 (2 < 3) → nothing; advance s2
    (inbox / "b.csv").write_text("s1,2,20.0\ns2,5,500.0\n")
    tick()
    assert sorted(out) == [("s1", 3, 30.0), ("s2", 1, 100.0), ("s2", 5, 500.0)]

    # batch 3: duplicate replay of s2 v5 → nothing (idempotent under
    # at-least-once); advance s1
    (inbox / "c.csv").write_text("s2,5,500.0\ns1,7,70.0\n")
    tick()
    assert sorted(out) == [
        ("s1", 3, 30.0),
        ("s1", 7, 70.0),
        ("s2", 1, 100.0),
        ("s2", 5, 500.0),
    ]


def test_latest_version_processor_logic():
    """The LatestVersionProcessor's argmax/emit contract, driven
    directly (no streaming runtime — the TWS Python worker needs
    protobuf, absent here): in-batch max wins, stale and duplicate
    versions emit nothing and never regress state, advancing versions
    emit exactly one row."""
    import pandas as pd

    from curw_mike_data_handler_spark.streaming.latest_state import (
        LatestVersionProcessor,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema):
            return self.state

    p = LatestVersionProcessor()
    h = FakeHandle()
    p.init(h)

    def feed(rows):
        out = list(
            p.handleInputRows(
                ("s1",),
                iter([pd.DataFrame(rows, columns=["version", "value"])]),
                None,
            )
        )
        return [tuple(r) for df in out for r in df.itertuples(index=False)]

    # in-batch max wins
    assert feed([(1, 10.0), (3, 30.0), (2, 20.0)]) == [("s1", 3, 30.0)]
    assert h.state.get() == (3, 30.0)
    # stale version: no emission, state unchanged
    assert feed([(2, 20.0)]) == []
    assert h.state.get() == (3, 30.0)
    # duplicate replay of the current version: idempotent
    assert feed([(3, 30.0)]) == []
    # advance
    assert feed([(7, 70.0)]) == [("s1", 7, 70.0)]
    assert h.state.get() == (7, 70.0)


def test_streaming_ohlc_bars_agree_with_batch(spark, tmp_path):
    """Stream/batch unification for OHLC: finalized streaming bars
    must equal the batch min_by/max_by aggregate over the same rows,
    and each bar is emitted exactly once."""
    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark.streaming.file_watch import (
        run_available_now,
        stream_csv_dir,
    )
    from curw_mike_data_handler_spark.streaming.windowed import ohlc_bars_stream

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], str(r["time"]), r["open"], r["high"], r["low"],
             r["close"], r["n_events"])
            for r in batch_df.collect()
        )

    def tick():
        stream = ohlc_bars_stream(
            stream_csv_dir(spark, str(inbox), SCHEMA, header=False),
            step_minutes=15,
            watermark="20 minutes",
            time_col="time",
            value_col="value",
            key_cols=("tms_id",),
        )
        run_available_now(stream, ckpt, sink)

    rows = [
        ("s1", "2020-05-22 00:01:00", 5.0),
        ("s1", "2020-05-22 00:07:00", 9.0),
        ("s1", "2020-05-22 00:14:00", 2.0),
        ("s1", "2020-05-22 00:20:00", 4.0),
        ("s2", "2020-05-22 00:03:00", 1.0),
    ]
    _write(inbox / "a.csv", rows)
    tick()
    # advance the watermark far enough to finalize every bucket above
    _write(inbox / "b.csv", [("s1", "2020-05-22 02:00:00", 8.0)])
    tick()

    got = {(k, t): rest for k, t, *rest in out}
    assert len(out) == len(got), "each bar must be emitted exactly once"

    batch = spark.createDataFrame(
        rows, "tms_id string, time string, value double"
    ).withColumn("time", F.to_timestamp("time"))
    key = F.array(F.unix_micros("time"))
    want_rows = (
        batch.groupBy("tms_id", F.window("time", "15 minutes").alias("w"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").cast("long").alias("n"),
        )
        .collect()
    )
    want = {
        (r["tms_id"], str(r["w"]["start"])): [r["open"], r["high"], r["low"],
                                              r["close"], r["n"]]
        for r in want_rows
    }
    assert got == want
    assert got[("s1", "2020-05-22 00:00:00")] == [5.0, 9.0, 2.0, 2.0, 3]


def test_streaming_token_bucket_matches_batch_across_restarts(spark, tmp_path):
    """Two checkpointed availableNow runs (history split mid-way) must
    reproduce the one-shot batch token-bucket fold exactly — state
    carry across restarts is the whole point of the streaming twin."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from curw_mike_data_handler_spark.operators.ratelimit import (
        token_bucket_throttle,
    )
    from curw_mike_data_handler_spark.sources.tables import load_table
    from curw_mike_data_handler_spark.streaming.file_watch import (
        run_available_now,
    )
    from curw_mike_data_handler_spark.streaming.ratelimit import (
        token_bucket_stream,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("event_id").alias("ord"),
        F.round(F.col("value") * 100).cast("long").alias("cost"),
    )
    batch_expect = {
        r.user_id: r
        for r in token_bucket_throttle(
            load_table(spark, sf, "events").select(
                "user_id", "ts", "event_id",
                F.round(F.col("value") * 100).cast("long").alias("cost"),
            ),
            capacity_cents=20_000,
            rate_cents_per_ks=100,
        ).collect()
    }

    split_us = ev.agg(F.expr("percentile(t_us, 0.5)")).collect()[0][0]
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = ev.schema
    for f in schema.fields:
        assert isinstance(f.dataType, LongType)

    final: dict[int, tuple] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            final[r.user_id] = (
                r.n_events,
                r.n_admitted,
                r.n_throttled,
                r.final_level_cents,
            )

    def run(half_df, tag):
        path = inbox / f"{tag}.csv"
        pdf = half_df.toPandas()
        path.write_text(
            "".join(
                f"{int(a)},{int(b)},{int(c)},{int(d)}\n"
                for a, b, c, d in zip(
                    pdf["user_id"], pdf["t_us"], pdf["ord"], pdf["cost"]
                )
            )
        )
        stream = token_bucket_stream(
            spark.readStream.schema(
                "user_id long, t_us long, ord long, cost long"
            ).csv(str(inbox)),
            capacity_cents=20_000,
            rate_cents_per_ks=100,
        )
        run_available_now(stream, ckpt, sink, output_mode="update")

    run(ev.filter(F.col("t_us") <= split_us), "a")
    run(ev.filter(F.col("t_us") > split_us), "b")

    assert set(final) == set(batch_expect)
    for uid, got in final.items():
        want = batch_expect[uid]
        assert got == (
            want.n_events,
            want.n_admitted,
            want.n_throttled,
            want.final_level_cents,
        ), uid


def test_apws_latest_version_store_advances_and_survives_restart(spark, tmp_path):
    """The applyInPandasWithState latest-version twin (the runtime
    that EXECUTES without protobuf): per key a row is emitted only
    when the max version advances — newer versions shadow older ones
    across micro-batches, stale/duplicate replays emit nothing, and
    state survives a checkpointed restart (the TWS variant's skipped
    e2e, on the runnable API)."""
    from curw_mike_data_handler_spark.streaming.file_watch import (
        run_available_now,
    )
    from curw_mike_data_handler_spark.streaming.latest_state import (
        latest_version_stream_apws,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.append((r.key, r.version, r.value))

    def run(rows, tag):
        (inbox / f"{tag}.csv").write_text(
            "".join(f"{k},{v},{x}\n" for k, v, x in rows)
        )
        stream = latest_version_stream_apws(
            spark.readStream.schema("key string, version long, value double")
            .csv(str(inbox))
        )
        run_available_now(stream, ckpt, sink, output_mode="update")

    # batch 1: two keys, duplicate versions inside the batch
    run([("a", 3, 1.5), ("a", 3, 1.5), ("b", 1, 9.0)], "t0")
    assert sorted(emitted) == [("a", 3, 1.5), ("b", 1, 9.0)]

    # batch 2 (fresh query, same checkpoint): stale + advance + new key
    emitted.clear()
    run([("a", 2, 7.7), ("b", 5, 4.0), ("c", 1, 0.5)], "t1")
    assert sorted(emitted) == [("b", 5, 4.0), ("c", 1, 0.5)]

    # batch 3: pure replay of stale versions → silence
    emitted.clear()
    run([("a", 3, 1.5), ("b", 5, 4.0)], "t2")
    assert emitted == []


def test_stream_asof_spine_append_mode_across_restarts(spark, tmp_path):
    """Stream-side as-of spine (r9): in APPEND mode with a tight
    watermark, each (key, grid point) emits exactly once when the
    watermark passes it, late observations beyond the horizon are
    dropped, and a restart from the checkpoint resumes without
    re-emitting finalized slots."""
    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark.streaming.asof_spine import (
        stream_asof_spine,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], str(r["slot"]), r["value"], str(r["obs_time"]))
            for r in batch_df.collect()
        )

    def tick():
        stream = stream_asof_spine(
            stream_csv_dir(spark, str(inbox), SCHEMA, header=False),
            key_cols=["tms_id"],
            time_col="time",
            value_col="value",
            step_minutes=15,
            tolerance_steps=2,
            watermark="20 minutes",
        )
        run_available_now(stream, ckpt, sink)

    # slot 00:15 gets obs 00:05 and 00:14 (latest wins); slot 00:30 is
    # served by 00:14 via tolerance_steps=2; 02:00 pushes the watermark
    # past both
    _write(inbox / "a.csv", [("s1", "2020-05-22 00:05:00", 1.0),
                             ("s1", "2020-05-22 00:14:00", 2.0),
                             ("s1", "2020-05-22 02:00:00", 9.0)])
    tick()
    got = {(k, s): (v, t) for k, s, v, t in out}
    assert got[("s1", "2020-05-22 00:15:00")] == (2.0, "2020-05-22 00:14:00")
    assert got[("s1", "2020-05-22 00:30:00")] == (2.0, "2020-05-22 00:14:00")
    n_first = len(out)

    # restart (same checkpoint): a late row for the finalized 00:15
    # slot is beyond the watermark → dropped; a fresh row advances the
    # watermark and finalizes its own slots; nothing re-emits
    _write(inbox / "b.csv", [("s1", "2020-05-22 00:10:00", 99.0),
                             ("s1", "2020-05-22 04:00:00", 7.0)])
    tick()
    keys = [(k, s) for k, s, _, _ in out]
    assert len(keys) == len(set(keys)), f"slot re-emitted: {out}"
    got = {(k, s): (v, t) for k, s, v, t in out}
    assert got[("s1", "2020-05-22 00:15:00")] == (2.0, "2020-05-22 00:14:00")
    # 02:00's slots finalized by the 04:00 watermark push
    assert got[("s1", "2020-05-22 02:00:00")] == (9.0, "2020-05-22 02:00:00")
    assert len(out) > n_first

    # batch equivalence on the finalized prefix: the same operator run
    # as a plain batch over the non-late rows agrees on every emitted slot
    batch_rows = [("s1", "2020-05-22 00:05:00", 1.0),
                  ("s1", "2020-05-22 00:14:00", 2.0),
                  ("s1", "2020-05-22 02:00:00", 9.0),
                  ("s1", "2020-05-22 04:00:00", 7.0)]
    bdf = spark.createDataFrame(
        batch_rows, "tms_id string, time string, value double"
    ).withColumn("time", F.to_timestamp("time"))
    batch = {
        (r["tms_id"], str(r["slot"])): (r["value"], str(r["obs_time"]))
        for r in stream_asof_spine(
            bdf, key_cols=["tms_id"], time_col="time", value_col="value",
            step_minutes=15, tolerance_steps=2,
        ).collect()
    }
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])


def test_stream_outer_interval_join_null_emission_across_restarts(spark, tmp_path):
    """LEFT OUTER stream-stream interval join under a TIGHT watermark
    (the regime the replay gate can't exercise): the unmatched left
    row's NULL emission (a) waits until the watermark proves no match
    can arrive, (b) survives a checkpoint restart — the watermark and
    join state resume from the commit log, and the eviction happens in
    a post-restart batch — and (c) happens exactly once: further
    restarts and further data must not re-emit it."""
    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark.streaming.joins import stream_interval_join

    views_dir = tmp_path / "views"
    buys_dir = tmp_path / "buys"
    views_dir.mkdir()
    buys_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"], str(r["view_time"]),
             None if r["buy_time"] is None else str(r["buy_time"]))
            for r in batch_df.collect()
        )

    def tick():
        # every call rebuilds the query from the checkpoint — a restart
        views = stream_csv_dir(spark, str(views_dir), SCHEMA, header=False).select(
            "tms_id", F.col("time").alias("view_time"), F.col("value").alias("view_value")
        )
        buys = stream_csv_dir(spark, str(buys_dir), SCHEMA, header=False).select(
            "tms_id", F.col("time").alias("buy_time"), F.col("value").alias("buy_value")
        )
        joined = stream_interval_join(
            views, buys, ("tms_id",), "view_time", "buy_time",
            max_lag_minutes=30, watermark="1 hours", how="left_outer",
        ).select("tms_id", "view_time", "buy_time")
        run_available_now(joined, ckpt, sink)

    _write(views_dir / "v1.csv", [("s1", "2020-05-22 00:00:00", 1.0),
                                  ("s2", "2020-05-22 00:05:00", 2.0)])
    _write(buys_dir / "b1.csv", [("s1", "2020-05-22 00:10:00", 10.0)])
    tick()
    # the match emits immediately; s2's fate is still open (its 30-min
    # window could yet be matched by a later buy), so no NULL row
    assert ("s1", "2020-05-22 00:00:00", "2020-05-22 00:10:00") in set(out)
    assert not [r for r in out if r[2] is None]

    # advance BOTH watermarks past s2's deadline (00:35 + 1 h delay)
    _write(views_dir / "v2.csv", [("s9", "2020-05-22 03:00:00", 0.0)])
    _write(buys_dir / "b2.csv", [("s9", "2020-05-22 03:00:30", 0.0)])
    tick()
    # watermark moved at the END of that run; the eviction needs a
    # subsequent batch — which arrives after a RESTART, from new data
    _write(buys_dir / "b3.csv", [("s9", "2020-05-22 03:30:00", 0.0)])
    tick()
    nulls = [r for r in out if r[2] is None]
    assert ("s2", "2020-05-22 00:05:00", None) in nulls, out

    # exactly-once: another restart with and without new data must not
    # re-emit the NULL row (state was cleaned, offsets committed)
    tick()
    _write(buys_dir / "b4.csv", [("s9", "2020-05-22 04:00:00", 0.0)])
    tick()
    nulls = [r for r in out if r[2] is None and r[0] == "s2"]
    assert len(nulls) == 1, out


def test_stream_right_outer_interval_join_emits_unmatched_buys(spark, tmp_path):
    """The right_outer branch (untested API surface flagged in
    review): an unmatched BUY emits with NULL view columns once the
    watermark passes ITS event time (a right row's window looks
    backward — it can only match earlier views), the key column
    survives from the right side, and emission is exactly once."""
    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark.streaming.joins import stream_interval_join

    views_dir = tmp_path / "views"
    buys_dir = tmp_path / "buys"
    views_dir.mkdir()
    buys_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(batch_df, batch_id):
        out.extend(
            (r["tms_id"],
             None if r["view_time"] is None else str(r["view_time"]),
             str(r["buy_time"]))
            for r in batch_df.collect()
        )

    def tick():
        views = stream_csv_dir(spark, str(views_dir), SCHEMA, header=False).select(
            "tms_id", F.col("time").alias("view_time"), F.col("value").alias("view_value")
        )
        buys = stream_csv_dir(spark, str(buys_dir), SCHEMA, header=False).select(
            "tms_id", F.col("time").alias("buy_time"), F.col("value").alias("buy_value")
        )
        joined = stream_interval_join(
            views, buys, ("tms_id",), "view_time", "buy_time",
            max_lag_minutes=30, watermark="1 hours", how="right_outer",
        ).select("tms_id", "view_time", "buy_time")
        run_available_now(joined, ckpt, sink)

    _write(views_dir / "v1.csv", [("s1", "2020-05-22 00:00:00", 1.0)])
    _write(buys_dir / "b1.csv", [("s1", "2020-05-22 00:10:00", 10.0),   # matched
                                 ("s2", "2020-05-22 00:05:00", 20.0)])  # never matched
    tick()
    assert ("s1", "2020-05-22 00:00:00", "2020-05-22 00:10:00") in set(out)
    assert not [r for r in out if r[1] is None]

    # advance both watermarks past the unmatched buy's event time,
    # then give the join a post-restart batch to evict into
    _write(views_dir / "v2.csv", [("s9", "2020-05-22 03:00:00", 0.0)])
    _write(buys_dir / "b2.csv", [("s9", "2020-05-22 03:00:30", 0.0)])
    tick()
    _write(views_dir / "v3.csv", [("s9", "2020-05-22 03:30:00", 0.0)])
    tick()
    nulls = [r for r in out if r[1] is None]
    assert ("s2", None, "2020-05-22 00:05:00") in nulls, out
    tick()
    assert len([r for r in out if r[1] is None and r[0] == "s2"]) == 1, out


def test_streaming_heavy_hitter_candidates_across_restarts(spark, tmp_path):
    """The MG candidate set survives checkpointed restarts and keeps
    its completeness guarantee over the WHOLE history: after three
    separate availableNow runs, every key whose total count exceeds
    n/k must be in the final emission of its bucket, emitted counts
    are lower bounds within the n_b/k envelope, and the per-bucket row
    tallies sum to every row ever fed."""
    from collections import Counter

    from pyspark.sql import functions as F

    from curw_mike_data_handler_spark.streaming.heavyhitters import (
        heavy_hitter_candidates_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    latest: dict = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest.setdefault(r["bucket"], {})
            # update-mode semantics: newest emission per bucket wins
            latest[r["bucket"]][r["key"]] = (r["lower_count"], r["bucket_rows"])

    schema = "key string"

    def tick():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .csv(str(src))
        )
        out = heavy_hitter_candidates_stream(stream, "key", k=8, n_buckets=4)
        (out.writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())

    fed: list[str] = []

    def write_batch(name, keys):
        (src / name).write_text("".join(f"{k}\n" for k in keys))
        fed.extend(keys)

    write_batch("a.csv", ["h1"] * 30 + ["h2"] * 20 + [f"c{i}" for i in range(40)])
    tick()
    write_batch("b.csv", ["h1"] * 25 + [f"c{i}" for i in range(40, 80)])
    tick()
    write_batch("c.csv", ["h2"] * 35 + ["h3"] * 40 + [f"c{i}" for i in range(80, 110)])
    tick()

    true = Counter(fed)
    n = len(fed)
    emitted = {k: v for b in latest.values() for k, v in b.items()}
    # completeness: every global heavy hitter present after restarts
    for key, cnt in true.items():
        if cnt > n / 8:
            assert key in emitted, (key, cnt, n, emitted)
    # lower bounds: never overcount; never undercount past the envelope
    for key, (lc, _) in emitted.items():
        assert lc <= true[key]
    for key in ("h1", "h2", "h3"):
        lc, bucket_rows = emitted[key]
        assert lc >= true[key] - bucket_rows / 8 - 1e-9
    # per-bucket tallies account for every row ever fed (state — and
    # hence the running n_b — survived the two restarts)
    total_rows = sum(max(rows for _, rows in b.values()) for b in latest.values())
    assert total_rows == n
