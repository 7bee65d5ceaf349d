"""Token-bucket rate limiting over an event stream — the one operator
family in the catalog whose state is GENUINELY sequential.

A token bucket holds ``capacity`` tokens, refills at ``rate`` tokens
per 1000 seconds (clamped at capacity — the two-sided clamp), and admits an
event iff the current level covers its cost.  Unlike the floor-only
clamp (see catalog.clamped_running_balance's prefix-min identity), the
cap+floor+conditional-spend recurrence has no window-algebra closed
form: level_t depends on min(capacity, level_{t-1} + refill_t) AND on
whether event t-1 was admitted.  This is the documented tier-(b) case
from the engine's ground rules — when DataFrame algebra genuinely
cannot express the semantics, drop to an Arrow-batched fold keyed on
the entity (one ``mapInArrow`` pass over key-clustered, key-sorted
partitions since r12), never to a row-at-a-time UDF and never to the
driver.

Scale shape: one hash(key) exchange + one Arrow transfer per batch;
state is O(1) per key inside the loop and each key's event history is
a contiguous run within its partition (bounded, day-partitionable if
an entity's history outgrows a task).  All arithmetic is integer
(cents, microseconds, integer refill floor) so the Python loop is
bit-reproducible and — the reason the catalog can carry it — EXACTLY
matched by a DuckDB recursive-CTE oracle folding the same recurrence.

Reference anchor: the reference's ingestion scripts throttle
re-extraction by timestamp freshness checks (extract-script guard
loops); the token bucket is that admission control generalized to a
rate contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _out_schema(key_col: str, key_type: str) -> str:
    """Output schema is derived from the caller's key column — the
    result column carries the caller's name and type, not a
    hard-coded ``user_id``."""
    return (
        f"{key_col} {key_type}, n_events bigint, n_admitted bigint, "
        "n_throttled bigint, final_level_cents bigint"
    )


def token_bucket_throttle(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    order_col: str = "event_id",
    cost_col: str = "cost",
    capacity_cents: int = 50_000,
    rate_cents_per_ks: int = 300,
) -> DataFrame:
    """→ (key, n_events, n_admitted, n_throttled, final_level_cents).

    ``cost_col`` must be integer cents.  The bucket starts full; at
    each event the elapsed-time refill ``gap_us * rate //
    1_000_000_000`` (integer floor, rate in cents per 1000 s) is
    added and clamped at capacity, then the event is admitted iff
    ``level >= cost`` (spending ``cost``).
    """
    cap, rate = int(capacity_cents), int(rate_cents_per_ks)

    def fold_partition(batches):
        # One Python call PER ARROW BATCH, not per group: the rows
        # arrive key-clustered (hash-partitioned) and (key, t, ord)-
        # sorted (JVM sort, nulls first), so each key's history is a
        # contiguous run; the fold carries O(1) state across batch
        # boundaries and emits a key's summary row when its run ends.
        # Finished keys are flushed every ~10k to bound the output
        # buffer on high-cardinality partitions.
        #
        # mapInArrow, NOT mapInPandas (review finding, r12): pandas
        # conversion turns an int64 key column containing any null
        # into float64 — NaN != NaN would split the null-key group
        # into one run per row, and int64 keys >= 2^53 sharing a
        # batch with a null would be silently rounded.  pyarrow's
        # ``as_py`` keeps every key exact (None for null), and null
        # runs compare via an explicit null flag, matching the old
        # groupBy semantics where all null keys form ONE group.
        import pyarrow as pa

        first = True
        cur_key = None
        cur_null = False
        cur_nan = False
        level = admitted = n = 0
        prev_us = None
        keys: list = []
        rows: list[tuple] = []
        key_arrow_type = None

        def batch_of() -> "pa.RecordBatch":
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(keys, type=key_arrow_type),
                    pa.array([r[0] for r in rows], type=pa.int64()),
                    pa.array([r[1] for r in rows], type=pa.int64()),
                    pa.array([r[0] - r[1] for r in rows], type=pa.int64()),
                    pa.array([r[2] for r in rows], type=pa.int64()),
                ],
                names=[
                    key_col, "n_events", "n_admitted", "n_throttled",
                    "final_level_cents",
                ],
            )

        for batch in batches:
            if key_arrow_type is None:
                key_arrow_type = batch.schema.field("_key").type
            # bulk to_pylist, not per-element pa.Scalar indexing
            # (review finding): one C-level conversion per column per
            # batch, identical exactness (int stays int, null → None)
            kvals = batch.column(batch.schema.get_field_index("_key")).to_pylist()
            tvals = batch.column(batch.schema.get_field_index("_t_us")).to_pylist()
            cvals = batch.column(batch.schema.get_field_index("_cost")).to_pylist()
            for k, t_us, cost in zip(kvals, tvals, cvals):
                k_null = k is None
                # NaN keys: groupBy normalizes NaN = NaN into ONE
                # group (and the JVM sort clusters them), so the run
                # check must too — plain k != cur_key would split
                # every NaN row into its own bucket (review finding)
                k_nan = (not k_null) and isinstance(k, float) and k != k
                if first or k_null != cur_null or k_nan != cur_nan or (
                    not k_null and not k_nan and k != cur_key
                ):
                    if not first:
                        keys.append(cur_key)
                        rows.append((n, admitted, level))
                    cur_key, cur_null, cur_nan = k, k_null, k_nan
                    level, prev_us, admitted, n = cap, None, 0, 0
                    first = False
                if prev_us is not None:
                    level = min(
                        cap, level + (t_us - prev_us) * rate // 1_000_000_000
                    )
                prev_us = t_us
                if level >= cost:
                    level -= cost
                    admitted += 1
                n += 1
            if len(rows) >= 10_000:
                yield batch_of()
                keys, rows = [], []
        if not first:
            keys.append(cur_key)
            rows.append((n, admitted, level))
        if rows:
            yield batch_of()

    key_type = events.schema[key_col].dataType.simpleString()
    prepared = events.select(
        F.col(key_col).alias("_key"),
        F.unix_micros(F.col(time_col)).alias("_t_us"),
        F.col(order_col).alias("_ord"),
        F.col(cost_col).cast("long").alias("_cost"),
    )
    # hash(key) exchange clusters each key's whole history into one
    # partition; the JVM (key, t, ord) sort makes runs contiguous and
    # the fold order-deterministic regardless of shuffle order.  A
    # grouped applyInPandas here would cost one Python call + pandas
    # frame per KEY (measured 2-4 s/1500 keys at sf0.1); the Arrow
    # fold costs one call per batch with the identical recurrence.
    return (
        prepared.repartition("_key")
        .sortWithinPartitions("_key", "_t_us", "_ord")
        .mapInArrow(fold_partition, schema=_out_schema(key_col, key_type))
    )
