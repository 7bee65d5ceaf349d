"""Streaming heavy-hitter candidates — the stateful-stream twin of
``operators.heavyhitters.heavy_hitters_exact``'s candidate pass.

The batch operator runs Misra-Gries per PARTITION and unions; the
stream runs the SAME fold (``misra_gries_fold``, shared code) per
HASH BUCKET with the counters living in the streaming state store, so
an unbounded feed maintains an always-current candidate set with O(k)
state per bucket.  Hash-bucketing by key makes the guarantee even
tighter than the batch union argument: a key's entire global count
lands in one bucket, so any key with global count > n/k certainly
exceeds its bucket's n_b/k and survives that bucket's decrements —
the emitted candidates are a superset of the true heavy hitters at
every trigger, with lower-bound counts (true − n_b/k ≤ emitted ≤
true, the MG error envelope).

Periodic exact reconciliation is the batch half: feed the candidate
keys to a verification count over the stored corpus (exactly what
``heavy_hitters_exact`` phase 2 does) whenever exact figures are
needed — the stream keeps the candidate set hot; the batch pass makes
it exact.

Checkpointed ``availableNow`` runs resume the counters from the state
store, so the candidate set is identical whether the history arrives
in one batch or dribbles in over many restarts (e2e-tested).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from curw_mike_data_handler_spark.operators.heavyhitters import misra_gries_fold

OUTPUT_SCHEMA = (
    "bucket int, key string, lower_count bigint, bucket_rows bigint"
)
STATE_SCHEMA = "keys array<string>, counts array<bigint>, n bigint"


def _make_fn(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            keys, counts, n = state.get
            counters = dict(zip(keys, counts))
        else:
            counters, n = {}, 0
        pdf = pd.concat(list(pdfs))
        n += len(pdf)
        for kk, c in pdf["key"].value_counts().items():
            misra_gries_fold(counters, kk, int(c), k)
        state.update(
            (list(counters.keys()),
             [int(v) for v in counters.values()],
             int(n))
        )
        yield pd.DataFrame(
            {
                "bucket": [bucket] * len(counters),
                "key": list(counters.keys()),
                "lower_count": [int(v) for v in counters.values()],
                "bucket_rows": [int(n)] * len(counters),
            }
        )

    return fn


def heavy_hitter_candidates_stream(
    events: DataFrame,
    key_col: str,
    *,
    k: int = 32,
    n_buckets: int = 8,
) -> DataFrame:
    """Streaming candidate maintenance: → (bucket, key, lower_count,
    bucket_rows) per trigger in ``update`` output mode (each bucket
    re-emits its current summary whenever it sees data).  NULL keys
    are dropped, like the batch twin.

    Scale shape: one hash(bucket) exchange per trigger; state is
    n_buckets × O(k) counters regardless of key cardinality — the
    streaming analog of "the raw key domain never shuffles"."""
    keyed = (
        events.select(F.col(key_col).cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .withColumn("bucket", F.pmod(F.hash("key"), F.lit(n_buckets)).cast("int"))
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_fn(k),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
