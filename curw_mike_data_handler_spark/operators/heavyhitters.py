"""Exact heavy hitters via a Misra-Gries candidate pass (post-drain
roadmap: the mergeable heavy-hitters sketch the stats battery lacked).

Two passes, both cheap, output EXACT:

1. **Candidate generation** — every partition runs a Misra-Gries
   summary with ``k`` counters (Misra & Gries 1982; the batched form
   folds an Arrow batch's value_counts into the counter dict, so the
   per-item cost amortizes to O(distinct-per-batch)).  MG's guarantee
   per partition: any key with local count > n_p/k survives the
   decrements.  By pigeonhole, a key with GLOBAL count > n/k must
   exceed n_p/k in at least one partition, so the union of the
   per-partition summaries (≤ k·P keys, a few KB) contains every true
   global heavy hitter — possibly plus false positives, never minus.
2. **Verification** — the candidate union broadcasts back onto the
   fact; exact counts of just those keys (partial aggregation shrinks
   the shuffle to ≤ candidates × partitions rows) and the n/k
   threshold keep only the TRUE heavy hitters with their EXACT counts.

So the sketch does the memory-bounding work and the output is still
deterministic and oracle-checkable (a plain GROUP BY/HAVING computes
the same rows) — the standard "exact heavy hitters in two passes"
construction, distribution-friendly because phase 1 is embarrassingly
parallel and phase 2 never shuffles the raw fact, only the
candidate-filtered sliver after map-side combine.

Scale shape at 100 TB: phase 1 is a map-only scan with O(k) state per
task; phase 2 is a broadcast semi filter + one partial-aggregated
exchange bounded by k·P.  Nothing holds the key cardinality in memory
— which is the whole reason to prefer this over a raw
groupBy-then-filter when the key domain is huge (URLs, doc
fingerprints, user ids) and only the > n/k tail matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_fold(counters: dict, key, c: int, k: int) -> None:
    """Batched MG insert of ``c`` occurrences of ``key`` into a dict of
    at most ``k`` counters (in place).  The decrement step removes the
    same amount from every counter (classic MG, batched: Berinde et
    al., PODS 2009 §2), which preserves the invariant
    true_count - n/k ≤ counter ≤ true_count."""
    if key in counters:
        counters[key] += c
        return
    if len(counters) < k:
        counters[key] = c
        return
    m = min(counters.values())
    dec = m if m < c else c
    if c > dec:
        counters[key] = c - dec
    for other in list(counters):
        left = counters[other] - dec
        if left > 0 and other != key:
            counters[other] = left
        elif other != key:
            del counters[other]


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 32,
    threshold_ratio: float | None = None,
) -> DataFrame:
    """→ (key, n_occurrences) for every key whose EXACT count exceeds
    ``threshold_ratio`` (default 1/k) of the total row count, found
    with bounded memory via the two-pass MG construction above.

    ``k`` is the per-partition counter budget and must satisfy
    1/k ≤ threshold_ratio, or candidate generation could miss a true
    hitter (raises).  NULL keys are ignored (no NULL heavy hitter)."""
    ratio = 1.0 / k if threshold_ratio is None else threshold_ratio
    if ratio * k < 1.0 - 1e-12:
        raise ValueError(
            f"threshold_ratio {ratio} below the MG guarantee 1/k = {1.0 / k}"
            f" — raise k or the threshold"
        )
    keyed = df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull())

    out_type = keyed.schema["key"].dataType.simpleString()

    # the candidate pass also carries each partition's row count (one
    # NULL-keyed tally row per partition), so the total n needs no
    # second scan of the fact — two scans total, as advertised; the
    # tiny summary (≤ (k+1)·P rows) is localCheckpoint-ed because two
    # branches (candidates, total) consume it
    def _candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for key, c in pdf["key"].value_counts().items():
                misra_gries_fold(counters, key, int(c), k)
        keys = list(counters.keys())
        yield pd.DataFrame(
            {
                "key": pd.Series(keys + [None], dtype=object),
                "part_rows": pd.Series([None] * len(keys) + [n_rows],
                                       dtype="Int64"),
            }
        )

    summary = keyed.mapInPandas(
        _candidates, schema=f"key {out_type}, part_rows long"
    ).localCheckpoint()
    cand = summary.filter(F.col("key").isNotNull()).select("key").distinct()
    total = summary.agg(F.sum("part_rows").alias("__n"))
    counts = (
        keyed.join(F.broadcast(cand), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("__n") * F.lit(ratio))
        .select("key", "n_occurrences")
    )
