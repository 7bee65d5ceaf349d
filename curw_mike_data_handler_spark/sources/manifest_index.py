"""Transactional secondary index over manifest tables (round 12,
r11 verdict #3): a posting-list table mapping indexed-column VALUES to
the base-table BUCKETS that contain them, maintained in the SAME
``commit_multi_table`` transaction as its base — so an atomic reader
never sees a base the index doesn't cover — and consulted by a
point-lookup read that scans only the posted buckets' files.

Why bucket postings (not file postings): bucket ids survive
compaction and COW rewrites (files only ever rewrite within their
bucket), so the index stays valid across every content-preserving
maintenance operation without reindexing; only a REBUCKET (an
explicit layout migration) invalidates it, which the lookup detects
from the recorded base spec and refuses loudly.

Coverage contract, stated plainly: the index lists every
(value, bucket) pair ever written through ``create_manifest_index``,
``append_with_index``, or ``merge_with_index`` — a superset of the
live pairs is fine (a stale posting costs one extra pruned-file
scan, the equality filter still runs), a missing pair is a wrong
answer.  Appends, key-deletes, and maintained merges all preserve
the superset property (``merge_with_index`` posts the update batch's
new values in the same transaction as the base's COW rewrite); only
an UNMAINTAINED ``merge_manifest_table`` that changes indexed values
writes pairs the index never saw — route such updates through
``merge_with_index`` or rebuild.  The lookup is a
TXN-ATOMIC read: base and index resolve at versions pinned by one
txn catalog, so rows appended outside any transaction are invisible
to it (the standing read_tables_atomic contract).

Spark-first shape: the index is itself a manifest table bucketed by
the indexed column with a Bloom point filter on it, so the lookup's
index probe is a Bloom-pruned scan of typically ONE file; the base
scan is an explicit posted-bucket file list with the equality filter
pushed into parquet.  At 100 TB a selective point lookup touches a
handful of files instead of the lake — the classic secondary-index
trade, derived from manifest truth.

Reference parity: the reference point-filters registry scans in SQL
(``get_station_id``-style lookups, db_layer.py) against an indexed
MySQL column; this module gives the lakehouse layout the same
selective-lookup capability.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.sources import manifest_bucketed as mb

_BUCKET_COL = "posting_bucket"


def _postings_of(df: DataFrame, column: str, base_manifest: dict) -> DataFrame:
    """Distinct (value, base-bucket) pairs of a batch under the base's
    CURRENT bucket spec."""
    return (
        df.select(
            F.col(column),
            mb.spark_bucket_id(
                base_manifest["num_buckets"], *base_manifest["bucket_cols"]
            ).alias(_BUCKET_COL),
        )
        .distinct()
    )


def _index_meta_path(root: str, index: str) -> str:
    return os.path.join(mb._table_dir(root, index), "INDEX")


def read_index_meta(root: str, index: str) -> dict:
    """The index's immutable coverage record, written once at create:
    ``{"table", "column", "base_buckets", "base_bucket_cols"}`` —
    stored beside the manifests (not inside them) so no per-commit
    maintenance or rewrite of published manifests is ever needed."""
    import json

    try:
        with open(_index_meta_path(root, index)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"{index} is not an index table (no INDEX metadata) — "
            f"create it with create_manifest_index"
        ) from None


def create_manifest_index(
    spark: SparkSession,
    root: str,
    table: str,
    index: str,
    *,
    column: str,
    num_buckets: int = 8,
) -> int:
    """Build the posting-list index over the base's CURRENT snapshot
    and pin (base, index) as one atomic group.  Returns the txn
    version the pair is readable at.

    The INDEX metadata file records which (table, column, bucket
    spec) the postings cover; every maintenance append re-checks the
    spec so a rebucketed base fails loudly instead of mis-addressing
    buckets."""
    import json

    base_m = mb.read_manifest(root, table)
    if column not in mb._ddl_columns(base_m["schema_ddl"]):
        raise ValueError(f"{table} has no column {column!r}")
    postings = _postings_of(
        mb.read_manifest_table(spark, root, table, base_m["version"]),
        column, base_m,
    )
    mb.create_manifest_table(
        spark, postings, root, index,
        bucket_cols=column, num_buckets=num_buckets,
        sort_cols=_BUCKET_COL,
        point_filter_cols=column,
    )
    mb._durable_write(
        _index_meta_path(root, index),
        json.dumps({
            "table": table,
            "column": column,
            "base_buckets": base_m["num_buckets"],
            "base_bucket_cols": base_m["bucket_cols"],
        }),
    )
    # pin the EXACT snapshot the postings were computed over — pinning
    # "current" would adopt a concurrent append the postings never saw
    # and silently omit its rows from every lookup (review finding);
    # a base already pinned past that snapshot raises instead.
    return mb.pin_tables_txn(
        root, {table: base_m["version"],
               index: mb.current_version(root, index)},
    )


def append_with_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    table: str,
    index: str,
    *,
    batch_id: str | None = None,
    compact_files_per_bucket: int = 8,
    max_retries: int = 20,
    retry_wait_s: float = 0.5,
) -> int:
    """Append a batch to the base AND its postings to the index in ONE
    atomic transaction (the commit_multi_table catalog swap is the
    single commit point; a crash between the two staged writes leaves
    only invisible debris and the batch_id replay completes it —
    crash-injected in tests/test_manifest_index.py).  Returns the txn
    version."""
    base_m = mb.read_manifest(root, table)
    meta = read_index_meta(root, index)
    _check_index_covers(index, meta, table, base_m)
    df = df.localCheckpoint()  # postings and base append must see ONE
    # evaluation of a possibly nondeterministic source
    postings = _postings_of(df, meta["column"], base_m)
    return mb.commit_multi_table(
        spark, root, {table: df, index: postings},
        batch_id=batch_id,
        compact_files_per_bucket=compact_files_per_bucket,
        max_retries=max_retries, retry_wait_s=retry_wait_s,
    )


def _check_index_covers(index: str, meta: dict, table: str,
                        base_m: dict) -> None:
    """The shared coverage guard of every maintenance write: the index
    must target THIS base, under the bucket spec its postings were
    addressed with."""
    if meta["table"] != table:
        raise ValueError(f"{index} indexes {meta['table']!r}, not {table!r}")
    if (meta["base_buckets"] != base_m["num_buckets"]
            or meta["base_bucket_cols"] != base_m["bucket_cols"]):
        raise ValueError(
            f"{table} was re-bucketed since {index} was built "
            f"({meta['base_bucket_cols']}×{meta['base_buckets']} -> "
            f"{base_m['bucket_cols']}×{base_m['num_buckets']}) — "
            f"rebuild the index"
        )


def merge_with_index(
    spark: SparkSession,
    updates: DataFrame,
    root: str,
    table: str,
    index: str,
    *,
    key_cols: str | list[str],
    batch_id: str | None = None,
    validate_unique_keys: bool = True,
    compact_files_per_bucket: int = 8,
    max_retries: int = 20,
    retry_wait_s: float = 0.5,
) -> int:
    """Row-level UPSERT of the base AND the update batch's postings
    in ONE atomic transaction (round 12, README roadmap #2) — the
    COW-merge twin of ``append_with_index``, closing the documented
    append-only maintenance contract: a merge that CHANGES the
    indexed column's value writes its new (value, bucket) pairs into
    the index at the same catalog swap, so the coverage superset
    property survives value-changing updates.

    Why the superset still holds: replaced rows' OLD values keep
    their postings (stale pairs cost one extra pruned scan, never a
    wrong answer); every NEW value in ``updates`` — changed or
    inserted — is posted from the batch itself; rows the merge does
    not touch were posted by create/append/merge_with_index already.
    Key-preserving updates can't move a row's bucket (``key_cols``
    must contain the bucket columns), so existing postings stay
    correctly addressed.

    The base merge is the same bucket-pruned copy-on-write rewrite as
    ``merge_manifest_table`` — staged under the transaction, visible
    only at the catalog swap (crash between the staged writes leaves
    invisible debris; ``batch_id`` replay completes it — crash-
    injected in tests/test_manifest_index.py)."""
    base_m = mb.read_manifest(root, table)
    meta = read_index_meta(root, index)
    _check_index_covers(index, meta, table, base_m)
    updates = updates.localCheckpoint()  # postings and base merge must
    # see ONE evaluation of a possibly nondeterministic source
    postings = _postings_of(updates, meta["column"], base_m)
    return mb.commit_multi_table(
        spark, root, {index: postings},
        merges={table: {"updates": updates, "key_cols": key_cols,
                        "validate_unique_keys": validate_unique_keys,
                        "materialized": True}},
        batch_id=batch_id,
        compact_files_per_bucket=compact_files_per_bucket,
        max_retries=max_retries, retry_wait_s=retry_wait_s,
    )


def read_manifest_point_indexed(
    spark: SparkSession,
    root: str,
    table: str,
    index: str,
    value,
    *,
    txn_version: int | None = None,
) -> DataFrame:
    """Point lookup THROUGH the index: probe the index for ``value``
    (Bloom-pruned to typically one file), collect its posted base
    buckets (bounded by the base's num_buckets), and scan ONLY those
    buckets' files with the equality filter pushed into parquet.
    Base and index resolve at the versions pinned by one txn catalog
    (``txn_version`` time-travels the pair), so the lookup is an
    atomic read: a base append the index hasn't covered yet is
    invisible rather than wrong."""
    cat = mb.read_txn_catalog(root, txn_version)
    pins = cat["tables"]
    for t in (table, index):
        if t not in pins:
            raise KeyError(
                f"table {t!r} is not pinned by txn catalog version "
                f"{cat['version']} — commit through append_with_index "
                f"or pin_tables_txn first"
            )
    idx_m = mb.read_manifest(root, index, pins[index])
    base_m = mb.read_manifest(root, table, pins[table])
    meta = read_index_meta(root, index)
    if meta["table"] != table:
        # same guard as the append path: a coincidentally same-spec
        # OTHER base would pass the bucket check and return an
        # arbitrary subset (review finding)
        raise ValueError(
            f"{index} indexes {meta['table']!r}, not {table!r}"
        )
    column = meta["column"]
    if (meta["base_buckets"] != base_m["num_buckets"]
            or meta["base_bucket_cols"] != base_m["bucket_cols"]):
        raise ValueError(
            f"{table}@{base_m['version']} bucket spec no longer matches "
            f"the index — rebuild the index"
        )
    # 1) index probe: Bloom point pruning typically opens ONE file
    posted = (
        mb.read_manifest_table_point(
            spark, root, index, column, value, version=idx_m["version"]
        )
        .filter(F.col(column) == F.lit(value))
        .select(_BUCKET_COL)
        .distinct()
        .collect()
    )
    buckets = {r[_BUCKET_COL] for r in posted}
    spec = {k: base_m[k] for k in
            ("bucket_cols", "num_buckets", "sort_cols", "schema_ddl")}
    schema = spark.table(
        mb._register(spark, root, table, base_m["version"], spec,
                     base_m["generation"])
    ).schema
    if not buckets:
        return spark.createDataFrame([], schema)
    # 2) base scan: ONLY the posted buckets' files, filter pushed down
    gen_dir = os.path.join(mb._table_dir(root, table), base_m["generation"])
    files = [f for f in base_m["files"] if mb._file_bucket(f) in buckets]
    df = mb._dv_filter(
        spark,
        spark.read.schema(schema).parquet(
            *[os.path.join(gen_dir, f) for f in files]
        ),
        base_m,
    )
    return df.filter(F.col(column) == F.lit(value))


def indexed_lookup_files(
    root: str, table: str, index: str, value, *, txn_version: int | None = None
) -> tuple[int, int]:
    """(files the indexed lookup scans, files a full scan would) — the
    observability hook the efficiency tests and the sf1 probe use."""
    cat = mb.read_txn_catalog(root, txn_version)
    idx_m = mb.read_manifest(root, index, cat["tables"][index])
    base_m = mb.read_manifest(root, table, cat["tables"][table])
    column = read_index_meta(root, index)["column"]
    # replicate the probe bounds without a Spark job: Bloom-pruned
    # index files are an upper bound on postings; here we only need
    # the base-side count, so read the postings via the Bloom filter
    # evidence — callers wanting exactness use the lookup itself.
    import pyarrow.parquet as pq

    tdir = mb._table_dir(root, index)
    gen_dir = os.path.join(tdir, idx_m["generation"])
    buckets: set = set()
    for f in mb.point_pruned_files(idx_m, column, value):
        t = pq.read_table(os.path.join(gen_dir, f),
                          columns=[column, _BUCKET_COL])
        vals = t.column(column).to_pylist()
        bks = t.column(_BUCKET_COL).to_pylist()
        buckets.update(b for v, b in zip(vals, bks) if v == value)
    base_files = [f for f in base_m["files"]
                  if mb._file_bucket(f) in buckets]
    return len(base_files), len(base_m["files"])
