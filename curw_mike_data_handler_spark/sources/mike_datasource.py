"""Spark 4 Python Data Source for MIKE wide result matrices
(SURVEY §2.1 S1/S2/S11 surface, re-expressed as a first-class
``spark.read.format(...)`` connector).

The reference consumes model output as a wide CSV — a 'Time Stamp'
index column plus one double column per station
(``outputs/extract_water_level.py:247`` ``pd.read_csv`` →
``set_index('Time Stamp')``; station headers are data, matched against
``resources/mike_stations.csv``).  Here that contract becomes a
declarative source:

    spark.dataSource.register(MikeResultsDataSource)
    df = (spark.read.format("mike_results")
          .option("path", "/data/run42").load())
    # → long format: ts timestamp, station string, value double,
    #   src_file string

Spark-first design notes:

* **Long, not wide.**  The reference melts implicitly by iterating
  columns; a distributed engine wants the tidy long form so station
  becomes a partition/join key.  The melt happens INSIDE the reader —
  Spark never materializes the wide row.
* **Partitioning = file × station-chunk.**  Each ``InputPartition``
  carries (file, column-slice), so a 10 000-station matrix fans out
  across the cluster without row-splitting the file; a directory of
  run outputs parallelizes by file as well.  At 100 TB the unit of
  work is still one (file, chunk) — no driver-side data pass, the
  driver reads ONE header line per file.
* **Filter pushdown.**  ``pushFilters`` accepts EqualTo/In on
  ``station`` and ``src_file``: station predicates prune COLUMNS
  before any row is parsed, file predicates prune whole partitions —
  the Python-source analog of parquet's PushedFilters.  Everything
  else is returned to Spark to re-apply.
* **Arrow batches out.**  ``read`` yields one ``pyarrow.RecordBatch``
  per partition (column-built, no per-row Python objects crossing the
  boundary) — the vectorized path the Python data-source API provides
  for exactly this case.
* **Streaming.**  ``MikeResultsDataSource`` also implements
  ``streamReader``: offsets index into the lexicographically-sorted
  file list (run outputs are append-only and timestamp-named, per the
  reference's hourly cron), so each microbatch reads exactly the new
  files — the same exactly-once file-watch semantics as
  ``streaming.file_watch`` but at the source API layer.
* **Writer.**  ``writer`` implements the commit protocol: each task
  writes ``part-<uuid>.csv`` (long format) and returns its name in a
  commit message; ``commit`` finalizes a ``_mike_manifest.json``
  naming exactly the committed parts (readers of the directory trust
  the manifest, so a failed/duplicate task attempt is invisible);
  ``abort`` removes the orphans.
"""

from __future__ import annotations

import csv
import hashlib
import io
import json
import logging
import os
import uuid
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "ts timestamp, station string, value double, src_file string"
_TIME_FMT = "%Y-%m-%d %H:%M:%S"
_log = logging.getLogger(__name__)


def _batch_sig(names: list[str]) -> str:
    """Order-stable 16-hex signature of a planned file list — small
    enough to live in every capped offset, strong enough that a replay
    re-listing a different set (stragglers arrived late, files lost)
    cannot silently masquerade as the original batch."""
    return hashlib.md5("\n".join(names).encode()).hexdigest()[:16]


def _list_files(path: str, pattern: str) -> list[str]:
    import fnmatch

    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if fnmatch.fnmatch(f, pattern)
    )


def _header_stations(path: str, time_col: str) -> list[str]:
    """Driver-side peek at ONE line — the only per-file driver work."""
    with open(path, newline="") as fh:
        header = next(csv.reader(fh))
    return [c for c in header if c != time_col]


@dataclass
class MikePartition(InputPartition):
    file: str
    stations: tuple[str, ...]


class _StationPruner:
    """Shared pushFilters logic for batch and stream readers."""

    def __init__(self) -> None:
        self.station_keep: set[str] | None = None
        self.file_keep: set[str] | None = None

    def push(self, filters: list[Filter]) -> list[Filter]:
        # Filters arrive as a conjunction: a second predicate on the
        # same column INTERSECTS the keep-set (overwriting would drop
        # one conjunct without returning it to Spark → leaked rows).
        def meet(cur: set[str] | None, new: set[str]) -> set[str]:
            return new if cur is None else cur & new

        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("station",):
                self.station_keep = meet(self.station_keep, {f.value})
            elif isinstance(f, In) and f.attribute == ("station",):
                self.station_keep = meet(self.station_keep, set(f.value))
            elif isinstance(f, EqualTo) and f.attribute == ("src_file",):
                self.file_keep = meet(self.file_keep, {f.value})
            elif isinstance(f, In) and f.attribute == ("src_file",):
                self.file_keep = meet(self.file_keep, set(f.value))
            else:
                unsupported.append(f)
        return unsupported

    def partitions_for(
        self, files: list[str], time_col: str, chunk: int
    ) -> list[MikePartition]:
        parts: list[MikePartition] = []
        for path in files:
            if self.file_keep is not None and os.path.basename(path) not in self.file_keep:
                continue
            stations = _header_stations(path, time_col)
            if self.station_keep is not None:
                stations = [s for s in stations if s in self.station_keep]
            for i in range(0, len(stations), chunk):
                parts.append(MikePartition(path, tuple(stations[i : i + chunk])))
        return parts


def _read_partition(part: MikePartition, time_col: str):
    """Executor-side: parse one (file, station-chunk) into ONE Arrow
    batch — columns built natively, no per-row Python objects cross
    the worker boundary."""
    import pyarrow as pa

    ts: list[datetime] = []
    station: list[str] = []
    value: list[float | None] = []
    with open(part.file, newline="") as fh:
        reader = csv.reader(fh)
        header = next(reader)
        t_idx = header.index(time_col)
        idxs = [(s, header.index(s)) for s in part.stations]
        for row in reader:
            if not row:
                continue
            t = datetime.strptime(row[t_idx], _TIME_FMT)
            for s, i in idxs:
                ts.append(t)
                station.append(s)
                value.append(float(row[i]) if row[i] != "" else None)
    src = os.path.basename(part.file)
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(station, type=pa.string()),
            pa.array(value, type=pa.float64()),
            pa.array([src] * len(ts), type=pa.string()),
        ],
        names=["ts", "station", "value", "src_file"],
    )


class MikeResultsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.pattern = options.get("pattern", "*.csv")
        self.time_col = options.get("time_col", "Time Stamp")
        self.chunk = int(options.get("stations_per_partition", "8"))
        self._pruner = _StationPruner()

    def pushFilters(self, filters: list[Filter]):
        return self._pruner.push(filters)

    def partitions(self):
        files = _list_files(self.path, self.pattern)
        return self._pruner.partitions_for(files, self.time_col, self.chunk)

    def read(self, partition: MikePartition):
        return _read_partition(partition, self.time_col)


@dataclass
class _FileOffset(InputPartition):
    pass


class MikeResultsStreamReader(DataSourceStreamReader):
    """Microbatch source over an append-only result directory: the
    offset records the LAST FILE NAME seen (not a positional index)
    PLUS the basenames actually listed for that batch, so a replayed
    (start, end] range re-reads exactly the recorded files — a
    straggler whose name lands inside an already-planned range after
    the fact is invisible both in normal operation AND on checkpoint
    replay (ADVICE r6 #2: name-range re-listing alone made replay
    depend on the producers' monotonic-name contract holding at
    listing time; the recorded list removes that dependence).  A
    recorded file that has vanished by replay time is data loss and
    fails loudly rather than silently shrinking the batch.  Producers
    are expected to write lexicographically-increasing names (e.g.
    timestamped); a file that appears sorting ≤ the committed
    high-water name is stale by contract and is ignored.  Offsets
    written by the older name-range-only reader (no ``batch`` field)
    replay via the legacy name-comparison path."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.pattern = options.get("pattern", "*.csv")
        self.time_col = options.get("time_col", "Time Stamp")
        self.chunk = int(options.get("stations_per_partition", "8"))
        self._high_water = ""  # monotonic guard for latestOffset

    @staticmethod
    def _name_of(offset: dict) -> str:
        if "last" not in offset:
            # a positional {"n": N} checkpoint from the pre-name-based
            # reader: reinterpreting it as "nothing seen" would replay
            # every file as duplicates — fail loudly instead.
            raise ValueError(
                "incompatible stream checkpoint: positional offset "
                f"{offset!r} predates the name-based reader; start the "
                "query with a fresh checkpoint location"
            )
        return offset["last"]

    # largest per-batch file list inlined into the offset log: the
    # recorded-list replay guarantee is worth ~a few hundred KB per
    # batch at most, not an offset blob that grows with a pre-populated
    # directory (ADVICE r7: the FIRST offset over an N-file backlog
    # recorded all N basenames, and Structured Streaming persists every
    # offset — unbounded checkpoint/driver growth).  Above the cap the
    # batch falls back to the legacy name-range replay (deterministic
    # under the producers' monotonic-name contract), loudly.
    MAX_RECORDED_BATCH = 10_000

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        files = _list_files(self.path, self.pattern)
        names = sorted(os.path.basename(f) for f in files)
        # monotonic: a transient empty/truncated listing must not
        # regress the high-water name (a smaller offset would make the
        # next batch re-read — and duplicate — the whole directory)
        prev = self._high_water
        batch: list[str] = []
        if names and names[-1] > prev:
            self._high_water = names[-1]
            # the batch the engine will plan is (prev, new-high]; pin
            # its exact file list NOW so replay can't see stragglers
            batch = [n for n in names if prev < n <= self._high_water]
        if len(batch) > self.MAX_RECORDED_BATCH:
            # a logger, not warnings.warn: the default warnings filter
            # is once-per-location, which would silence every capped
            # batch after the first in a long-lived driver (ADVICE r8)
            _log.warning(
                "mike_results stream batch of %d files exceeds the "
                "%d-name offset-log cap; recording name range + "
                "count/signature only — replay of THIS batch relies on "
                "the producers' monotonic-name contract (divergence is "
                "detected at plan time via the signature)",
                len(batch),
                self.MAX_RECORDED_BATCH,
            )
            return {
                "last": self._high_water,
                "base": prev,
                "capped_n": len(batch),
                "capped_sig": _batch_sig(batch),
            }
        return {"last": self._high_water, "batch": batch, "base": prev}

    def partitions(self, start: dict, end: dict):
        lo, hi = self._name_of(start), self._name_of(end)
        listed = _list_files(self.path, self.pattern)
        if "batch" in end:
            # replay-deterministic path: exactly the files recorded at
            # planning time (name-filtered against start for the
            # restart case where the recorded list spans farther back)
            wanted = [n for n in end["batch"] if lo < n <= hi]
            base = end.get("base", "")
            if lo < base:
                # the recorded list only covers (base, hi]; a plan
                # whose start sits below that (should not happen under
                # one-plan-per-latestOffset sequencing, but defend)
                # supplements the gap via legacy name-range listing
                wanted += [
                    os.path.basename(f)
                    for f in listed
                    if lo < os.path.basename(f) <= base
                ]
                wanted = sorted(set(wanted))
            by_name = {os.path.basename(f): f for f in listed}
            missing = [n for n in wanted if n not in by_name]
            if missing:
                raise ValueError(
                    f"stream replay data loss: recorded batch files "
                    f"{missing} no longer present under {self.path}"
                )
            files = [by_name[n] for n in wanted]
        else:
            # legacy offsets (pre-batch-list checkpoints) and capped
            # batches: name-range re-listing — deterministic only under
            # the producers' monotonic-name contract
            files = [f for f in listed if lo < os.path.basename(f) <= hi]
            if "capped_n" in end and lo == end.get("base", ""):
                # capped batches carry a count+signature of the list
                # planned at latestOffset time, so a divergent replay
                # (stragglers arrived after planning, or files lost)
                # is DETECTED instead of silently weakening the
                # exactly-once contract (ADVICE r8).  The recorded
                # fingerprint covers exactly (base, hi]; a plan whose
                # start differs (restart resequencing) re-lists a
                # different range, so the check would false-alarm —
                # skip it there, like the recorded-list path's
                # lo < base supplement
                names = sorted(os.path.basename(f) for f in files)
                got_n, got_sig = len(names), _batch_sig(names)
                if got_n != end["capped_n"] or got_sig != end.get("capped_sig"):
                    _log.warning(
                        "mike_results capped-batch replay divergence: "
                        "offset recorded %d files (sig %s) but "
                        "re-listing (%s, %s] found %d (sig %s) — "
                        "stragglers arrived after planning or recorded "
                        "files were lost; this batch may read rows the "
                        "original run never planned",
                        end["capped_n"],
                        end.get("capped_sig"),
                        lo,
                        hi,
                        got_n,
                        got_sig,
                    )
        pruner = _StationPruner()
        parts = pruner.partitions_for(files, self.time_col, self.chunk)
        # a zero-file range still needs ≥1 partition per the API
        return parts or [MikePartition("", ())]

    def read(self, partition: MikePartition):
        if not partition.file:
            return iter(())
        return _read_partition(partition, self.time_col)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class MikeCommit(WriterCommitMessage):
    part_file: str


class MikeResultsWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, rows) -> MikeCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.csv"
        buf = io.StringIO()
        w = csv.writer(buf)
        for row in rows:
            w.writerow(
                [
                    row.ts.strftime(_TIME_FMT),
                    row.station,
                    "" if row.value is None else repr(row.value),
                    row.src_file,
                ]
            )
        with open(os.path.join(self.path, name), "w", newline="") as fh:
            fh.write(buf.getvalue())
        return MikeCommit(name)

    def commit(self, messages) -> None:
        parts = sorted(m.part_file for m in messages if m is not None)
        manifest = os.path.join(self.path, "_mike_manifest.json")
        prev: list[str] = []
        if not self.overwrite and os.path.exists(manifest):
            prev = json.loads(open(manifest).read())["parts"]
        with open(manifest, "w") as fh:
            json.dump({"parts": sorted(set(prev) | set(parts))}, fh)
        if self.overwrite:
            keep = set(parts) | {"_mike_manifest.json"}
            for f in os.listdir(self.path):
                if f.startswith("part-") and f not in keep:
                    os.remove(os.path.join(self.path, f))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.part_file))
                except OSError:
                    pass


class MikeResultsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mike_results"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> MikeResultsReader:
        return MikeResultsReader(self.options)

    def streamReader(self, schema) -> MikeResultsStreamReader:
        return MikeResultsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> MikeResultsWriter:
        return MikeResultsWriter(self.options, overwrite)


def register(spark) -> None:
    """Register the source AND enable Python-source filter pushdown —
    the reader implements ``pushFilters``, and Spark refuses to plan a
    pushdown-capable Python reader while
    ``spark.sql.python.filterPushdown.enabled`` is false (a runtime
    SQL conf, default false in 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(MikeResultsDataSource)
