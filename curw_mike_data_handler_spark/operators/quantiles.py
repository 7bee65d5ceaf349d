"""Deterministic mergeable quantile summary (compactor hierarchy).

The reference computes its percentile-ish statistics with pandas over
single-VM series (e.g. the tidal/rainfall summaries feeding MIKE input
prep); at 100 TB a quantile needs a MERGEABLE bounded-state summary
instead of a sort.  This module implements the classic
Munro–Paterson / MRL / KLL compactor hierarchy with DETERMINISTIC
compaction offsets (no randomness — alternating parity per level, the
original MRL choice) so the same multiset folded in any partitioning
yields value-identical results when no compaction fires, and
reproducible, error-BOUNDED results when it does:

* level ``i`` holds a sorted buffer of items each representing
  ``2^i`` original values; every buffer is capped at ``capacity``;
* an overflowing buffer compacts: every other element (starting at the
  level's alternating parity offset) is promoted with doubled weight to
  level ``i+1``; the survivors' total weight is conserved exactly (an
  odd element is held back at the level);
* each compaction at level ``i`` shifts any rank estimate by at most
  ``2^i`` (exactly ``w`` when the ≤-count at the queried value is odd,
  0 when even; the alternating parity makes consecutive compactions
  cancel to ``w/2`` AMORTIZED, but a single one can err by ``w``) — the
  summary tracks the hard worst-case envelope ``Σ c_i · 2^i`` as an
  integer, so every sketch carries its own error bound and tests
  assert against it rather than against folklore;
* ``merge`` is levelwise concatenation + re-compaction — the operation
  that makes the summary a proper distributed aggregate (partials per
  partition, merged in a tree), and the streaming twin's state fold.

With ``capacity ≥ n`` nothing ever compacts and ``quantile(p)`` is the
EXACT order statistic at rank ``ceil(p·n)`` — which is what the
oracle-gated catalog queries pin (two engines, one closed-form answer);
the approximate regime is exercised by property tests against the
self-reported bound.  Error/space: rank error ≤ ``err2`` with
``O(capacity · log(n/capacity))`` items of state — the standard
deterministic-KLL trade.

Reference lineage: Munro & Paterson (1980); Manku, Rajagopalan &
Lindsay (SIGMOD'98); Karnin, Lang & Liberty (FOCS'16, deterministic
variant).  Cited for parity: the reference repo has no sketch — its
quantiles are pandas ``describe``/``quantile`` calls on whole series.
"""

from __future__ import annotations

from bisect import insort


class MergePruneSummary:
    """Deterministic bounded-state quantile summary over INTEGERS
    (callers feed scaled integers — cents — exactly like every other
    exact-parity path in this repo)."""

    __slots__ = ("capacity", "levels", "parities", "n", "err2")

    def __init__(self, capacity: int):
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.capacity = capacity
        self.levels: list[list[int]] = [[]]
        self.parities: list[int] = [0]
        self.n = 0
        self.err2 = 0  # Σ compactions_i · 2^i  (the hard rank-error bound)

    # -- construction ---------------------------------------------------

    def insert(self, value: int) -> None:
        insort(self.levels[0], value)
        self.n += 1
        if len(self.levels[0]) > self.capacity:
            self._compact(0)

    def insert_many(self, values) -> None:
        """Bulk fold: extend + timsort (O(m log m), and nearly free when
        the incoming chunk is pre-sorted) instead of per-item bisect."""
        vals = [int(v) for v in values]
        buf = self.levels[0]
        buf.extend(vals)
        buf.sort()
        self.n += len(vals)
        while len(self.levels[0]) > self.capacity:
            self._compact(0)

    # -- internals ------------------------------------------------------

    def _compact(self, i: int) -> None:
        """Promote every other element of level i (parity-offset) to
        level i+1; an odd leftover stays at level i.  Weight is
        conserved: 2k items of weight w become k items of weight 2w."""
        buf = self.levels[i]
        if i + 1 == len(self.levels):
            self.levels.append([])
            self.parities.append(0)
        hold: list[int] = []
        if len(buf) % 2:
            hold.append(buf.pop())  # keep the max back (deterministic)
        off = self.parities[i]
        self.parities[i] ^= 1
        promoted = buf[off::2]
        self.levels[i] = hold
        self.err2 += 1 << i
        nxt = self.levels[i + 1]
        nxt.extend(promoted)
        nxt.sort()
        if len(nxt) > self.capacity:
            self._compact(i + 1)

    # -- queries --------------------------------------------------------

    def _weighted_items(self):
        for i, buf in enumerate(self.levels):
            w = 1 << i
            for v in buf:
                yield v, w

    def quantile_at_rank(self, rank: int) -> int | None:
        """The value whose cumulative weight first reaches ``rank``
        (1-indexed) — the exact order statistic when no compaction has
        fired, within ``err2`` ranks otherwise.  Callers compute
        the rank with the same integer formula as the SQL oracle
        (``rank_for`` below, e.g. ``(9*n + 9) // 10`` for p90), so no
        float ever enters the parity path."""
        if self.n == 0:
            return None
        rank = min(max(rank, 1), self.n)
        acc = 0
        for v, w in sorted(self._weighted_items()):
            acc += w
            if acc >= rank:
                return v
        return None  # unreachable: weights sum to n

    def rank_error_bound(self) -> int:
        return self.err2

    def state_items(self) -> int:
        return sum(len(b) for b in self.levels)

    # -- merge / serialization -----------------------------------------

    def merge(self, other: "MergePruneSummary") -> "MergePruneSummary":
        if other.capacity != self.capacity:
            raise ValueError("cannot merge summaries of different capacity")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.parities.append(0)
        for i, buf in enumerate(other.levels):
            if not buf:
                continue
            mine = self.levels[i]
            mine.extend(buf)
            mine.sort()
        self.n += other.n
        self.err2 += other.err2
        # re-establish the capacity invariant bottom-up (a compaction
        # may push the next level over)
        for i in range(len(self.levels)):
            while len(self.levels[i]) > self.capacity:
                self._compact(i)
        return self

    def to_state(self) -> tuple[list[int], list[int], list[int], int, int]:
        sizes = [len(b) for b in self.levels]
        items = [v for b in self.levels for v in b]
        return sizes, items, list(self.parities), self.n, self.err2

    @classmethod
    def from_state(
        cls,
        capacity: int,
        sizes: list[int],
        items: list[int],
        parities: list[int],
        n: int,
        err2: int,
    ) -> "MergePruneSummary":
        s = cls(capacity)
        s.levels = []
        pos = 0
        for sz in sizes:
            s.levels.append([int(v) for v in items[pos:pos + sz]])
            pos += sz
        if not s.levels:
            s.levels = [[]]
        s.parities = [int(p) for p in parities] or [0]
        s.n = int(n)
        s.err2 = int(err2)
        return s


def rank_for(p_num: int, p_den: int, n: int) -> int:
    """``ceil(p·n)`` by pure integer math — the formula both the sketch
    side and the SQL oracle evaluate: rank_for(9, 10, n) ↔
    ``(9*n + 9) // 10`` in DuckDB (non-negative, so truncation ==
    floor)."""
    return max(1, (p_num * n + p_den - 1) // p_den)
