"""Graph analytics over edge DataFrames.

The reference has no graph operators; this family exists because a
training-data platform needs link-structure signals (page authority for
web-corpus quality weighting, citation ranking for document sampling)
and the iterative-driver idiom is already established here
(operators/dedup.connected_components, operators/similarity.
kmeans_assign): a fixed number of rounds, each ONE join + ONE grouped
aggregate, per-round lineage truncated so plans don't grow, and only
O(1) driver-side state (the node count) — never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    ckpt_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank → (node, rank).

    r₀(v) = 1/N; rₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} rₜ(u)/outdeg(u).

    Semantics pinned for cross-engine reproducibility:

    * fixed ``iterations`` (no convergence test) — the oracle unrolls
      the same rounds as SQL CTEs;
    * dangling nodes (no out-edges) leak their mass — the classic
      simplification, identical in both engines, so total rank sums to
      < 1 when dangling nodes exist;
    * rank values are FP sums over in-neighbors whose order differs
      across engines by ULPs — consumers should round at the edge
      (the catalog query rounds to 6 dp).

    Scale shape: the edge list joins the rank vector once per round
    (hash join on src), contributions aggregate on dst — two shuffles
    per round, both on node keys, exactly GraphX's Pregel dataflow
    without the RDD layer.  The out-degree join is precomputed ONCE
    and cached; lineage is truncated with localCheckpoint every
    ``ckpt_every`` rounds plus at the end — each checkpoint is a
    synchronous materialization (~20% of a 3-round run when taken
    every round), while the plan only needs truncating before it grows
    past a few rounds deep.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    outd = e.groupBy("src").agg(F.count("*").alias("od"))
    eo = e.join(outd, "src").cache()
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for it in range(iterations):
        contribs = (
            eo.join(ranks, eo["src"] == ranks["node"])
            .select("dst", (F.col("r") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contribs, nodes["node"] == contribs["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("r"),
        )
        if (it + 1) % ckpt_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint()
    # the final ranks are localCheckpoint-ed (lineage truncated), so
    # the working caches can be dropped instead of pinning executor
    # memory for the rest of the session (a long bench run executes
    # 100+ queries in one session — leaked caches accumulate)
    for df in (eo, nodes, e):
        df.unpersist()
    return ranks


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_depth: int = 3,
) -> DataFrame:
    """Bounded-depth BFS → (node, dist): minimum hop count from any
    seed, the engine's recursive-CTE analog (DuckDB oracles it with
    WITH RECURSIVE; Spark runs the classic frontier loop).

    Scale shape: each level is ONE hash join (frontier⋈edges on src)
    + a distinct + an anti join against the settled set — all keyed on
    node ids, frontier-sized, never |V|².  The settled set and each
    frontier are localCheckpoint-ed (lineage stays flat across levels,
    blocks freed by the ContextCleaner); the only driver state is the
    per-level emptiness check, O(1).  Levels are inherently sequential
    — BFS's critical path is its depth, on any engine."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    settled = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = settled.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        settled = settled.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return settled


def bellman_ford_rounds(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    seed_col: str = "node",
    rounds: int = 4,
) -> DataFrame:
    """Bounded Bellman–Ford → (node, cost): minimum path WEIGHT from
    any seed within ``rounds`` relaxations — the weighted companion to
    bfs_distances (hop counts).  Each round relaxes every edge once:
    dist' = min(dist, min over incoming (dist[src] + w)) — state stays
    |settled nodes| per round (dynamic programming), NOT |paths|,
    which is why an oracle can phrase the same computation as chained
    aggregated joins while naive path enumeration explodes
    combinatorially.

    Scale shape: one hash join (dist⋈edges on src) + one min-aggregate
    per round, both keyed on node ids; each round's frame is
    localCheckpoint-ed so lineage stays flat and shuffle files free.
    Weights must be non-negative integers for the exact-arithmetic
    cross-engine contract (no FP accumulation along paths).  Rounds
    are inherently sequential — Bellman-Ford's critical path is its
    relaxation depth on any engine."""
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).alias("w"),
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint()
        )
    return dist


def kcore_peel_rounds(
    edges: DataFrame,
    *,
    k: int = 4,
    rounds: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling → (node, deg): nodes surviving
    ``rounds`` rounds of 'drop everything with degree < k' over the
    symmetrized edge set, with their degree in the surviving
    subgraph.  True k-core iterates to a fixpoint; a FIXED round
    count is what both engines can express identically (the oracle
    chains one CTE per round), and real graphs converge in a handful
    of rounds — callers can test the fixpoint by checking that no
    surviving node has deg < k (the invariant test does).

    Scale shape per round: one degree aggregate on hash(node) + two
    semi joins restricting edges to surviving endpoints — all
    node-id-keyed, |E|-bounded, localCheckpoint-ed so lineage stays
    flat (the iterative-operator cache discipline)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = e.localCheckpoint()
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select(F.col("src").alias("node"))
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
