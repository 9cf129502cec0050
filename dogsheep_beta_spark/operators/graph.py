"""Iterative graph analytics over DataFrames: PageRank power iteration.

The reference has no graph operator — but its data model IS a graph
(documents/users/tags linked by foreign keys, reference README.md's
dogsheep ecosystem), and a training-data pipeline ranks sources/domains
by link authority before sampling (the classic web-corpus quality
prior).  This module adds the standard MapReduce PageRank as pure
DataFrame code, same loop discipline as the connected-components
operator (operators/dedup.py): join-based supersteps with
``localCheckpoint`` lineage truncation.

Spark-first shape, per iteration:
  contribs = edges ⋈ ranks ⋈ out-degree  (shuffle on src)
  ranks    = nodes ⟕ Σcontribs           (shuffle on dst)
Both joins are equi-joins on the node id — at 100 TB this partitions
cleanly, and pre-partitioning ``edges`` by src lets AQE reuse the
exchange across supersteps.  The node count enters as a broadcast
1-row aggregate, NOT a driver-side ``collect`` — there is no driver
data path anywhere in the loop.

Fixed iteration count (not convergence-test) keeps the operator
oracle-checkable: the DuckDB oracle unrolls the same supersteps as
chained CTEs and must produce bit-identical ranks (mod float rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    checkpoint_registry: list | None = None,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Dangling mass is handled the simple-and-oracle-able way: nodes
    with no outgoing edges contribute nothing (their mass leaks), the
    teleport term (1-d)/N keeps ranks positive.  ``iterations`` is
    fixed so the distributed loop and the SQL oracle compute the same
    function.

    ``checkpoint_registry`` (r13, ADVICE r12): a list that receives
    every ``localCheckpoint``ed frame the loop pins (``nodes``, the
    degree-weighted edge table, intermediate rank rounds).  Their
    blocks stay alive after the caller's action — release them with
    ``dedup.release_local_checkpoint`` once the returned ranks are
    consumed (long-lived sessions otherwise accumulate them until JVM
    GC).  Without a registry the blocks leak until GC, as before.
    """
    if checkpoint_every < 1:
        raise ValueError(
            "checkpoint_every must be >= 1; pass a value > iterations "
            "to disable checkpointing entirely"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # 1-row node count, broadcast into every rank row — replaces the
    # driver-side collect a naive implementation would do.
    n_df = nodes.agg(F.count(F.lit(1)).alias("__n"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    # Degree-weighted edge table, built ONCE outside the loop (r12,
    # guide §2.4/§8): the out_deg join used to run inside every
    # superstep, re-shuffling the full edge list per iteration.  The
    # checkpoint truncates lineage and pins the join's hash(src)
    # partitioning, so each iteration's edges ⋈ ranks join reuses it —
    # with ranks partitioned on node (from the previous round's
    # groupBy/join) the only per-superstep exchange left is the
    # contribution groupBy(dst).  At 100 TB the edge list is the big
    # side; moving it zero times per iteration instead of twice is the
    # dominant shuffle saving.
    ew = e.join(out_deg, "src").localCheckpoint(eager=False)
    if checkpoint_registry is not None:
        checkpoint_registry.extend([nodes, ew])

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )

    for it in range(iterations):
        contribs = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # truncate lineage every ``checkpoint_every`` supersteps —
        # without this the plan doubles per iteration (same discipline
        # as dedup.py's connected-components loop).  Measured at sf0.1
        # local[32]: fully fusing 3 iterations (no checkpoints) is NOT
        # faster warm (1.65 s vs 1.53 s) and 2× slower cold (repeated
        # input re-scans in one deep plan), so per-iteration remains
        # the default.
        if (it + 1) % checkpoint_every == 0 and (it + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
            if checkpoint_registry is not None:
                checkpoint_registry.append(ranks)
            # NOTE: the per-round checkpoints deliberately stay alive —
            # with eager=False nothing materializes until the caller's
            # first action, and a localCheckpoint whose blocks are
            # dropped cannot be recomputed (lineage is gone), so a
            # mid-loop release_local_checkpoint would break the final
            # evaluation.  The chain is bounded by ``iterations``; the
            # caller can release the RETURNED frame when done
            # (dedup.release_local_checkpoint).
    return ranks


def bipartite_edges(
    df: DataFrame, left: str, right: str, l_tag: str = "u:", r_tag: str = "t:"
) -> DataFrame:
    """Distinct (left, right) pairs → symmetric edge list over tagged
    node ids — projects a two-column relation into an undirected
    bipartite graph (each edge emitted in both directions, so the walk
    is reversible and every node has out-degree ≥ 1: no dangling mass)."""
    pairs = df.select(
        F.concat(F.lit(l_tag), F.col(left).cast("string")).alias("src"),
        F.concat(F.lit(r_tag), F.col(right).cast("string")).alias("dst"),
    ).distinct()
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
