"""Connected components over a pair graph (dedup clustering).

The near-dup passes emit PAIRS; a training pipeline needs CLUSTERS — one
canonical document per connected component of the pair graph, everything
else dropped. Spark-first shape: hash-min label propagation — every node
starts labeled with its own id, each round every node takes the min
label in its neighborhood, repeat until fixpoint. Rounds needed = graph
diameter, and near-dup components are shallow (pairs all share content,
so diameters of 2-4 dominate); each round is two shuffles on narrow
(node, label) rows, embarrassingly scalable. The driver-side loop is
control flow only (one convergence count per round), never data.

This is the standard big-data CC algorithm (GraphX/Pregel's default,
"hash-min" in the literature); alternating large/small-star (Kiveris et
al.) drops the round count to O(log n) for adversarially deep graphs —
not needed for dedup-shaped inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable — deterministic, so exactly oracle-checkable.

    Raises if the graph hasn't converged after ``max_iters`` rounds
    (diameter > max_iters), rather than returning a partial labeling.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # Materialize the (narrow) symmetrized edge list once: every round's
    # neighborhood join re-reads it, and without the checkpoint each round
    # would re-execute the upstream pair GENERATION (for near-dup input,
    # the whole shingle→minhash→band pipeline) diameter-many times.
    sym = sym.localCheckpoint()
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    labels = labels.localCheckpoint()
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("neigh_min"))
        )
        stepped = (
            labels.join(neigh, labels["node"] == neigh["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("neigh_min"), F.col("comp"))
                ).alias("comp"),
                F.col("comp").alias("_old"),
            )
        )
        # Pointer jumping (path compression): follow the label pointer —
        # label(v) := label(label(v)) — several times WITHIN the round
        # (cheap chained joins of the narrow label frame, no extra
        # actions). The label is always the id of a node in v's
        # component, so jumps stay inside the component and the fixpoint
        # (min reachable id) is unchanged; what changes is ROUND COUNT:
        # plain hash-min needs diameter rounds, and sparse percolation-
        # regime graphs (threshold_sweep_components' loosest level) have
        # diameters in the hundreds. Each in-round jump roughly doubles
        # the hop distance a label has traveled, so k jumps give ~2^k
        # compression per materialized round and the expensive part —
        # checkpoint + convergence action — runs fewer times. One jump per
        # round: chaining k lazy jumps doubles the neighbor-join subtree
        # per jump (2^k plan blow-up), and checkpointing between jumps
        # costs more than the rounds it saves on fixture-sized graphs.
        new_labels = stepped
        for _jump in range(1):
            new_labels = (
                new_labels.alias("x")
                .join(
                    new_labels.select(
                        F.col("node").alias("pnode"), F.col("comp").alias("pcomp")
                    ).alias("y"),
                    F.col("x.comp") == F.col("y.pnode"),
                    "left",
                )
                .select(
                    "node",
                    F.least(
                        F.col("x.comp"), F.coalesce(F.col("pcomp"), F.col("x.comp"))
                    ).alias("comp"),
                    "_old",
                )
            )
        # localCheckpoint: truncate lineage so round N's plan doesn't nest
        # all prior rounds; also materializes, so the convergence probe
        # below reads the checkpoint instead of re-running the round.
        new_labels = new_labels.localCheckpoint()
        changed = new_labels.where(F.col("_old") != F.col("comp")).limit(1).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")
