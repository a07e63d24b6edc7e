"""Distributed connected components via iterative min-label propagation.

The Spark shape of the reference's flood-fill labeling
(/root/reference/Demeton/WaterBodies/Coloring.fs:17-182) generalized to
any node/edge DataFrame: used for near-dup document clustering and for
unifying per-tile water-body labels across tile boundaries.

Each round joins the current labels onto the (symmetric) edge list,
takes the min neighbor label per node, and ``localCheckpoint``s to cut
lineage.  Convergence in O(diameter) rounds; on the label-propagation
graphs we build (dense similarity clusters, tile adjacency) the
diameter is small.  At cluster scale the labels table shuffles on node
id each round — the edge list is persisted once so rounds only pay the
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    edge_cols: tuple[str, str] = ("a", "b"),
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the min node id of its component.

    ``nodes``: one column ``node_col`` (distinct ids, orderable).
    ``edges``: columns ``edge_cols`` (undirected; both orientations are
    derived here).  Returns ``(node, label)``.
    """
    ea, eb = edge_cols
    sym = edges.select(F.col(ea).alias("src"), F.col(eb).alias("dst")).union(
        edges.select(F.col(eb).alias("src"), F.col(ea).alias("dst"))
    ).persist()
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("chg"),
            )
        ).localCheckpoint()
        changed = new_labels.where(F.col("chg")).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    sym.unpersist()
    return labels
