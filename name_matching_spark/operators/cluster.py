"""Transitive clustering: iterative hash-min connected components.

The reference stops at 1:N best-match and leaves entity consolidation to
the user (README.md:77-79); the north rule requires transitive-closure
clustering of the match-edge DataFrame.  Implemented as the classic
large-graph hash-min label propagation: every node repeatedly adopts the
minimum component id among itself and its neighbours until fixpoint --
O(graph diameter) rounds, which on name-match graphs (star-shaped
clusters around a canonical name) is typically 2-3.  Long chains need
more rounds; exhausting ``max_iterations`` without convergence raises
rather than silently returning split components.

Scale notes: each round is one shuffle (groupBy node); lineage is cut every
round with localCheckpoint so the plan doesn't grow; convergence is checked
with a cheap aggregate (sum of changed labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """-> (id, component) where component = min node id in the component.

    ``edges`` may be directed/duplicated; it is symmetrized internally.
    Node ids must be orderable (string or numeric).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    if checkpoint:
        sym = sym.localCheckpoint()
        labels = labels.localCheckpoint()

    changed = None
    for _ in range(max_iterations):
        # candidate label per node: min over neighbours' current labels
        neighbour_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(neighbour_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_component") < F.col("component"))
                .cast("int").alias("changed"),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint()
        changed = new_labels.agg(
            F.coalesce(F.sum("changed"), F.lit(0))).first()[0]
        labels = new_labels.drop("changed")
        if not changed:
            break
    if changed:
        # partially-converged labels would silently split components
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations (last round still changed "
            f"{changed} labels); raise max_iterations -- rounds scale "
            f"with graph diameter")
    return labels


def cluster_matches(
    matches: DataFrame,
    id_a: str = "a_id",
    id_b: str = "b_id",
    threshold: float | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Cluster accepted match edges into entities -> (id, component)."""
    e = matches
    if threshold is not None:
        e = e.filter(F.col(score_col) > threshold)
    return connected_components(e, src=id_a, dst=id_b)
