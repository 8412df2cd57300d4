"""Connected components over candidate-pair edges (SURVEY §2.K2).

Near-dup detection emits PAIRS; deduplication needs CLUSTERS — the
connected components of the pair graph, with one canonical document
kept per component. This is the standard completion step of every
large-scale dedup pipeline (the reference's resume/anti-join plays
the same "work already covered" role for blocks).

Algorithm: iterative min-label propagation — each node repeatedly
adopts the minimum label among itself and its neighbors until no
label changes. Convergence takes at most `diameter` rounds (near-dup
components are shallow: a dup cluster's diameter is tiny), each round
ONE join + ONE map-side-combined min-aggregate on the edge list. The
driver loop is control flow only (a convergence count), never data;
`localCheckpoint` truncates the growing lineage each round, the same
measured-iteration discipline as volume/pyramid.py. For graphs with
large diameters the round count is the dial; the alternating
large-star/small-star variant halves rounds at the cost of 2x joins
per round — not needed for dup clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) candidate pairs -> (node, component) with component
    = the minimum node id reachable from `node`.

    Deterministic for any edge set; raises if the graph hasn't
    converged within `max_iterations` (pathological diameter) rather
    than returning wrong labels.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize ONCE: without this every propagation round
        # re-executes the whole upstream candidate-generation DAG
        # (shingle scan, DF-cap, pair join) — the corpus soak measured
        # it as ~3x the pair join's shuffle bytes on a 500k-doc corpus
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label"))
                .cast("int")
                .alias("_changed"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.agg(F.sum("_changed")).collect()[0][0] or 0
        labels = updated.drop("_changed")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_keep_list(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """pairs -> (node, component, keep): keep=true iff the node is its
    component's canonical (minimum-id) member. Documents absent from
    the pair graph are trivially kept and never enter the compute."""
    comp = connected_components(pairs, src, dst)
    return comp.select(
        "node", "component", (F.col("node") == F.col("component")).alias("keep")
    )
