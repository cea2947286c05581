"""Connected components over near-dup pair graphs (Stage 5 / north star).

The last step of a dedup pipeline: LSH/cosine candidate pairs form an
undirected graph; each connected component is one duplicate *group*, and
the minimum doc id in the component is the canonical representative
(mirrors the reference's keep-min convention in its exact-dedup analogue,
`Image_Train_Model/read_csv_s3_train.py:96-100` label-encode keeps
sorted-first codes).

Algorithm: iterative min-label propagation. Every vertex starts labeled
with itself; each round takes the min of its own label and its
neighbors' labels; fixpoint = components. This is inherently iterative
(not expressible as one SQL query without recursion), so the driver runs
a loop — but every step inside the loop is a distributed shuffle
(join + groupBy), never a collect.

Scale design:

- Per round: one shuffle joining labels to the symmetrized edge list on
  vertex id, one groupBy(vertex) min. Both partition on the vertex id,
  so AQE reuses the exchange where possible.
- ``localCheckpoint`` each round truncates lineage — without it the plan
  doubles per iteration and Catalyst analysis goes exponential.
- Rounds needed = graph diameter. Near-dup components are shallow (a
  dup cluster is near-cliquey), so 3-5 rounds typically converge; the
  O(log n)-round alternating large-star/small-star algorithm (Kiveris et
  al., "Connected Components in MapReduce and Beyond") is the upgrade
  path for adversarially long chains — same join/groupBy building
  blocks, different edge rewrite per round.
- Convergence check is a count() on the (checkpointed) label delta —
  an O(|V|) metadata-sized action per round, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_id: str = "id",
    out_component: str = "component",
    max_iterations: int = 30,
) -> DataFrame:
    """(vertex, component) for every vertex in the undirected edge list,
    where ``component`` is the minimum vertex id reachable from it.

    Vertices are taken from the edge endpoints; isolated vertices (rows
    never appearing in a pair) are by definition their own singleton
    component and can be union'd in by the caller if needed.
    """
    sym = edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr")).unionByName(
        edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("id").distinct().withColumn("component", F.col("id"))
    for _ in range(max_iterations):
        nbr_labels = sym.join(
            labels.select(F.col("id").alias("nbr"), F.col("component").alias("nbr_comp")),
            "nbr",
        )
        cand = nbr_labels.groupBy("id").agg(F.min("nbr_comp").alias("cand"))
        merged = (
            labels.join(cand, "id", "left")
            .select(
                "id",
                F.col("component").alias("__old"),
                F.least(F.col("component"), F.coalesce("cand", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.where(F.col("component") != F.col("__old")).count()
        labels = merged.drop("__old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            "(graph diameter exceeds the budget — switch to large-star/small-star)"
        )
    return labels.select(
        F.col("id").alias(out_id), F.col("component").alias(out_component)
    )


def dedup_group_stats(components: DataFrame, component_col: str = "component") -> DataFrame:
    """Per duplicate-group size — the keep/drop decision table: the
    component id IS the canonical (minimum) doc id by construction, so
    keep it and drop the other ``group_size - 1`` docs."""
    return components.groupBy(component_col).agg(F.count("*").alias("group_size"))
