"""Connected components over near-duplicate pairs → dedup clusters.

Pair-producing dedup (MinHash-LSH / n-gram Jaccard) yields edges; the
curation decision needs CLUSTERS: every document labeled with a
canonical representative so one survivor per cluster is kept.  This is
the iterative-algorithm slot of the engine (the reference has nothing
comparable — its UniqueTransform only dedups exact tuples).

Algorithm: min-label propagation — each vertex repeatedly adopts the
minimum label among itself and its neighbors until fixpoint.  Each
iteration is one join + one aggregation (both on the vertex key);
iteration count is bounded by the graph diameter, and near-dup graphs
are unions of small dense cliques (diameter ~2), so convergence is a
few rounds.  For adversarial long-chain graphs at 100 TB, swap in the
large-star/small-star variant (Kiveris et al. '14) — same join
primitives, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    """(id, component) for every vertex in ``pairs`` (id_a, id_b);
    component = the minimum id reachable.  Driver-side loop with a
    convergence check per round (the reference point for iteration cost:
    each round shuffles on the vertex key only)."""
    edges = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
             .distinct().persist())
    # Size the iteration to the graph: per-round cost is dominated by
    # stage overhead when the edge frame is small, so shrink the
    # partition count to keep each round a handful of tasks (50k edges
    # per partition; large graphs keep full parallelism).
    n_edges = edges.count()
    parts = max(1, min(edges.rdd.getNumPartitions(), n_edges // 50_000 + 1))
    edges = edges.repartition(parts, "dst").persist()
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("component", F.col("id")).persist())
    for _ in range(max_iter):
        neighbor_min = (edges
                        .join(labels.withColumnRenamed("id", "dst")
                              .withColumnRenamed("component", "n_comp"), "dst")
                        .groupBy("src")
                        .agg(F.min("n_comp").alias("min_n")))
        # carry the old label through the projection so convergence is
        # checked on the SAME materialization — one job per round, not
        # a second join against the previous labels
        step = (labels
                .join(neighbor_min.withColumnRenamed("src", "id"), "id", "left")
                .withColumn("new_comp",
                            F.least(F.col("component"),
                                    F.coalesce(F.col("min_n"), F.col("component"))))
                .select("id", F.col("component").alias("__old"),
                        F.col("new_comp").alias("component"))
                .persist())
        changed = step.filter(F.col("component") != F.col("__old")).count()
        labels = step.select("id", "component")
        if changed == 0:
            break
    return labels


def dedup_clusters(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Assign every document its canonical id: cluster minimum for
    paired docs, itself otherwise → (id, canonical_id, is_duplicate)."""
    comp = connected_components(pairs)
    out = (df.select(F.col(id_col).alias("id"))
           .join(comp, "id", "left")
           .withColumn("canonical_id", F.coalesce("component", "id"))
           .withColumn("is_duplicate", F.col("canonical_id") != F.col("id"))
           .select("id", "canonical_id", "is_duplicate"))
    return out
