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


def connected_components(pairs: DataFrame, max_iter: int = 15,
                         driver_threshold: int = 1_000_000) -> DataFrame:
    """(id, component) for every vertex in ``pairs`` (id_a, id_b);
    component = the minimum id reachable.

    Small/large cutover (the reference's Uid.List-style strategy
    switch): a near-dup edge list is usually tiny relative to the
    corpus — below ``driver_threshold`` edges it is union-found on the
    driver in one pass (no per-round shuffles); above it, distributed
    min-label propagation with a convergence check per round."""
    # Materialize the pair frame ONCE before mirroring it: the two
    # union branches otherwise re-execute the whole upstream pair
    # pipeline (an LSH join tree) twice.
    pairs_p = pairs.select("id_a", "id_b").persist()
    pairs_p.count()
    edges = (pairs_p.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .union(pairs_p.select(F.col("id_b").alias("src"),
                                   F.col("id_a").alias("dst")))
             .distinct().persist())
    n_edges = edges.count()
    pairs_p.unpersist()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges)
    # Size the iteration to the graph: per-round cost is dominated by
    # stage overhead when the edge frame is small, so shrink the
    # partition count to keep each round a handful of tasks (50k edges
    # per partition; large graphs keep full parallelism).
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


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Exact union-find over a collected edge list (bounded by the
    caller's threshold); labels = component minimum."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:   # path compression
            parent[x], x = root, parent[x]
        return root

    rows = edges.collect()
    for r in rows:
        a, b = find(r.src), find(r.dst)
        if a != b:
            # union by min so the root IS the component minimum
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    vertices = {r.src for r in rows}
    out = [(v, find(v)) for v in sorted(vertices)]
    spark = edges.sparkSession
    schema = edges.schema["src"].dataType.simpleString()
    return spark.createDataFrame(out, f"id {schema}, component {schema}")


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
