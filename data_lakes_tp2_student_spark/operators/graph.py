"""Graph analytics over candidate-pair edge tables (SURVEY.md §2 X):
fixed-point PageRank — the companion to `dedup.dup_clusters`' connected
components for corpus-graph analysis (centrality of documents inside
near-dup neighborhoods, link-ish authority over any derived edge set).

Determinism policy: ranks are BIGINT fixed-point (scale 1e12) and every
per-iteration step is integer arithmetic — `rank div outdeg` before the
neighbor sum, `(85 * contrib) div 100` for damping — so sums are
associative and the result is bit-identical under any partitioning and in
any engine (the DuckDB oracle unrolls the same iterations as CTEs).
Float PageRank would drift per shuffle order.

Scale shape: the edge table is built ONCE with out-degrees attached and
hash-partitioned by source; each iteration is one join (ranks are the
small side at dup-graph densities) + one partial-aggregated sum — the
Pregel message-passing round as DataFrame ops. A FIXED iteration count
keeps the lineage bounded (~2 plan nodes per round), so no checkpointing
is needed — unbounded loops belong to `dup_clusters`, which documents the
localCheckpoint contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12


def pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """Weighted-uniform PageRank over an undirected candidate-pair graph
    (`id_a`, `id_b`), returning (doc_id, rank) with BIGINT fixed-point
    ranks. `damping_pct` is the damping factor in percent (85 = the
    classic 0.85) so the damping step stays integer."""
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src")

    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col("id").alias("doc_id"), F.lit(0).cast("bigint").alias("rank")
        )
    base = scale // n
    teleport = ((100 - damping_pct) * base) // 100

    ranks = nodes.select("id", F.lit(base).cast("bigint").alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.id)
            .select("dst", F.expr("rank div outdeg").alias("_m"))
            .groupBy("dst")
            .agg(F.sum("_m").alias("_c"))
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            "id",
            (
                F.lit(teleport)
                + F.expr(f"({damping_pct} * coalesce(_c, 0L)) div 100")
            )
            .cast("bigint")
            .alias("rank"),
        )
    return ranks.select(F.col("id").alias("doc_id"), "rank")
