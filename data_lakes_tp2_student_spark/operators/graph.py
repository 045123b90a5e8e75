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
localCheckpoint contract.

Cache contract: these operators persist() loop-carried inputs and do NOT
unpersist before returning — the returned DataFrame still depends on the
cached frames, so an eager unpersist would force a full recompute at
materialization. Callers running many queries in one session are expected
to `spark.catalog.clearCache()` after each query materializes; both the
bench harness (bench.py) and the local oracle gate (tests/oracle.py) do."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.compute import eager

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
    # Persist the per-iteration inputs: `pairs` may be an expensive
    # upstream pipeline (x34 feeds the full minhash->LSH chain), and
    # without a cache the edge/node subtrees re-run once per iteration
    # plus once for n — "built ONCE" (docstring) must hold in the plan,
    # not just the code (review r5). eager, not bare persist, for the
    # loop-carried edge frame: nodes.count() below fills only the nodes
    # cache — the per-round consumers of edges_deg would otherwise race
    # to compute its uncached subtree at materialization (review r6;
    # compute.eager documents the stampede)
    edges_deg = eager(edges.join(deg, "src"))
    nodes = nodes.persist()

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


def triangle_count(pairs: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected edge table (`id_a`, `id_b`, one row per edge, id_a < id_b).

    Algorithm: degree-ordered edge orientation (the MapReduce triangle
    bound of Suri & Vassilvitskii, WWW'11). Every undirected edge is
    directed from its (degree, id)-smaller endpoint to the larger; each
    triangle then has exactly ONE wedge u→v, u→w rooted at its smallest
    endpoint, closed by checking v→w (or w→v — orientation of the closing
    edge is unknown, so the closure probe is on the undirected key). The
    wedge fan-out per node is bounded by its OUT-degree, which the
    orientation caps at O(sqrt(m)) for any graph — the skew-proof property
    a naive u<v<w enumeration lacks (a hub node with degree d otherwise
    spawns d^2 wedges).

    Both the wedge build and the closure probe are equi-joins on node /
    edge keys — shuffle-partitionable, no broadcast needed at scale.
    Output: (doc_id, degree, triangles, clustering) per node with
    degree >= 2; clustering = 2*T / (d*(d-1)) rounded to 6."""
    # persist the edge list: it anchors five subtrees (sym twice via the
    # orient join, the closure probe, both degree passes) and `pairs` may
    # be an expensive upstream pipeline
    e = eager(pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # orient: keep (a -> b) where (deg(a), a) < (deg(b), b)
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("_db"))
    oriented = (
        sym.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(da, "a")
        .join(db, "b")
        .filter(
            (F.col("_da") < F.col("_db"))
            | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
    )
    # wedges rooted at the smallest endpoint, ordered arms for a unique probe
    o1 = oriented.select(F.col("a").alias("r"), F.col("b").alias("x"))
    o2 = oriented.select(F.col("a").alias("r"), F.col("b").alias("y"))
    wedges = o1.join(o2, "r").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "inner",
    )
    per_node = (
        closed.select(F.explode(F.array("r", "x", "y")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_node, "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            F.col("deg").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
            F.round(
                F.coalesce("triangles", F.lit(0)).cast("double") * 2
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("clustering"),
        )
    )


def label_propagation(pairs: DataFrame, iterations: int = 3) -> DataFrame:
    """Community detection by semi-synchronous label propagation
    (Raghavan et al., 2007) over an undirected edge table (`id_a`,
    `id_b`): labels start as node ids; each round every node adopts the
    most frequent label among its neighbors, ties broken by the SMALLEST
    label — the deterministic tie rule that makes a fixed iteration count
    reproducible under any partitioning (and lets the DuckDB oracle
    unroll the same rounds as CTEs; classic LPA's random tie-break and
    asynchronous scan order are irreproducible by design).

    Each round is one equi-join (edges x labels) + one count aggregate +
    one per-node argmax window — all hash-partitioned by node id; with
    FIXED iterations the lineage stays bounded like `pagerank`, no
    checkpointing. Convergence to stable communities needs the
    dup_clusters-style iterate-until-fixed-point loop; the fixed-round
    form is the bounded, oracle-checkable variant."""
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    # persist: the edge table feeds every round (plus the label init) —
    # without it an expensive `pairs` pipeline re-runs per round
    sym = eager(
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iterations):
        msgs = sym.join(
            labels, sym["v"] == labels["node"], "inner"
        ).select(sym["u"], labels["label"])
        counts = msgs.groupBy("u", "label").agg(F.count(F.lit(1)).alias("_c"))
        w = Window.partitionBy("u").orderBy(F.desc("_c"), F.col("label"))
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("u").alias("node"), "label")
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    )
