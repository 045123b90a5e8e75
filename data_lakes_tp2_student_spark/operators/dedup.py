"""Deduplication operators (SURVEY.md §2 x1/x2) — the LLM-training-data
pipeline surface: exact dedup, MinHash+LSH near-dup candidates, exact
n-gram-Jaccard verification, and SimHash fingerprints.

All hashing is md5-based: portable across engines (the DuckDB oracle computes
identical signatures), stable under any repartitioning, with no driver-side
state.

Scale & execution design:
- exact dedup groups on md5(text) rather than the text itself, so the shuffle
  carries 32-byte keys instead of documents;
- MinHash is computed as explode(shingles) → ONE md5 per shingle → k
  codegen'd `min` aggregations over a rotated-hash family. Spark evaluates
  higher-order-function lambdas interpreted (no whole-stage codegen), so the
  naive `transform(seq(k), j -> array_min(transform(shingles, md5(j||s))))`
  shape is ~k× more md5 calls AND interpreted — measured ~30× slower at
  sf0.1. The explode/groupBy shape is also the 100 TB shape: partial min
  aggregation collapses map-side, the shuffle carries k strings per doc;
- LSH banding is the classic trick: the only join is an equi-join on
  (band_index, band_hash) — fan-out controlled by band width, never O(n²);
- candidate pairs are verified with exact shingle Jaccard only on the
  (small) candidate set, against a persisted shingle table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.compute import eager, spread

# Word-shingle width for MinHash/Jaccard (3-word shingles).
SHINGLE_W = 3


def exact_dedup(df: DataFrame, text_col: str, tiebreak_col: str) -> DataFrame:
    """x1 — keep the first row (lowest tiebreak) per exact text; hash-groupBy
    on md5(text) so the shuffle key is fixed-width."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(tiebreak_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_shingles(df: DataFrame, text_col: str, out_col: str = "shingles") -> DataFrame:
    """Word shingles (width SHINGLE_W); whole text as the single shingle for
    very short docs (keeps null-free semantics portable to the oracle).

    The split() is materialized once per row (`_words` projection — Catalyst
    keeps non-cheap multiply-referenced aliases un-inlined) instead of once
    per shingle."""
    shingles = F.when(
        F.size("_words") < SHINGLE_W, F.array(F.col(text_col))
    ).otherwise(
        F.expr(
            f"transform(sequence(0, size(_words) - {SHINGLE_W}), "
            f"i -> concat_ws(' ', slice(_words, i + 1, {SHINGLE_W})))"
        )
    )
    return (
        df.withColumn("_words", F.split(F.col(text_col), " "))
        .withColumn(out_col, shingles)
        .drop("_words")
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle) rows — the fully-codegen shingle shape.

    The array form (`with_shingles`) pays an interpreted lambda per shingle,
    and Catalyst inlines the words alias into the lambda so `split()` re-runs
    PER SHINGLE (measured: 8 copies of split() in the physical plan, seconds
    of wall time at sf0.1). Here: split once → posexplode → window `lead`
    stitches each 3-word shingle — every operator whole-stage-codegen'd; the
    one shuffle (hash by id for the window) is the same partitioning the
    downstream signature aggregation needs anyway. Short docs (<SHINGLE_W
    words) contribute their whole text, matching `with_shingles`."""
    words = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "_w")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    lead1, lead2 = F.lead("_w", 1).over(w), F.lead("_w", 2).over(w)
    long_sh = (
        words.select(
            F.col(id_col),
            F.concat_ws(" ", "_w", lead1, lead2).alias("s"),
            lead2.alias("_l2"),
        )
        .filter(F.col("_l2").isNotNull())
        .drop("_l2")
    )
    short = (
        df.filter(F.size(F.split(F.col(text_col), " ")) < SHINGLE_W)
        .select(F.col(id_col), F.col(text_col).alias("s"))
    )
    return long_sh.unionByName(short)


def rotation(h: Column, j: int) -> Column:
    """The j-th hash of the family: the md5 hex string rotated left by j
    chars. One real md5 per shingle; rotations give k distinct uniform-ish
    orderings at substr cost (a cheap-hash-family trick; fully portable)."""
    if j == 0:
        return h
    return F.concat(F.substring(h, j + 1, 32 - j), F.substring(h, 1, j))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    out_col: str = "sig",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """x2 — MinHash signature per row: position j holds
    min over shingles of rotate_j(md5(shingle)).

    Hex strings compare lexicographically — a valid uniform hash order,
    identical in every engine. Shape: explode → md5 → k min-aggs (codegen,
    map-side partial aggregation; see module docstring).

    Pass a precomputed ``shingles`` (id, s) table to share the explosion
    with other stages (e.g. jaccard_verify) — one shingle scan feeding the
    whole near-dup pipeline is the 100 TB shape.
    """
    ex = (
        shingles
        if shingles is not None
        else exploded_shingles(spread(df), id_col, text_col)
    )
    h = ex.select(id_col, F.md5("s").alias("_h"))
    aggs = [F.min(rotation(F.col("_h"), j)).alias(f"_s{j}") for j in range(num_hashes)]
    wide = h.groupBy(id_col).agg(*aggs)
    return wide.select(
        id_col, F.array(*[F.col(f"_s{j}") for j in range(num_hashes)]).alias(out_col)
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 4,
    sig_col: str = "sig",
) -> DataFrame:
    """x2 — band the signatures and emit candidate pairs (id_a < id_b) that
    collide in at least one band. Equi-join on (band, band_hash) only.

    The banded side is persisted AND materialized (`eager`): it feeds both
    sides of the self-join, and with a lazy persist the two join inputs (and
    any downstream broadcast builds) race to compute the full signature
    pipeline concurrently — each doing the whole work."""
    band_hashes = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> md5(concat_ws('|', slice({sig_col}, b * {rows_per_band} + 1, {rows_per_band}))))"
    )
    banded = eager(
        sig_df.select(
            F.col(id_col), F.posexplode(band_hashes).alias("band", "band_hash")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """x2 — exact shingle-set Jaccard for candidate pairs (the verify stage
    after LSH; only candidates pay set costs), join-based: intersection =
    equi-join of the two exploded distinct-shingle sides on (pair, shingle),
    union = |A| + |B| − |A∩B|. No per-pair array materialization; every stage
    codegen'd; LSH false positives with zero overlap keep jaccard 0 via the
    left join. The distinct-shingle table and the pairs table are persisted
    and materialized up front — each feeds two+ branches of the join tree,
    several of them broadcast builds that would otherwise recompute the
    whole upstream pipeline concurrently (see functions.compute.eager)."""
    pairs = eager(pairs)
    raw = (
        shingles
        if shingles is not None
        else exploded_shingles(spread(df), id_col, text_col)
    )
    sh = eager(raw.distinct())
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("id_a"), "s")
    b = sh.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("_nb"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"_inter": 0})
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """x2 — connected components over near-dup candidate pairs: every doc in
    a duplicate cluster gets ``cluster_id`` = the minimum doc id reachable
    through candidate edges. This is the step between "pairs" and "keep one
    per cluster" — pairwise dedup alone breaks on A~B, B~C chains where A~C
    never collides.

    Min-label propagation + pointer jumping (the Pregel/GraphX
    connected-components algorithm with path-halving, as DataFrame joins):
    each round every node takes the min of its own label, its neighbors'
    labels, AND its label's label — the shortcut step turns O(diameter)
    convergence into O(log diameter), which is what survives adversarial
    duplicate chains (doc_i ~ doc_{i+1} series show up in real corpora).

    Each round's result is `localCheckpoint`ed, not persisted: `persist`
    reuses cached BLOCKS but leaves the logical plan intact, so an
    iterative loop whose round references the previous round ~3× (the
    propagate join, the shortcut join, the convergence check) builds a
    3^k-node plan tree — Catalyst analysis alone OOMs the driver after ~10
    rounds regardless of data size. Checkpointing truncates lineage to the
    materialized partitions, keeping every round's plan O(1). (On a
    multi-executor cluster with unreliable nodes, swap for
    `sparkContext.setCheckpointDir` + `checkpoint()` — same contract,
    HDFS-backed.) The driver loop only orchestrates and checks a scalar
    convergence count; state is O(nodes-in-pairs), never O(corpus):
    singleton docs never enter the graph."""
    # Edges hash-partitioned by the probe key ONCE; localCheckpoint keeps the
    # partitioning in the LogicalRDD, so the per-round join re-shuffles only
    # the (much smaller) label table, never the edge set.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .repartition(F.col("dst"))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("_nbr"))
        )
        prop = labels.join(nbr_min, labels.id == nbr_min.src, "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))
            ).alias("label"),
        )
        # Pointer jumping: label <- min(label, label(label)). Every label is
        # itself a node id, so the self-join always hits; `left` is safety.
        hop = prop.select(
            F.col("id").alias("_pid"), F.col("label").alias("_plabel")
        )
        new = (
            prop.join(hop, prop.label == hop._pid, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("_plabel"), F.col("label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("_plabel"), F.col("label")),
                    )
                    != F.col("_old")
                ).alias("_changed"),
            )
            # LAZY checkpoint: the convergence count below is the action
            # that materializes it, so each round runs ONE job instead of
            # two (eager checkpoint + count) — measured 5.6->4.5 s for the
            # sf0.1 loop, same labels.
            .localCheckpoint(eager=False)
        )
        # The old label rode along through the round, so convergence is a
        # filter-count that doubles as the checkpoint materializer — no
        # extra job.
        changed = new.filter(F.col("_changed")).count()
        labels = new.drop("_changed")
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def simhash_pairs(
    sh_df: DataFrame,
    id_col: str,
    sim_col: str = "simhash",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """x2 — SimHash near-dup candidate pairs: band the 32-bit fingerprint
    into `bands` slices and emit pairs (id_a < id_b) colliding on at least
    one slice, then keep pairs within `max_hamming` exact bit flips.

    Pigeonhole guarantee: two fingerprints differing in ≤ bands-1 bits MUST
    agree on at least one band, so recall is exact for max_hamming ≤
    bands-1 (the default 4 bands / ≤3 flips); the banded equi-join keeps
    candidate generation O(collisions), never O(n²) — the same LSH shape
    as MinHash banding, but on hamming space. The exact distance is
    bit_count(xor) over the bigint forms — codegen'd integer ops, no
    per-bit loops. The banded side is persisted+materialized: it feeds
    both sides of the self-join (see `eager`)."""
    nbits = 32
    width = nbits // bands
    band_arr = F.array(
        *[
            F.substring(F.col(sim_col), b * width + 1, width)
            for b in range(bands)
        ]
    )
    banded = eager(
        sh_df.select(
            F.col(id_col),
            F.col(sim_col),
            F.posexplode(band_arr).alias("band", "bits"),
        )
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(sim_col).alias("_sa"), "band", "bits"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(sim_col).alias("_sb"), "band", "bits"
    )
    cand = (
        a.join(b, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    ham = F.bit_count(
        F.conv("_sa", 2, 10)
        .cast("bigint")
        .bitwiseXOR(F.conv("_sb", 2, 10).cast("bigint"))
    ).cast("bigint")
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """x2 — 32-bit SimHash over words as a bit string: bit b is 1 when the
    word-population's b-th md5 bit majority is positive.

    Bit b of a word = bit (3 - b%4) of hex digit b//4 of md5(word), extracted
    with pure integer arithmetic (locate on a hex alphabet + div/mod) so the
    oracle reproduces it exactly.
    """
    expr = f"""
    array_join(transform(sequence(0, 31), b ->
      CASE WHEN aggregate(split({text_col}, ' '), 0, (acc, w) ->
        acc + (CASE WHEN (
            (locate(substr(md5(w), CAST(b div 4 AS int) + 1, 1), '0123456789abcdef') - 1)
            div (CASE CAST(b % 4 AS int) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)
          ) % 2 = 1 THEN 1 ELSE -1 END)
      ) > 0 THEN '1' ELSE '0' END), '')
    """
    return spread(df).withColumn(out_col, F.expr(expr))
