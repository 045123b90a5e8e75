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

Cache contract: `eager()`/persist sites in this module (candidate tables,
pair-overlap inputs) are NOT unpersisted before return — the returned
DataFrames still read the cached blocks. Long sessions running many
queries are expected to `spark.catalog.clearCache()` after each query
materializes, which both the bench harness (bench.py) and the local
oracle gate (tests/oracle.py) do; see operators/graph.py for the same
documented contract.
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


def _pair_overlap(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingles: DataFrame | None,
) -> DataFrame:
    """Shared verify core for jaccard_verify / containment_verify: per
    candidate pair, the exact distinct-shingle intersection plus both set
    sizes — (id_a, id_b, _inter, _na, _nb). Intersection is the equi-join
    of the two exploded distinct-shingle sides on (pair, shingle); LSH
    false positives with zero overlap keep _inter = 0 via the left join.
    Both the pairs and the distinct-shingle table persist+materialize up
    front — each feeds two+ branches, several broadcast builds, which
    would otherwise recompute the upstream pipeline concurrently (see
    functions.compute.eager)."""
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
    return _pair_overlap(pairs, df, id_col, text_col, shingles).select(
        "id_a",
        "id_b",
        F.round(
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")),
            6,
        ).alias("jaccard"),
    )


def containment_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """x44 — exact shingle-set CONTAINMENT for candidate pairs, the
    asymmetric companion to `jaccard_verify`: containment_a = |A∩B|/|A|
    detects a short document embedded in a long one (quote, boilerplate
    wrapper, doc-in-doc), which symmetric Jaccard scores near zero when
    sizes differ. Pairs are classified on the ROUNDED scores (so any
    engine draws the same thresholds): both containments >= 0.9 →
    'duplicate'; one side → 'contained'; else 'overlap'.

    Same join shape and persistence discipline as `jaccard_verify`
    (intersection = equi-join on (pair, shingle); only LSH candidates pay
    set costs; the shingle table feeds multiple branches → eager)."""
    ca = F.round(F.col("_inter").cast("double") / F.col("_na"), 6)
    cb = F.round(F.col("_inter").cast("double") / F.col("_nb"), 6)
    return (
        _pair_overlap(pairs, df, id_col, text_col, shingles)
        .select(
            "id_a",
            "id_b",
            F.col("_inter").cast("bigint").alias("n_common"),
            ca.alias("containment_a"),
            cb.alias("containment_b"),
            F.when((ca >= 0.9) & (cb >= 0.9), F.lit("duplicate"))
            .when((ca >= 0.9) | (cb >= 0.9), F.lit("contained"))
            .otherwise(F.lit("overlap"))
            .alias("relation"),
        )
    )


def dup_clusters(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """x2 — connected components over near-dup candidate pairs: every doc in
    a duplicate cluster gets ``cluster_id`` = the minimum doc id reachable
    through candidate edges. This is the step between "pairs" and "keep one
    per cluster" — pairwise dedup alone breaks on A~B, B~C chains where A~C
    never collides.

    Two-phase large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14), as DataFrame ops on an edge table:

    - **large-star**: every node links its strictly-LARGER neighbors to the
      minimum of its closed neighborhood;
    - **small-star**: every node links its smaller-or-equal neighbors (and
      itself) to its minimum neighbor.

    Alternating the two provably converges to per-component stars centered
    on the component minimum in O(log² n) rounds — in practice roughly half
    the rounds of min-label propagation + pointer jumping (the previous
    implementation here; VERDICT r4 item 2), because every round contracts
    the EDGE set itself rather than walking labels along it. State is
    O(edges), never O(corpus): singleton docs never enter the graph.

    Both operators keep edges in canonical (u > v) orientation, so each
    phase is one groupBy + one co-partitioned join + one distinct — three
    shuffles on fixed-width id pairs. Each round's edge set is
    `localCheckpoint`ed (lazily — the convergence aggregate is the action
    that materializes it): `persist` alone leaves the logical plan intact
    and the round-over-round self-reference builds an exponential plan tree
    that OOMs Catalyst analysis after ~10 rounds regardless of data size.
    (On a multi-executor cluster with unreliable nodes, swap for
    `sparkContext.setCheckpointDir` + `checkpoint()` — same contract,
    HDFS-backed.) Convergence is a (count, xxhash-sum) fingerprint of the
    canonical edge set — one scalar aggregate per round, no driver-side
    edge list."""
    u, v, m = F.col("u"), F.col("v"), F.col("m")
    edges = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"),
            F.least("id_a", "id_b").alias("v"),
        )
        .filter(u != v)
        .distinct()
        .localCheckpoint()
    )
    # All nodes that ever appear — the output contract covers every doc in
    # `pairs` even though star-contraction drops satisfied edges early.
    # Derived LAZILY from the already-checkpointed initial edge set: it is
    # only consumed by the final output join, so it costs no extra job here.
    nodes = (
        edges.select(u.alias("id"))
        .unionByName(edges.select(v.alias("id")))
        .distinct()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric view: each undirected edge seen from both endpoints
        sym = e.select(u.alias("src"), v.alias("dst")).unionByName(
            e.select(v.alias("src"), u.alias("dst"))
        )
        mins = sym.groupBy("src").agg(
            F.least(F.col("src"), F.min("dst")).alias("m")
        )
        return (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("u"), m.alias("v"))
            .filter(u != v)
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # canonical orientation already has u > v: node u's smaller
        # neighborhood IS its edge list
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        relink = (
            e.join(mins, "u")
            .select(v.alias("u"), m.alias("v"))
            .unionByName(mins.select(u, m.alias("v")))
            .filter(u != v)
            .distinct()
        )
        return relink

    prev_fp, converged = None, False
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        # one-scalar-row fingerprint; the action doubles as the
        # checkpoint materializer — one job per round
        fp = edges.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of xxhash64 values overflows
            # under ANSI mode; decimal(38,0) holds ~10^18 edges' worth
            F.sum(F.xxhash64("u", "v").cast("decimal(28,0)")).alias("h"),
        ).collect()[0]
        fp = (fp["n"], fp["h"])
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        # The star-join below is only correct at the fixed point; a
        # non-star edge set would emit WRONG labels and duplicate doc
        # rows, silently corrupting downstream keep-one dedup. Chains
        # converge in ~2·log2(n) rounds (measured: 15 @ 10^4, 18 @ 10^5),
        # so 30 covers any realistic duplicate graph — fail loud, never
        # guess.
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds; "
            "raise max_iter for adversarially deep duplicate chains"
        )
    # At the fixed point every component is a star centered on its minimum:
    # non-root nodes appear exactly once as `u` with `v` = root; roots only
    # as `v`. Left join + coalesce folds roots back in as their own label.
    return nodes.join(
        edges.select(u.alias("id"), v.alias("cluster_id")), "id", "left"
    ).select(
        F.col("id").alias("doc_id"),
        F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
    )


def simhash_pairs(
    sh_df: DataFrame,
    id_col: str,
    sim_col: str = "simhash",
    bands: int = 4,
    max_hamming: int = 3,
    sub_bands: int = 4,
) -> DataFrame:
    """x2 — SimHash near-dup candidate pairs: TWO-LEVEL banding of the
    64-bit fingerprint (round 10 — the scaling bench caught the 32-bit /
    8-bit-band form going quadratic: candidates ~ n²/2^width, measured
    x105.9 wall at 10x docs, 363M candidates at 50k). Emit pairs
    (id_a < id_b) colliding on (band, sub-band), then keep pairs within
    `max_hamming` exact bit flips.

    Pigeonhole guarantee, both levels: ≤3 diffs over 4 disjoint 16-bit
    bands → some band is clean; GIVEN that band is clean, the
    complementary 48 bits still hold all ≤3 diffs → some 12-bit sub-band
    of them is clean too — so every true pair collides on at least one
    of the 16 (band, sub) combos and recall is exact for max_hamming ≤
    min(bands, sub_bands) - 1. The effective join key is 16+12 = 28
    bits: candidate volume ~ n²/2^28 instead of n²/2^8 (Manku et al.
    2007 use the same fingerprint width and radius; their
    permuted-table probing is this scheme's generalization — at larger
    n, raise bands/sub_bands to widen the effective key further). The
    exact distance is bit_count(xor) over the two 32-bit halves —
    codegen'd integer ops, no per-bit loops. The banded side is
    persisted+materialized: it feeds both sides of the self-join (see
    `eager`)."""
    nbits = 64
    width = nbits // bands
    swidth = (nbits - width) // sub_bands
    combos = []
    for b in range(bands):
        comp = F.concat(
            *[
                F.substring(F.col(sim_col), x * width + 1, width)
                for x in range(bands)
                if x != b
            ]
        )
        for s in range(sub_bands):
            combos.append(
                F.struct(
                    F.lit(b * sub_bands + s).alias("band"),
                    F.concat(
                        F.substring(F.col(sim_col), b * width + 1, width),
                        F.substring(comp, s * swidth + 1, swidth),
                    ).alias("bits"),
                )
            )
    banded = eager(
        sh_df.select(
            F.col(id_col), F.col(sim_col), F.explode(F.array(*combos)).alias("k")
        ).select(F.col(id_col), F.col(sim_col), "k.band", "k.bits")
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

    def _half(col: str, i: int):
        return (
            F.conv(F.substring(col, i * 32 + 1, 32), 2, 10).cast("bigint")
        )

    ham = sum(
        F.bit_count(_half("_sa", i).bitwiseXOR(_half("_sb", i))).cast("bigint")
        for i in range(2)
    )
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """x2 — 64-bit SimHash over words as a bit string: bit b is 1 when the
    word-population's b-th md5 bit majority is positive (bit b = the b-th
    MSB of the first 16 hex digits of md5(word)). 64 bits as of round 10
    (was 32): the scaling bench showed a 32-bit fingerprint's band
    buckets densifying quadratically at 50k docs — 64-bit is the
    published SimHash width (Manku et al. 2007) and what simhash_pairs'
    two-level banding needs for 28-bit effective keys.

    Two md5 PER WORD — one per 32-bit half (review r6 guarded against
    the k-fold shape where md5 re-evaluates inside every per-bit
    aggregate, 64x the hash work): the halves land in two materialized
    bigint-array columns and the 64 majority folds run over the
    precomputed ints with pure bit arithmetic. (Catalyst inlines the
    shared _wmd5 prefix into both half-columns — two md5 calls per word
    in the optimized plan, verified; collapsing to one would need an
    engine-specific hash DuckDB can't mirror.) The bit definition
    matches the DuckDB oracle's hex-digit extraction exactly (b-th MSB
    either way).
    """
    wmd5 = f"transform(split({text_col}, ' '), w -> substr(md5(w), 1, 16))"
    wh = "transform(_wmd5, m -> CAST(conv(substr(m, 1, 8), 16, 10) AS BIGINT))"
    wl = "transform(_wmd5, m -> CAST(conv(substr(m, 9, 8), 16, 10) AS BIGINT))"
    expr = """
    array_join(transform(sequence(0, 63), b ->
      CASE WHEN aggregate(IF(b < 32, _wh, _wl), 0, (acc, h) ->
        acc + (CASE WHEN (h div shiftleft(CAST(1 AS BIGINT), 31 - b % 32)) % 2 = 1
               THEN 1 ELSE -1 END)
      ) > 0 THEN '1' ELSE '0' END), '')
    """
    return (
        spread(df)
        .withColumn("_wmd5", F.expr(wmd5))
        .withColumn("_wh", F.expr(wh))
        .withColumn("_wl", F.expr(wl))
        .withColumn(out_col, F.expr(expr))
        .drop("_wmd5", "_wh", "_wl")
    )
