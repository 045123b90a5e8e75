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

import os

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
    """(id, shingle) rows — one split per doc, zero shuffles.

    Round-15 shape: split once into a materialized `_words` projection,
    slice each 3-word shingle out of the stored array with one `transform`
    lambda, explode. Catalyst keeps the multiply-referenced non-cheap
    `_words` alias un-inlined (verified: exactly ONE `split(` in the
    physical plan), so the r1-era pathology that originally forced the
    window form — `split()` re-run PER SHINGLE after the lambda inlined it,
    8 copies in the plan — no longer occurs on Spark 4.1.

    This replaces the previous posexplode → Window `lead` stitching, which
    paid a full exchange of every word row (hash by id) plus a sort just to
    see each word's two successors. Measured at sf0.1 (same session,
    best-of-4): 0.95 s → 0.46 s for the shingle explosion alone, and the
    whole-corpus word shuffle is gone — strictly fewer exchanges at any
    scale. Downstream consumers that aggregate by id (minhash signatures,
    distinct-shingle sets) now install their own hash exchange, but it
    carries partial-aggregated rows (one per doc per map partition), far
    less than the word rows the window shuffled. Short docs (<SHINGLE_W
    words) contribute their whole text: `concat_ws(' ', _words)` is an
    exact roundtrip of the single-space split (empty words preserved),
    avoiding carrying `text` alongside `_words`."""
    w = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_words"))
    shingles = F.when(
        F.size("_words") < SHINGLE_W, F.array(F.concat_ws(" ", "_words"))
    ).otherwise(
        F.expr(
            f"transform(sequence(0, size(_words) - {SHINGLE_W}), "
            f"i -> concat_ws(' ', slice(_words, i + 1, {SHINGLE_W})))"
        )
    )
    return w.select(F.col(id_col), F.explode(shingles).alias("s"))


def distinct_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """DISTINCT (id, shingle) rows, hash-partitioned by `id_col` — the
    shareable shingle table for verify pipelines (round 15).

    MinHash mins are unaffected by duplicate shingles, and the Jaccard /
    containment verify stage needs the distinct sets anyway, so a pipeline
    that feeds BOTH (x2b, x44) should shingle-dedup ONCE here and cache the
    result. The explicit `repartition(id_col)` before the dedup is the
    load-bearing part: it makes the deduplicating aggregate exchange-free
    (hash partitioning on `id_col` satisfies the (id, s) clustering) and —
    more importantly — the CACHED table comes out hash-partitioned by
    `id_col`, so every downstream per-doc aggregation (signature mins, set
    sizes) reuses the partitioning instead of re-shuffling the cached
    shingle rows. Measured at sf0.1 (same-session best-of-4, x2b end to
    end): caching the raw round-robin shingles 3.82 s, this 2.19-2.42 s
    (the r14 window-form baseline read 2.43-2.92 s in the same session).

    The repartition runs on the DOCS, before the explosion: Generate
    preserves its child's partitioning, so the exploded shingle rows come
    out hash-clustered by id without ever shuffling a shingle — ONE
    exchange of document rows total, and hash-by-id distributes documents
    across the cluster just as well as a round-robin spread would
    (measured: cache build 0.77-0.99 s → 0.48-0.56 s when the
    spread + post-explode repartition pair collapsed into this)."""
    return exploded_shingles(
        df.repartition(id_col), id_col, text_col
    ).dropDuplicates([id_col, "s"])


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

    The default path hash-partitions the DOCS by id before exploding
    (round 15): Generate preserves partitioning, so the signature
    aggregation below is exchange-free — one exchange of document rows is
    the whole pipeline's shuffle (x2 end-to-end 1.67 s → 1.15 s at sf0.1
    when this replaced round-robin spread + a post-aggregation exchange).
    """
    ex = (
        shingles
        if shingles is not None
        else exploded_shingles(df.repartition(id_col), id_col, text_col)
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


def _input_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for `df` (file-index bytes for scans) — a
    pure driver-side scale probe, no Spark job, any storage backend.
    Frames without real statistics (createDataFrame/RDD-backed) carry
    Catalyst's defaultSizeInBytes = Long.MAX and therefore read as huge;
    0 (small) only on probe failure."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 0


def _pair_overlap(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingles: DataFrame | None,
    shingles_are_distinct: bool = False,
) -> DataFrame:
    """Shared verify core for jaccard_verify / containment_verify: per
    candidate pair, the exact distinct-shingle intersection plus both set
    sizes — (id_a, id_b, _inter, _na, _nb). Intersection is the equi-join
    of the two exploded distinct-shingle sides on (pair, shingle); LSH
    false positives with zero overlap keep _inter = 0 via the left join.
    Both the pairs and the distinct-shingle table persist+materialize up
    front — each feeds two+ branches, several broadcast builds, which
    would otherwise recompute the upstream pipeline concurrently (see
    functions.compute.eager).

    Round 16 (guide §3.2 semi-join reduction): only ids that appear in a
    candidate pair can influence the output (every consumer below joins
    back to `pairs`), so on corpora past SPARK_GRAFT_VERIFY_CUT_MIN_BYTES
    of input the shingle table is cut to candidate ids with one left-semi
    join BEFORE the intersection joins and the set-size aggregation. At
    LSH-selective duplicate rates the verify stage then touches a
    candidate-sized table instead of the whole corpus three times — the
    100 TB shape; the semi probe itself is exchange-free on the shingle
    side (the cached table is hash-partitioned by id, and the id set
    broadcasts while it fits, degrading to a shuffle of ids only). The
    cut costs two fixed jobs (id-set build + materializing the cut
    table), so below the threshold — where the whole verify is a few
    hundred ms and the avoided scans are tiny — it is skipped (measured
    at sf0.1/5k docs: cut 2.16 s vs plain 1.84 s best; at the
    100c/500k-doc fixture the cut reads median 22.2 s vs 24.3 s with a
    far tighter spread). The decision reads Catalyst's size estimate on
    the driver — no job, independent of the data values; frames without
    real statistics (in-memory test frames) read as huge and take the
    cut path, which is always result-identical."""
    pairs = eager(pairs)
    raw = (
        shingles
        if shingles is not None
        else exploded_shingles(df.repartition(id_col), id_col, text_col)
    )
    if shingles_are_distinct and shingles is not None and not shingles.is_cached:
        # The flag's contract (ADVICE r15): 'distinct AND cached'. An
        # uncached frame would silently recompute the whole shingle
        # pipeline per broadcast build below — fail loudly instead.
        raise ValueError(
            "shingles_are_distinct=True requires a persisted "
            "distinct-shingle table (e.g. eager(distinct_shingles(...)))"
        )
    if _input_bytes(df) >= int(
        os.environ.get("SPARK_GRAFT_VERIFY_CUT_MIN_BYTES", str(32 << 20))
    ):
        pair_ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .dropDuplicates([id_col])
        )
        cut = raw.join(pair_ids, id_col, "left_semi")
        # dedup AFTER the cut: only candidate docs pay the distinct (the
        # semi preserves the id partitioning, so it stays exchange-free)
        sh = eager(cut if shingles_are_distinct else cut.distinct())
    else:
        # A caller passing `distinct_shingles(...)` (already deduped AND
        # cached partitioned by id) sets shingles_are_distinct — re-running
        # distinct here would pay a second aggregate pass over the cached
        # rows.
        sh = raw if shingles_are_distinct else eager(raw.distinct())
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
    shingles_are_distinct: bool = False,
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
    return _pair_overlap(
        pairs, df, id_col, text_col, shingles, shingles_are_distinct
    ).select(
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
    shingles_are_distinct: bool = False,
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
        _pair_overlap(pairs, df, id_col, text_col, shingles, shingles_are_distinct)
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
    HDFS-backed.) Convergence (round 15): the loop stops at the FIRST
    round whose output is a star forest, instead of fingerprinting the
    edge set and re-running one full confirmation round to observe
    stability. A canonical (u > v) edge set is a star forest iff every
    `u` appears exactly once AND no `u` also appears as a `v`; a star
    forest is a fixed point of both operators (large-star: each leaf
    relinks to the center it already has; small-star: each center keeps
    its leaves), and the output join below this loop already RELIES on
    fixed points being exactly the min-centered star forests — so
    stopping here yields the IDENTICAL edge set one round (≈6 shuffles
    plus an agg job) earlier. The test is one groupBy job over the
    round's fixed-width edges, no driver-side edge list."""
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

    converged = False
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        # Star-forest test (one scalar row; the action doubles as the
        # checkpoint materializer — one job per round): a violation is a
        # node appearing more than once as u, or as both u and v.
        roles = edges.select(
            u.alias("_node"), F.lit(1).alias("_nu"), F.lit(0).alias("_nv")
        ).unionByName(
            edges.select(
                v.alias("_node"), F.lit(0).alias("_nu"), F.lit(1).alias("_nv")
            )
        )
        violations = (
            roles.groupBy("_node")
            .agg(F.sum("_nu").alias("_cu"), F.max("_nv").alias("_anyv"))
            .filter(
                (F.col("_cu") > 1) | ((F.col("_cu") >= 1) & (F.col("_anyv") == 1))
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()[0]["n"]
        )
        if violations == 0:
            converged = True
            break
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
    #
    # Round 16 measured-and-REJECTED: broadcasting the relabel map here
    # (exact row count piggybacked on the convergence aggregate, hinted
    # when provably tiny) read SLOWER at the 100c fixture in BOTH
    # interleave orders (on 27.4/28.8 vs off 25.4/25.9 best/median, and
    # 23.7/24.3 vs 21.7/23.2) and a wash at sf0.1 — the SMJ's probe-side
    # exchange is already shared with the `nodes` distinct, so the hint
    # only replaces one small star-side exchange with a driver
    # collect+broadcast build job. The planner-chosen join stands.
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

    Round 15 optimization note: the "explode words → 64 codegen'd ±1
    sum-aggs per doc" rewrite (the minhash explode/groupBy trick, guide
    §4.1) was measured-REJECTED — same-session best-of-4 at sf0.1: this
    per-row interpreted fold 0.861 s vs the explode+HashAggregate form
    1.854 s. The groupBy's exchange + second aggregate stage costs more
    wall than the interpreter overhead it removes, and at cluster scale
    this form also shuffles NOTHING (the fold is embarrassingly per-row)
    while the explode form pays one 64-long-per-doc exchange. Kept
    per-row; see OPTIMIZATION_r15.md and tests/test_opt_r15.py for the
    pinned equivalence of the two forms.
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
