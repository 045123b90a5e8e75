"""Text-analysis operators (SURVEY.md §2 x4): language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All are built-in expression pipelines (split / regexp / aggregate) — the hot
path never leaves the JVM, unlike the reference's row-wise `.apply` habit
(/root/reference/data_analysis.ipynb:259, src/process_to_curated.py:24-26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.compute import spread

# Tiny marker lists for the n-gram/stopword language heuristic. Real
# pipelines plug in bigger tables; the operator shape (per-language
# occurrence scores + argmax) is what matters.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "fr": ["le", "la", "de"],
    "de": ["der", "die", "das"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def _occurrence_score(words_expr: str, markers: list[str]) -> str:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return (
        f"aggregate({words_expr}, 0, (acc, w) -> "
        f"acc + (CASE WHEN w IN ({quoted}) THEN 1 ELSE 0 END))"
    )


def lang_id(df: DataFrame, text_col: str, out_col: str = "pred_lang") -> DataFrame:
    """x4 — marker-word language ID: per-language occurrence counts, argmax
    (ties resolved in en > fr > de order, deterministically)."""
    words = f"split({text_col}, ' ')"
    scores = {
        lang: F.expr(_occurrence_score(words, m)) for lang, m in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["fr"]) & (scores["en"] >= scores["de"]), "en"
        )
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return spread(df).withColumn(out_col, pred)


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """x4 — quality features + composite score:
    word count, average word length, stopword ratio, and a bounded score
    favoring long documents with low stopword density."""
    n_words = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    n_chars = F.length(text_col).cast("bigint")
    avg_wlen = F.round(
        (n_chars - (n_words - 1)).cast("double") / n_words, 6
    )
    stop_count = F.expr(_occurrence_score(f"split({text_col}, ' ')", STOPWORDS))
    stop_ratio = F.round(stop_count.cast("double") / n_words, 6)
    score = F.round(
        F.lit(0.4) * F.least(n_words.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * F.least(avg_wlen / 10.0, F.lit(1.0)),
        6,
    )
    return spread(df).select(
        "*",
        n_words.alias("n_words"),
        avg_wlen.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """x4 — token counting three ways: whitespace tokens, BPE-ish regex
    tokens (letter runs / digit runs / single other), chars/4 estimate."""
    ws = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    re_toks = F.size(
        F.expr(f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")
    ).cast("bigint")
    est = F.ceil(F.length(text_col) / F.lit(4.0)).cast("bigint")
    return df.select(
        "*",
        ws.alias("ws_tokens"),
        re_toks.alias("regex_tokens"),
        est.alias("est_bpe_tokens"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """x4 — top-k characteristic terms per document by TF-IDF.

    Three hash aggregations (term frequency per doc, document frequency per
    term, corpus size), one join on term, one per-doc window for the top-k —
    every stage shuffles on its natural key with map-side partial
    aggregation; the 1-row corpus count joins in via broadcast crossJoin,
    never a driver-side collect. Ranking compares the ROUNDED score (plus
    term as tiebreak) so the ordering is deterministic across engines even
    where libm `ln` differs in the last ulp."""
    words = spread(df).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("_n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budget: int = 4096,
) -> DataFrame:
    """x4/x10 — concat-and-chunk sequence packing for LLM training: order
    documents deterministically within each group, lay them head-to-tail,
    and assign each to the training chunk (context window of `budget`
    tokens) its first token lands in.

    The running offset is a window prefix-sum PER GROUP (source shard) —
    the scalable form of packing: a single global order would serialize
    into one partition, while per-shard packing keeps every partition
    independent (and matches how training data is actually sharded). Pure
    bigint arithmetic — exact in any engine."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(token_col),
        offset.alias("token_offset"),
    ).withColumn(
        "chunk_id", F.expr(f"token_offset div {budget}").cast("bigint")
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """x4 — content fingerprint: md5 over whitespace-normalized lowercase
    text (the exact-dup key); pairs with x2's MinHash for near-dup."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.md5(F.trim(norm)))


def rolling_fingerprint(
    df: DataFrame, text_col: str, out_col: str = "rolling_hash"
) -> DataFrame:
    """x4 — polynomial rolling hash over characters:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) mod 1e9+7)``.

    The per-step mod keeps the accumulator < 2^35, so bigint arithmetic is
    overflow-free and the fold is portable to any engine verbatim (DuckDB:
    `list_reduce`). Unlike md5 (`fingerprint`), the polynomial form extends
    to windowed/rolling substring hashes (Rabin-Karp) — the building block
    for content-defined chunking of long documents."""
    expr = (
        f"aggregate(split({text_col}, ''), 0L, "
        f"(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"
    )
    return spread(df).withColumn(out_col, F.expr(expr))


def windowed_fingerprints(
    df: DataFrame, id_col: str, text_col: str, width: int = 5
) -> DataFrame:
    """x32 — per-position sliding-window fingerprints: one md5 per `width`-
    word window at every word position (stride 1). The chunk-level
    extension of `fingerprint`/`rolling_fingerprint`: where those identify
    whole documents, these make every SUBSTRING of `width` words joinable
    across documents.

    Shape (round 15, same rewrite as `dedup.exploded_shingles`): split once
    into a materialized `_words` projection, slice every `width`-word
    window out of the stored array with one `transform`, posexplode — the
    posexplode position IS the window's word position. This drops the
    previous posexplode→Window-`lead` stitching and with it the full
    exchange + sort of every word row (hash by id) that the window
    demanded. The `spread` keeps the explosion parallel off a
    single-file scan (downstream x32 work joins on the window HASH, so
    no keyed partitioning helps here — round-robin is the right call;
    omitting it re-serialized the 100c explosion into the 2-3 scan
    tasks, 115 s vs ~35 s). Docs shorter than `width` words emit no
    windows (they are whole-doc territory — x1/x2 cover them): the
    explicit `when` guard matters because `sequence(0, size-width)` with a
    negative stop would generate a DESCENDING sequence, not an empty one.
    Returns (id, pos, h)."""
    wins = F.when(
        F.size("_words") >= width,
        F.expr(
            f"transform(sequence(0, size(_words) - {width}), "
            f"i -> concat_ws(' ', slice(_words, i + 1, {width})))"
        ),
    )
    return (
        spread(df.select(id_col, text_col))
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("_words"))
        .select(F.col(id_col), F.posexplode(wins).alias("pos", "_win"))
        .select(F.col(id_col), "pos", F.md5("_win").alias("h"))
    )


def duplicated_spans(
    wins: DataFrame,
    id_col: str = "doc_id",
    width: int = 5,
    max_df: int | None = None,
    min_len: int | None = None,
) -> DataFrame:
    """x32 — cross-document duplicated spans from windowed fingerprints:
    for each doc pair (id_a < id_b), the maximal CONTIGUOUS runs of
    positions in doc a whose windows all occur in doc b — i.e. the shared
    boilerplate/license/quotation spans that survive doc-level MinHash
    (x2 is doc-granular; exact substring duplication needs this pass;
    cf. Lee et al., "Deduplicating Training Data Makes Language Models
    Better", which dedups on exact 50-token substrings).

    Emits (id_a, id_b, start_a, len_words): span start position in doc a
    and its length in WORDS (run length + width - 1... precisely
    max_pos - min_pos + width).

    Scale shape: candidate generation is ONE equi-join on the 16-byte
    window hash — never O(n²) on documents — followed by gaps-and-islands
    (row_number difference) per pair. The probe side is deduplicated to
    (doc, hash) so a window repeated inside one doc probes once. The
    fingerprint table feeds both join sides → persisted+materialized
    (`eager`).

    `max_df` — the document-frequency cap (round 11, VERDICT r10 item 1;
    the policy lever Lee et al.'s substring-dedup implementations apply
    to boilerplate): a window hash present in MORE than `max_df`
    documents is dropped BEFORE the join. The r11 scaling instrument
    measured the exact form's OUTPUT relation growing x5188 at a 30x
    corpus (hot boilerplate windows pair every co-containing doc pair —
    quadratic in document frequency by SEMANTICS, the same
    concentration mechanism behind all three r10 quadratic catches);
    engine work stays output-proportional, but at 1000x the output
    itself is the bottleneck. The cap bounds the per-hash join fan-out
    at max_df² and the OUTPUT at ~linear in corpus size. None keeps the
    exact semantics (the oracle form); the capped run is the policy
    default a 100 TB corpus wants — spans of ubiquitous boilerplate are
    better handled by a dedicated boilerplate filter than by emitting
    every pair.

    `min_len` — minimum span length in WORDS (Lee et al. dedup on exact
    50-TOKEN substrings, not single shingles): a span of exactly
    `width` words is ONE shared window, which at corpus scale is
    dominated by coincidental collisions between weakly-overlapping
    docs (measured: the 30x corpus' pair-span output stayed x2100 under
    the df-cap alone — every copy-pair sharing one window emits).
    Requiring `min_len >= width + 1` (≥2 consecutive shared windows)
    cuts the coincidence floor while keeping every real duplicated
    substring of that length; the filter runs AFTER the islands merge,
    so it changes the OUTPUT policy, not the engine shape."""
    from pyspark.sql import Window

    from ..functions.compute import eager

    wins = eager(wins)
    if max_df is not None:
        rare = (
            wins.groupBy("h")
            .agg(F.countDistinct(id_col).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("h")
        )
        # hot hashes are FEW (they concentrate) — the surviving-hash set
        # joins back on the same 16-byte key, no extra shuffle shape
        wins = wins.join(rare, "h")
    probe = wins.select(F.col(id_col).alias("id_b"), "h").distinct()
    matched = (
        wins.select(F.col(id_col).alias("id_a"), "pos", "h")
        .join(probe, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos")
        .distinct()
    )
    w = Window.partitionBy("id_a", "id_b").orderBy("pos")
    grouped = matched.withColumn(
        "_grp", F.col("pos") - F.row_number().over(w)
    )
    spans = grouped.groupBy("id_a", "id_b", "_grp").agg(
        F.min("pos").alias("start_a"),
        (F.max("pos") - F.min("pos") + width).alias("len_words"),
    ).select("id_a", "id_b", "start_a", "len_words")
    if min_len is not None:
        spans = spans.filter(F.col("len_words") >= min_len)
    return spans
