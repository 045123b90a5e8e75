"""Catalog entries for the fourth batch of LLM-data-pipeline extensions
(SURVEY.md §2 group X): published corpus-quality heuristics (Gopher-style
rule filters, repetition metrics) and domain-mixing weights — the filters
and mixing decisions that sit in front of every large pretraining run.

The reference (sarafa19/Data-Lakes-tp2-student) has none of this surface —
it is mandated by the driver's north star (training-data pipelines at
100 TB); the rules follow the published Gopher (Rae et al. 2021, §A1.1)
and FineWeb/C4 filtering recipes, adapted to word-level signals (the
synthetic documents carry no newlines, so line-based variants degenerate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import load, register

# Gopher-style rule thresholds (word-level adaptation).
_MIN_WORDS, _MAX_WORDS = 50, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MIN_ALPHA_FRAC = 0.8
_STOPWORDS = ("the", "a", "of", "to", "and")
_MIN_STOP_HITS = 2


@register(
    "x26_gopher_quality_filters",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words,
               len(string_split(text, ' ')) AS n_words,
               length(text) - length(replace(text, ' ', '')) AS n_spaces
        FROM documents
    ),
    m AS (
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               round(CAST(length(array_to_string(words, '')) AS DOUBLE)
                     / n_words, 6) AS mean_word_len,
               round(CAST(len(list_filter(words,
                          x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                     / n_words, 6) AS alpha_frac,
               CAST(len(list_filter(words,
                    x -> list_contains(
                        ['the', 'a', 'of', 'to', 'and'], x))) AS BIGINT)
                   AS stop_hits
        FROM w
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
           (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS})
           AND (mean_word_len BETWEEN {_MIN_MWL} AND {_MAX_MWL})
           AND alpha_frac >= {_MIN_ALPHA_FRAC}
           AND stop_hits >= {_MIN_STOP_HITS} AS keep
    FROM m
    """,
)
def x26_gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x26 — GOPHER-style rule filters (Rae et al. 2021 §A1.1, word-level
    adaptation): per-doc word count bounds, mean word length bounds,
    alphabetic-word fraction, and stopword presence, combined into one
    `keep` verdict — the standard first-pass pretraining filter.

    Scale shape: pure per-row expressions over ONE split (no shuffle at
    all; the `words` array never leaves the row) — the whole filter is a
    map-only pass over the corpus, exactly what a 100 TB first-pass scan
    must be."""
    docs = load(spark, sf_dir, "documents")
    stop_lits = F.array(*[F.lit(s) for s in _STOPWORDS])
    w = docs.select(
        "doc_id", F.split("text", " ").alias("words")
    ).withColumn("n_words", F.size("words"))
    m = w.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(
            F.length(F.array_join("words", "")).cast("double")
            / F.col("n_words"),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter("words", lambda x: x.rlike("[A-Za-z]"))).cast(
                "double"
            )
            / F.col("n_words"),
            6,
        ).alias("alpha_frac"),
        F.size(
            F.filter("words", lambda x: F.array_contains(stop_lits, x))
        )
        .cast("bigint")
        .alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
        & F.col("mean_word_len").between(_MIN_MWL, _MAX_MWL)
        & (F.col("alpha_frac") >= _MIN_ALPHA_FRAC)
        & (F.col("stop_hits") >= _MIN_STOP_HITS)
    )
    return m.withColumn("keep", keep)


@register(
    "x27_repetition_metrics",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    uni AS (
        SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
               CAST((SELECT max(c) FROM (
                    SELECT count(*) AS c FROM unnest(words) AS t(x)
                    GROUP BY x)) AS BIGINT) AS top_word_n
        FROM w
    ),
    bi AS (
        SELECT doc_id,
               CAST((SELECT max(c) FROM (
                    SELECT count(*) AS c FROM unnest(
                        list_transform(range(1, len(words)),
                                       i -> words[i] || ' ' || words[i + 1]))
                        AS t(x)
                    GROUP BY x)) AS BIGINT) AS top_bigram_n
        FROM w
    )
    SELECT u.doc_id, u.n_words,
           round(CAST(u.n_distinct AS DOUBLE) / u.n_words, 6) AS ttr,
           round(CAST(u.top_word_n AS DOUBLE) / u.n_words, 6)
               AS top_word_frac,
           round(CAST(b.top_bigram_n AS DOUBLE) / (u.n_words - 1), 6)
               AS top_bigram_frac
    FROM uni u JOIN bi b ON u.doc_id = b.doc_id
    """,
)
def x27_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x27 — REPETITION metrics (the FineWeb/Gopher repetition family,
    word-level): type-token ratio, most-frequent-word fraction, and
    most-frequent-bigram fraction per document — the signals that catch
    boilerplate, keyword stuffing, and degenerate generations.

    Scale shape: everything stays INSIDE the row — distinct/top counts
    come from `aggregate` over the words array and a same-row bigram
    construction, so the metric pass is map-only with no explode and no
    shuffle (an exploded groupBy(doc, word) would shuffle the corpus's
    every word). 100 TB cost = one scan."""
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words"))
    # top-count within the row: sort a copy, then the longest run of equal
    # neighbors = the max multiplicity (pure array expressions, codegen'd
    # where possible, zero shuffle).
    def top_count(arr: str) -> F.Column:
        return F.expr(
            f"""
            aggregate(
                array_sort({arr}),
                named_struct('prev', CAST(NULL AS STRING),
                             'run', 0L, 'best', 0L),
                (acc, x) -> named_struct(
                    'prev', x,
                    'run', IF(acc.prev IS NOT NULL AND x = acc.prev,
                              acc.run + 1, 1L),
                    'best', greatest(acc.best,
                                     IF(acc.prev IS NOT NULL
                                        AND x = acc.prev,
                                        acc.run + 1, 1L))),
                acc -> acc.best)
            """
        )

    # sequence(1, 0) DESCENDS in Spark (auto step -1) and would index past
    # the array on a single-word doc — guard it to an empty bigram list
    # (the oracle's range(1, 1) is empty for the same row).
    bigrams = F.when(
        F.size("words") < 2, F.expr("cast(array() AS array<string>)")
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(words) - 1), "
            "i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"
        )
    )
    m = w.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("words")).cast("bigint").alias("n_distinct"),
        top_count("words").alias("top_word_n"),
        bigrams.alias("bigrams"),
    ).withColumn("top_bigram_n", top_count("bigrams"))
    return m.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_distinct").cast("double") / F.col("n_words"), 6)
        .alias("ttr"),
        F.round(F.col("top_word_n").cast("double") / F.col("n_words"), 6)
        .alias("top_word_frac"),
        # single-word doc: no bigrams -> null (matches the oracle, whose
        # max() over an empty unnest is NULL and propagates through the /)
        F.when(
            F.col("n_words") > 1,
            F.round(
                F.col("top_bigram_n").cast("double") / (F.col("n_words") - 1),
                6,
            ),
        ).alias("top_bigram_frac"),
    )


@register(
    "x30_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    tot AS (SELECT count(*) AS total FROM toks),
    q AS (
        SELECT term,
               CAST(floor(ln(CAST(cnt AS DOUBLE) / total)
                          * 1000000000.0) AS BIGINT) AS q
        FROM freq, tot
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_words,
           round(CAST(sum(tf.tf * q.q) AS DOUBLE) / 1000000000.0
                 / CAST(sum(tf.tf) AS DOUBLE), 6) AS avg_logprob
    FROM tf JOIN q USING (term)
    GROUP BY tf.doc_id
    """,
)
def x30_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x30 — UNIGRAM language-model scoring (the CCNet/KenLM-style quality
    signal, reduced to its SQL-expressible core): fit word probabilities on
    the corpus itself, score each document by its mean per-word log
    probability — low scorers are gibberish/outliers, the classic
    perplexity-bucket filter.

    Engine-portable float policy (same as x19 BM25): each word's ln(p) is
    computed once in a fixed expression shape and fixed-point-quantized to
    BIGINT; per-doc totals are integer sums (associative at any
    parallelism), divided back to double at the boundary.

    Scale shape: the vocab table is aggregate-bounded and BROADCAST to the
    per-(doc, term) counts; both count tables partial-aggregate map-side
    from one exploded scan. Nothing corpus-sized shuffles twice."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = toks.agg(F.count(F.lit(1)).alias("total"))
    q = freq.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("total"))
            * F.lit(1000000000.0)
        )
        .cast("bigint")
        .alias("q"),
    )
    per_doc = (
        tf.join(F.broadcast(q), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_words"),
            F.sum(F.col("tf") * F.col("q")).alias("_sq"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        F.round(
            F.col("_sq").cast("double")
            / F.lit(1000000000.0)
            / F.col("n_words").cast("double"),
            6,
        ).alias("avg_logprob"),
    )


@register(
    "x29_domain_mixing_weights",
    oracle="""
    WITH tok AS (
        -- CAST the sum: DuckDB lands sum(BIGINT) as HUGEINT -> float64
        -- in pandas, which stringifies as '2100.0' vs Spark's '2100'
        SELECT source,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
                   AS tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT source, tokens,
               round(CAST(tokens AS DOUBLE) / sum(tokens) OVER (), 6)
                   AS share,
               round(1.0 / count(*) OVER (), 6) AS target_share
        FROM tok
    )
    SELECT source, tokens, share, target_share,
           round(target_share / share, 6) AS mix_weight
    FROM tot
    """,
)
def x29_domain_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x29 — DOMAIN MIXING weights: per-source token totals, current corpus
    share, a (uniform) target share, and the resulting sampling weight
    target/current — the knob every pretraining mix turns (DoReMi-style
    reweighting reduces to swapping the target vector in).

    Scale shape: one partial-agg shuffle to ≤|sources| rows; the windows
    run over that tiny aggregate in a single task BY DESIGN (source
    cardinality is bounded); the corpus itself is scanned once."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.ceil(F.length("text") / 4.0).cast("bigint")).alias("tokens")
    )
    w_all = Window.partitionBy()
    tot = tok.select(
        "source",
        "tokens",
        F.round(
            F.col("tokens").cast("double") / F.sum("tokens").over(w_all), 6
        ).alias("share"),
        F.round(F.lit(1.0) / F.count(F.lit(1)).over(w_all), 6).alias(
            "target_share"
        ),
    )
    return tot.withColumn(
        "mix_weight", F.round(F.col("target_share") / F.col("share"), 6)
    )


@register(
    "x33_importance_sampling",
    oracle="""
    -- DSIR-style selection: rank raw-pool docs by the unigram
    -- log-importance ratio ln p_target(w) - ln p_pool(w), Laplace-smoothed
    -- over the shared vocab, fixed-point-quantized per word (same float
    -- policy as x30); target domain = source 'src0'
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    vocab AS (SELECT count(DISTINCT term) AS v FROM toks),
    tcnt AS (SELECT term, count(*) AS c FROM toks
             WHERE source = 'src0' GROUP BY term),
    pcnt AS (SELECT term, count(*) AS c FROM toks
             WHERE source <> 'src0' GROUP BY term),
    ttot AS (SELECT count(*) AS n FROM toks WHERE source = 'src0'),
    ptot AS (SELECT count(*) AS n FROM toks WHERE source <> 'src0'),
    ratio AS (
        SELECT p.term,
               CAST(floor((ln((coalesce(t.c, 0) + 1.0) / (ttot.n + vocab.v))
                           - ln((p.c + 1.0) / (ptot.n + vocab.v)))
                          * 1000000000.0) AS BIGINT) AS q
        FROM pcnt p LEFT JOIN tcnt t USING (term), ttot, ptot, vocab
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE source <> 'src0' GROUP BY doc_id, term
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST(sum(tf.tf) AS BIGINT) AS n_words,
               round(CAST(sum(tf.tf * ratio.q) AS DOUBLE) / 1000000000.0
                     / CAST(sum(tf.tf) AS DOUBLE), 6) AS avg_log_ratio
        FROM tf JOIN ratio USING (term)
        GROUP BY tf.doc_id
    )
    SELECT doc_id, n_words, avg_log_ratio FROM scored
    ORDER BY avg_log_ratio DESC, doc_id LIMIT 50
    """,
)
def x33_importance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x33 — importance-based DATA SELECTION (the DSIR recipe — Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling" —
    reduced to its unigram core): fit a target LM on the target domain
    ('src0') and a pool LM on everything else, score each pool document by
    its mean per-word log importance ratio ln p_t(w) − ln p_p(w), and keep
    the top-N most target-like documents. The standard pretraining move of
    "select web data that looks like the high-quality domain".

    Laplace smoothing over the SHARED vocab keeps the target LM defined on
    pool-only words; each word's ratio is computed once in a fixed
    expression shape and fixed-point-quantized to BIGINT (the x30/x19
    float policy), so per-doc scores are integer sums — associative,
    engine-portable, stable under any partitioning.

    Scale shape: one exploded scan feeds every aggregate (map-side partial
    combine); the per-word ratio table is vocab-bounded and BROADCAST to
    the per-(doc, term) counts; the final top-N is TakeOrderedAndProject
    (never a global sort). Nothing corpus-sized shuffles twice."""
    target = F.col("source") == "src0"
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    # ONE corpus-sized explode + combine: per-(doc, term) counts split by
    # side. Every other input — per-term LM counts, both totals, the
    # vocab size — is a VOCAB-bounded rollup of these two tiny tables,
    # not another scan (review r5: the first cut re-exploded the corpus
    # six times for quantities derivable from each other).
    dtf = toks.groupBy("doc_id", "term").agg(
        F.sum(F.when(target, 1).otherwise(0)).alias("_tc"),
        F.sum(F.when(~target, 1).otherwise(0)).alias("_pc"),
    )
    cnt = dtf.groupBy("term").agg(
        F.sum("_tc").alias("tc"), F.sum("_pc").alias("pc")
    )
    totals = cnt.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("tc").alias("tn"),
        F.sum("pc").alias("pn"),
    )
    ratio = (
        cnt.filter(F.col("pc") > 0)
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tn") + F.col("v"))
                    )
                    - F.log(
                        (F.col("pc") + F.lit(1.0)) / (F.col("pn") + F.col("v"))
                    )
                )
                * F.lit(1000000000.0)
            )
            .cast("bigint")
            .alias("q"),
        )
    )
    tf = dtf.filter(F.col("_pc") > 0).select(
        "doc_id", "term", F.col("_pc").alias("tf")
    )
    scored = (
        tf.join(F.broadcast(ratio), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_words"),
            F.sum(F.col("tf") * F.col("q")).alias("_sq"),
        )
        .select(
            "doc_id",
            "n_words",
            F.round(
                F.col("_sq").cast("double")
                / F.lit(1000000000.0)
                / F.col("n_words").cast("double"),
                6,
            ).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(50)
