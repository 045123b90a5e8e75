"""Catalog entries for the third batch of LLM-data-pipeline extensions
(SURVEY.md §2 group X): document chunking, incremental batch-vs-history
dedup, and token-budget corpus selection — the operations that sit between
a cleaned corpus and an actual training run.

The reference (sarafa19/Data-Lakes-tp2-student) has none of this surface —
it is mandated by the driver's north star (training-data pipelines at
100 TB); see SURVEY.md §2.X.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import load, register

_CHUNK = 200  # words per chunk
_STRIDE = 150  # chunk start spacing (=> 50-word overlap)


@register(
    "x23_doc_chunking",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words,
               len(string_split(text, ' ')) AS n_words
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, n_words, CAST(t.i AS BIGINT) AS chunk_id,
               CAST(t.i * {_STRIDE} AS BIGINT) AS word_start
        FROM w, unnest(range(0, greatest(1,
                 CAST(ceil((n_words - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) + 1)))
             AS t(i)
        WHERE t.i = 0 OR t.i * {_STRIDE} < n_words
    )
    SELECT c.doc_id, c.chunk_id, c.word_start,
           CAST(least({_CHUNK}, w.n_words - c.word_start) AS BIGINT)
               AS chunk_words,
           md5(array_to_string(
               w.words[c.word_start + 1 : c.word_start + {_CHUNK}], ' '))
               AS chunk_md5
    FROM chunks c JOIN w ON c.doc_id = w.doc_id
    """,
)
def x23_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x23 — document CHUNKING: split each doc into overlapping word
    windows (200 words, stride 150) — the unit RAG indexes and
    long-document training actually consume. Emits per-chunk offsets,
    lengths, and an md5 of the chunk text (so the oracle hash-checks the
    sliced CONTENT, not just the arithmetic).

    Scale shape: pure per-row expressions, no shuffle at all — split ONCE,
    then slice+hash every window INSIDE a `transform` lambda while the row
    is still one-per-doc, and explode only the reduced (chunk_id, offsets,
    md5) structs via `inline`. The naive alternative (explode chunk ids
    first, slice after) duplicates the full words array once per chunk —
    a ~67× mid-plan memory amplification on a 10k-word doc (VERDICT r3
    item 3); here each exploded row carries ~50 bytes. The overlap factor
    bounds the blowup at ceil(words/stride) rows per doc."""
    docs = load(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n_words") - _CHUNK) / F.lit(float(_STRIDE))).cast(
            "bigint"
        )
        + 1,
    )
    w = docs.select(
        "doc_id", F.split("text", " ").alias("words")
    ).withColumn("n_words", F.size("words").cast("bigint"))
    ids = F.filter(
        F.sequence(F.lit(0).cast("bigint"), n_chunks - 1),
        lambda i: (i == 0) | ((i * _STRIDE) < F.col("n_words")),
    )
    chunks = F.transform(
        ids,
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * _STRIDE).alias("word_start"),
            F.least(F.lit(_CHUNK).cast("bigint"), F.col("n_words") - i * _STRIDE)
            .alias("chunk_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("words"), (i * _STRIDE + 1).cast("int"), _CHUNK
                    ),
                )
            ).alias("chunk_md5"),
        ),
    )
    return w.select("doc_id", F.inline(chunks))


@register(
    "x24_incremental_dedup",
    oracle="""
    WITH history AS (
        SELECT md5(text) AS h FROM documents WHERE doc_id % 10 <> 7
    ),
    batch AS (
        SELECT doc_id, source, md5(text) AS h
        FROM documents WHERE doc_id % 10 = 7
    ),
    batch_first AS (
        SELECT doc_id, source, h FROM (
            SELECT doc_id, source, h,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM batch
        ) WHERE rn = 1
    )
    SELECT b.doc_id, b.source FROM batch_first b
    WHERE NOT EXISTS (SELECT 1 FROM history x WHERE x.h = b.h)
    """,
)
def x24_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x24 — INCREMENTAL dedup: a new ingest batch (the deterministic
    doc_id % 10 == 7 slice standing in for today's crawl) is deduped
    within itself, then anti-joined against the HISTORICAL corpus's
    fingerprint index — the shape every rolling ingestion runs, where
    re-deduplicating 100 TB of history per batch is a non-starter.

    Scale shape: history contributes only its md5 column (32-byte keys,
    in production a maintained fingerprint table); the anti-join shuffles
    fingerprints, never text. Batch-internal dedup is the x1 window."""
    docs = load(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 10 != 7).select(
        F.md5("text").alias("h")
    )
    batch = docs.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    batch_first = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return batch_first.join(history, "h", "left_anti").select(
        "doc_id", "source"
    )


@register(
    "x25_token_budget_selection",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
               round(CAST(length(text) - length(replace(text, ' ', ''))
                     AS DOUBLE) / length(text), 6) AS density
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, est_tokens,
               CAST(COALESCE(sum(est_tokens) OVER (
                   PARTITION BY source
                   ORDER BY density DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tokens_before
        FROM toks
    )
    SELECT doc_id, source, est_tokens, tokens_before
    FROM ranked WHERE tokens_before < 100000
    """,
)
def x25_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x25 — TOKEN-BUDGET corpus selection (data mixing under a budget):
    within each source shard, take documents in quality order (here a
    deterministic space-density score with doc_id tiebreak) until the
    shard's token budget is exhausted — greedy prefix by running token
    sum, the standard way training mixes are cut to size.

    Scale shape (two-phase prefix sum, no per-source single-task sort —
    the e3c banded-rank trick applied to a running SUM): a naive
    `sum OVER (PARTITION BY source ORDER BY ...)` serializes each source
    into ONE window task — and real corpora have a CommonCrawl that dwarfs
    everything. Instead: (1) band rows by a deterministic pure function of
    the leading sort key (density value-range slices from the global
    min/max — a 1-row broadcast); (2) per-(band, source) token sums give
    each band's prefix offset (tiny aggregate, broadcast back); (3) a
    per-(band, source) local running sum + the band offset is the exact
    global prefix — each window task sorts only its band. Bands are
    monotone in (density DESC, doc_id) because banding is a function of
    density alone, so equal densities can never straddle bands."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_tokens"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            ).cast("double")
            / F.length("text"),
            6,
        ).alias("density"),
    )
    slices = 32
    stats = toks.agg(
        F.min("density").alias("_lo"), F.max("density").alias("_hi")
    )
    # Band 0 = densest (matches ORDER BY density DESC); nulls → last band
    # (Spark and DuckDB both default DESC to NULLS LAST).
    band = F.coalesce(
        F.least(
            F.lit(slices - 1),
            F.floor(
                (F.col("_hi") - F.col("density"))
                / ((F.col("_hi") - F.col("_lo") + F.lit(1e-9)) / slices)
            ),
        ),
        F.lit(slices - 1),
    ).cast("int")
    banded = toks.crossJoin(F.broadcast(stats)).withColumn("_band", band)
    # Tiny: per-(band, source) token totals -> cumulative offset per band
    # (the offsets window partitions by source but runs over <= slices rows
    # per source, AFTER the aggregate).
    pc = banded.groupBy("_band", "source").agg(
        F.sum("est_tokens").alias("_tok")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = pc.select(
        "_band",
        "source",
        F.coalesce(F.sum("_tok").over(w_off), F.lit(0)).alias("_off"),
    )
    # Heavy window sorts only its own band of one source.
    w_local = (
        Window.partitionBy("_band", "source")
        .orderBy(F.desc("density"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        banded.withColumn(
            "_lsum", F.coalesce(F.sum("est_tokens").over(w_local), F.lit(0))
        )
        .join(F.broadcast(offsets), ["_band", "source"])
        .select(
            "doc_id",
            "source",
            "est_tokens",
            (F.col("_off") + F.col("_lsum")).cast("bigint").alias(
                "tokens_before"
            ),
        )
    )
    return ranked.filter(F.col("tokens_before") < 100000)
