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

    Scale shape: pure per-row expressions — split once, sequence+explode
    the chunk starts, slice+hash each window; fully data-parallel with no
    shuffle at all. The overlap factor bounds the blowup at
    ceil(words/stride) rows per doc."""
    docs = load(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n_words") - _CHUNK) / F.lit(float(_STRIDE))).cast(
            "bigint"
        )
        + 1,
    )
    w = docs.select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    )
    exploded = (
        w.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("bigint"))
        .withColumn("word_start", (F.col("chunk_id") * _STRIDE).cast("bigint"))
        .filter(
            (F.col("chunk_id") == 0) | (F.col("word_start") < F.col("n_words"))
        )
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        "word_start",
        F.least(F.lit(_CHUNK), F.col("n_words") - F.col("word_start"))
        .cast("bigint")
        .alias("chunk_words"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("words"), (F.col("word_start") + 1).cast("int"), _CHUNK
                ),
            )
        ).alias("chunk_md5"),
    )


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

    Scale shape: one hash exchange by source feeds the ordering window;
    the running sum is a prefix aggregate, and the budget predicate prunes
    before anything else moves. Budgets per shard keep every partition's
    sort local to its source."""
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
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("density"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = toks.select(
        "doc_id",
        "source",
        "est_tokens",
        F.coalesce(F.sum("est_tokens").over(w), F.lit(0))
        .cast("bigint")
        .alias("tokens_before"),
    )
    return ranked.filter(F.col("tokens_before") < 100000)
