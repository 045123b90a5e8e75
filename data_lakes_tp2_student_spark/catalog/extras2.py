"""Second coverage sweep: stateful streaming (i6), JSON/ORC sources (a-group
format coverage), unpivot, and explode-based term frequency (j3 analog)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import load, register
from ..streaming.jobs import read_events_stream, _run_to_memory
from ..streaming.stateful import running_totals_per_user

_TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
    "ingest",
)


@register(
    "i6_stateful_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 6) AS total
    FROM events GROUP BY user_id
    """,
)
def i6_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i6 — applyInPandasWithState per-user running totals; with the whole
    file in one micro-batch the emitted state equals the batch aggregation,
    so the plain grouped SQL is the oracle."""
    ev = read_events_stream(spark, sf_dir)
    out = _run_to_memory(running_totals_per_user(ev), "update")
    return out.select("user_id", "n", F.round("total", 6).alias("total"))


@register(
    "a12_csv_malformed",
    oracle="""
    -- fixture rule: 100 rows, every 10th malformed (extra column);
    -- PERMISSIVE capture must keep 90 parsed rows + 10 corrupt records
    SELECT CAST(90 AS BIGINT) AS n_good,
           CAST(10 AS BIGINT) AS n_corrupt,
           CAST((SELECT sum(r.range * 3) FROM range(100) r
                 WHERE r.range % 10 <> 0) AS BIGINT) AS sum_value_good
    """,
)
def a12_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a-group robustness — MALFORMED-row CSV ingest: real lakes always
    contain broken rows, and a reader that crashes (or silently drops)
    loses data unaccountably. PERMISSIVE mode with a corrupt-record column
    keeps every byte: parse failures land as nulls + the raw line in
    `_corrupt_record`, so bad rows are countable, quarantinable, and
    re-parsable. The fixture writes 100 rows with every 10th malformed
    (extra column); the oracle predicts good/corrupt counts and the
    good-row sum arithmetically.

    Scale: mode/columnNameOfCorruptRecord are per-task reader options —
    the quarantine pattern costs nothing extra at any scale, unlike a
    separate validation pass."""
    from pyspark.sql import types as T

    path = f"{_TMP}/a12_malformed.csv"
    os.makedirs(_TMP, exist_ok=True)
    with open(path, "w") as fh:
        for i in range(100):
            if i % 10 == 0:
                fh.write(f"{i},{i * 3},name_{i},EXTRA_FIELD,boom\n")
            else:
                fh.write(f"{i},{i * 3},name_{i}\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("value", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    ).cache()  # SPARK-21610: corrupt-record queries need the full row read
    good = F.col("_corrupt_record").isNull()
    return df.agg(
        F.count(F.when(good, 1)).alias("n_good"),
        F.count(F.when(~good, 1)).alias("n_corrupt"),
        F.sum(F.when(good, F.col("value"))).cast("bigint").alias(
            "sum_value_good"
        ),
    )


@register(
    "i9_stream_lake_sink",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY day
    """,
)
def i9_stream_lake_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i9 — the PRODUCTION streaming sink path, end-to-end and
    oracle-checked (VERDICT r3 item 5): the events stream drains through
    `foreachBatch` + dynamic partition overwrite into a day-partitioned
    parquet lake (no driver-side memory sink anywhere), then the lake is
    read BACK from disk and aggregated per day. A hash match proves the
    whole write path — micro-batch delivery, partition-level idempotent
    upsert, partition-typed read-back — preserves every row exactly once.

    Scale: the memory-sink i-series oracles materialize results on the
    driver (fine for a check, wrong story at 100 TB); this one never does —
    data flows executor → partitioned files → executor.

    The sink is a keyed merge (dedup on event_id); the oracle's plain
    GROUP BY matches because the driver fixture keeps event_id unique —
    if a future fixture adds duplicate ids the oracle must switch to a
    one-row-per-id form."""
    import hashlib
    import shutil

    from ..streaming.jobs import stream_upsert_partitions

    dest = os.path.join(
        _TMP, "i9_lake_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    # Fresh lake per run: a leftover dest from an older fixture generation
    # would MERGE into the result and silently diverge from the oracle
    # (same stale-fixture hazard as a10).
    shutil.rmtree(dest, ignore_errors=True)
    stream_upsert_partitions(spark, sf_dir, dest)
    from ..io.manifest import ManifestTable

    back = ManifestTable(dest).read(spark)
    from ..functions.money import dec2

    return back.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("value")).cast("double").alias("sum_value"),
    )


@register("a8_json_roundtrip", oracle="SELECT * FROM nation")
def a8_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a-group format coverage — JSON lines sink + schema-imposed source."""
    from .ingest import NATION_SCHEMA

    path = f"{_TMP}/a8_nation_json"
    load(spark, sf_dir, "nation").write.mode("overwrite").json(path)
    return spark.read.schema(NATION_SCHEMA).json(path)


@register("a9_orc_roundtrip", oracle="SELECT * FROM nation")
def a9_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a-group format coverage — ORC sink + source (columnar alternative;
    pushdown/pruning apply as with parquet)."""
    path = f"{_TMP}/a9_nation_orc"
    load(spark, sf_dir, "nation").write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@register(
    "a10_binaryfile_media_scan",
    oracle="""
    SELECT CAST(t.range AS BIGINT) AS doc_id,
           true AS valid,
           CAST(t.range % 16 + 1 AS BIGINT) AS width,
           CAST(t.range % 12 + 1 AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp,
           CAST(54 + ((24 * (t.range % 16 + 1) + 31) // 32) * 4
                    * (t.range % 12 + 1) AS BIGINT) AS n_bytes,
           CAST((t.range * 7) % 256 AS BIGINT) AS px0,
           CAST(54 + ((24 * (t.range % 16 + 1) + 31) // 32) * 4
                    * (t.range % 12 + 1) AS BIGINT) AS file_length
    FROM range(25) t
    """,
)
def a10_binaryfile_media_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a-group source coverage — the `binaryFile` source, how raw media
    lands in a lake: loose image files on disk → (path, length, content)
    rows → real BMP parse. Fixture: 25 deterministic .bmp files (one per
    nation key, written with plain Python — file arrival is outside any
    engine); the operator under test is the glob-filtered binaryFile scan +
    `parse_bmp`, with the file's id recovered from its path. The oracle
    predicts every parsed field AND the source's length column from the id.

    Scale: binaryFile splits by file (maxPartitionBytes applies per file);
    a 100 TB media lake reads exactly this way, with pathGlobFilter pruning
    non-media objects before any bytes move."""
    from ..operators.multimodal import bmp_bytes, parse_bmp

    path = f"{_TMP}/a10_media"
    os.makedirs(path, exist_ok=True)
    # Always rewrite (files are tiny): an if-exists skip would let stale
    # fixtures from an older bmp_bytes version, or a crashed partial write,
    # silently diverge from the oracle.
    for i in range(25):
        f = os.path.join(path, f"doc_{i}.bmp")
        with open(f, "wb") as fh:
            fh.write(bmp_bytes(i))
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(path)
    )
    media = raw.select(
        F.regexp_extract("path", r"doc_(\d+)\.bmp$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content").alias("media"),
        F.col("length").alias("file_length"),
    )
    return parse_bmp(media.select("doc_id", "media")).join(
        media.select("doc_id", "file_length"), "doc_id"
    )


@register(
    "a11_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(NULL AS BIGINT) AS batch_tag
    FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(n_nationkey * 10 AS BIGINT) AS batch_tag
    FROM nation
    """,
)
def a11_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a-group source coverage — schema evolution across ingest batches:
    an older parquet batch lacks a column a newer batch added; a
    mergeSchema multi-path read reconciles them (missing column → NULL for
    the old rows), the way a lake table grows columns without rewriting
    history. The reconciled dtype is pinned BIGINT on both sides.

    Scale: mergeSchema's cost is footer-only (one scan of file schemas,
    not data); per-file column absence is handled by the reader, so old
    batches are never rewritten — the property that matters when 'old'
    is 99 % of 100 TB."""
    base = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    p = f"{_TMP}/a11_evo"
    base.write.mode("overwrite").parquet(f"{p}/v1")
    base.withColumn(
        "batch_tag", (F.col("n_nationkey") * 10).cast("bigint")
    ).write.mode("overwrite").parquet(f"{p}/v2")
    return spark.read.option("mergeSchema", "true").parquet(
        f"{p}/v1", f"{p}/v2"
    )


@register(
    "x6_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric,
           CAST(c_nationkey AS DOUBLE) AS val FROM customer
    """,
)
def x6_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — unpivot via stack() (wide → long; the inverse of x6_pivot)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, "
            "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
        ),
    )


@register(
    "h5_math_functions",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           abs(p_size - 25) AS size_dist,
           round(power(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
           round(sqrt(CAST(p_size AS DOUBLE)), 6) AS size_sqrt,
           CAST(p_size % 7 AS INT) AS size_mod
    FROM part
    """,
)
def h5_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 — math scalar set: round/abs/pow/sqrt/mod (all codegen'd)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.pow(F.col("p_size").cast("double"), 2.0), 6).alias("size_sq"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
    )


@register(
    "x4_term_frequency",
    oracle="""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    SELECT word, count(*) AS tf FROM w
    GROUP BY word ORDER BY tf DESC, word LIMIT 20
    """,
)
def x4_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x4/j3 — corpus term frequency: explode (the UDTF analog) + hash agg +
    deterministic top-k."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), "word")
        .limit(20)
    )


@register(
    "i13_stream_cdc_merge",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 1
                THEN CAST(o_totalprice * 1.1 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % 7 <> 2
    UNION ALL
    SELECT -o_orderkey, 0, 'N', o_totalprice, TIMESTAMP '1995-01-01', '5-LOW'
    FROM orders WHERE o_orderkey % 1000 = 5
    """,
)
def i13_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i13 — streaming CDC apply into the manifest table (round 8): a
    three-batch change feed (updates for keys %7==1 repriced +10%,
    deletes for keys %7==2, inserts of synthetic negative-key orders)
    drains through `streaming.jobs.stream_cdc_merge`, each micro-batch
    landing as ONE atomic clause-level MERGE commit (file-selective
    copy-on-write; `io/manifest.py:MergeBuilder`). The answer is the
    final committed table read BACK from disk, so the hash match proves
    the full chain: file-source micro-batch delivery → per-batch MERGE
    routing by op → snapshot commit → read-back. Batch key sets are
    disjoint, so arrival order cannot change the result — the property
    that makes the feed safe under the file source's mtime ordering.

    Scale: this is the Debezium→lakehouse ingestion shape — per batch
    cost is O(changed keys' files), commits are atomic per batch, and
    redelivery converges (tests/test_stream_cdc.py replays the feed)."""
    import hashlib
    import shutil

    from ..io.manifest import ManifestTable
    from ..streaming.jobs import stream_cdc_merge

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    dest = os.path.join(_TMP, f"i13_lake_{tag}")
    stage = os.path.join(_TMP, f"i13_cdc_{tag}")
    shutil.rmtree(dest, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)

    orders = load(spark, sf_dir, "orders")
    table = ManifestTable(dest)
    table.commit_overwrite(orders)

    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 1)
        .withColumn("o_totalprice", (F.col("o_totalprice") * 1.1).cast("double"))
        .withColumn("op", F.lit("U"))
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 7 == 2)
        .withColumn("op", F.lit("D"))
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 1000 == 5)
        .select(
            (-F.col("o_orderkey")).alias("o_orderkey"),
            F.lit(0).cast("long").alias("o_custkey"),
            F.lit("N").alias("o_orderstatus"),
            F.col("o_totalprice"),
            F.lit("1995-01-01").cast("timestamp").alias("o_orderdate"),
            F.lit("5-LOW").alias("o_orderpriority"),
            F.lit("I").alias("op"),
        )
    )
    cdc_schema = updates.schema
    for i, batch in enumerate([updates, deletes, inserts]):
        batch.coalesce(1).write.mode("append").parquet(stage)

    stream_cdc_merge(spark, table, stage, cdc_schema, "o_orderkey")
    return table.read(spark)


@register("i14_stream_lake_source", oracle="SELECT * FROM orders")
def i14_stream_lake_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i14 — the manifest table as a streaming SOURCE (round 8, the
    readStream half of the lakehouse contract; i9/i13 are the write
    half): orders lands in the table as an initial snapshot plus two
    append commits, and `spark.readStream.format("manifest_stream")`
    (streaming/source.py — Spark 4 Python Data Source API, offsets =
    commit versions) drains it into a memory sink. The hash match vs
    plain orders proves the source delivered every committed row exactly
    once across the initial-load batch and the incremental append
    batches — the subscribe-to-the-table form that replaces the
    reference's re-read-the-bucket polling (build/unpack_to_raw.py:57).

    Scale shape: offset resolution is O(Δ versions) driver-side JSON;
    each data file is one input partition read as Arrow batches
    executor-side — file-per-task parallelism, no driver materialization."""
    import hashlib
    import shutil

    from ..io.manifest import ManifestTable
    from ..streaming.source import ManifestStreamDataSource

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    dest = os.path.join(_TMP, f"i14_lake_{tag}")
    shutil.rmtree(dest, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    table = ManifestTable(dest)
    table.commit_overwrite(orders.filter(F.col("o_orderkey") % 3 == 0))
    table.commit_append(orders.filter(F.col("o_orderkey") % 3 == 1))
    table.commit_append(orders.filter(F.col("o_orderkey") % 3 == 2))

    spark.dataSource.register(ManifestStreamDataSource)
    name = f"i14_sink_{tag}"
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", dest)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register("i15_stream_lake_sink", oracle="SELECT * FROM orders")
def i15_stream_lake_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i15 — the manifest table as a streaming SINK through the official
    Data Source API (io/datasource.py:ManifestStreamWriter; i14 is the
    source half — this query chains BOTH): orders lands in a source
    table as v0 + two appends, `spark.readStream.format(
    "manifest_stream")` drains it, and `writeStream.format("manifest")`
    publishes each micro-batch as ONE atomic conflict-checked commit
    into a second manifest table, with `txnAppId` recording Delta's txn
    action per batch (a restarted stream skips any batchId the log
    already holds — exactly-once over at-least-once redelivery). The
    hash match vs plain orders proves the full loop — source offsets,
    executor-staged Arrow writes, per-epoch atomic publish — loses and
    invents nothing.

    Scale shape: data never funnels through the driver (executors stage
    parquet per task, only O(files) entries ride the commit messages);
    each epoch is one O(Δfiles) log publish; readers and the downstream
    manifest_stream source see exactly one version per batch."""
    import hashlib
    import shutil

    from ..io.datasource import ManifestDataSource
    from ..io.manifest import ManifestTable
    from ..streaming.source import ManifestStreamDataSource

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    src_root = os.path.join(_TMP, f"i15_src_{tag}")
    sink_root = os.path.join(_TMP, f"i15_sink_{tag}")
    ck = os.path.join(_TMP, f"i15_ck_{tag}")
    for d in (src_root, sink_root, ck):
        shutil.rmtree(d, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    src = ManifestTable(src_root)
    src.commit_overwrite(orders.filter(F.col("o_orderkey") % 3 == 0))
    src.commit_append(orders.filter(F.col("o_orderkey") % 3 == 1))

    spark.dataSource.register(ManifestStreamDataSource)
    spark.dataSource.register(ManifestDataSource)
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", src_root)
        .load()
        .writeStream.format("manifest")
        .option("path", sink_root)
        .option("txnAppId", f"i15_{tag}")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # a commit landing while the stream runs arrives as its own epoch
        src.commit_append(orders.filter(F.col("o_orderkey") % 3 == 2))
        q.processAllAvailable()
    finally:
        q.stop()
    return ManifestTable(sink_root).read(spark)
