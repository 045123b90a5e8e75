"""Round-16 A/B harness: candidate rewrites vs the registry forms,
measured INTERLEAVED (guide §1 + the r15 host-noise discipline: only
same-session A/B/A/B best-of-N with the noop sink is trustworthy).

Each candidate is defined here standalone; `python scripts/ab_r16.py
<name> [reps]` first proves result equality (sorted-row comparison at
sf0.1), then interleaves old/new noop-sink runs and prints best/median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_lakes_tp2_student_spark.catalog import REGISTRY  # noqa: E402
from data_lakes_tp2_student_spark.functions.compute import eager  # noqa: E402
from data_lakes_tp2_student_spark.registry import load  # noqa: E402
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------------------------------------------------------- q21
def q21_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE lineitem scan: per-(order, supplier) late-row counts, then a
    per-order window supplies the distinct-supplier and distinct-late-
    supplier counts the EXISTS/NOT EXISTS legs encode."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    commit = F.expr(
        "date_add(CAST(l_shipdate AS DATE), "
        "CAST((l_orderkey*31 + l_linenumber*7) % 30 AS INT))"
    )
    receipt = F.expr(
        "date_add(CAST(l_shipdate AS DATE), "
        "CAST((l_orderkey*17 + l_linenumber*13) % 45 AS INT))"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", (receipt > commit).alias("_late")
    )
    one_exchange = os.environ.get("AB_Q21_ONE_EXCHANGE", "0") == "1"
    if one_exchange:
        li = li.repartition("l_orderkey")
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("_late"), F.lit(1))).alias("_late_rows")
    )
    w = Window.partitionBy("l_orderkey")
    prof = pair.select(
        "l_orderkey",
        "l_suppkey",
        "_late_rows",
        F.count(F.lit(1)).over(w).alias("_n_supp"),
        F.sum((F.col("_late_rows") > 0).cast("int")).over(w).alias("_n_late"),
    )
    qual = prof.filter(
        (F.col("_late_rows") > 0)
        & (F.col("_n_supp") >= 2)
        & (F.col("_n_late") == 1)
    )
    return (
        qual.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.sum("_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------- x16
def x16_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE explode+distinct subtree: docs hash-partitioned by doc_id
    before the explode (Generate preserves partitioning → the dedup is
    exchange-free), persisted once; vocab, both self-join sides and the
    pair aggregation all reuse it."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.repartition("doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .dropDuplicates(["doc_id", "word"])
    )
    if os.environ.get("AB_X16_EAGER", "0") == "1":
        words = eager(words)
    dfreq = words.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.desc("df"), "word").limit(100)
    w = words.join(F.broadcast(vocab), "word")
    wa = w.select("doc_id", F.col("word").alias("w1"), F.col("df").alias("df1"))
    wb = w.select(
        F.col("doc_id").alias("doc_b"),
        F.col("word").alias("w2"),
        F.col("df").alias("df2"),
    )
    pairs = (
        wa.join(wb, (wa.doc_id == wb.doc_b) & (F.col("w1") < F.col("w2")))
        .groupBy("w1", "w2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pairs.crossJoin(n)
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_docs")
                    / (F.col("df1") * F.col("df2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_ab"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------- e3c
def e3c_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band totals ride the SAME tiny window pass as the offsets (two
    frames over one partitionBy) — removes the second banded→pc
    aggregation chain and one broadcast join."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    slices = 32
    stats = o.agg(
        F.min("o_totalprice").alias("_lo"), F.max("o_totalprice").alias("_hi")
    )
    band = F.least(
        F.lit(slices - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("_lo"))
            / ((F.col("_hi") - F.col("_lo") + F.lit(1e-6)) / slices)
        ),
    ).cast("int")
    banded = o.crossJoin(F.broadcast(stats)).withColumn("_band", band)
    pc = banded.groupBy("_band", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_off = (
        Window.partitionBy("o_orderpriority")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("o_orderpriority")
    offsets = pc.select(
        "_band",
        "o_orderpriority",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_tot).alias("_n"),
    )
    w_local = Window.partitionBy("_band", "o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = (
        banded.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["_band", "o_orderpriority"])
        .withColumn("_rn", F.col("_off") + F.col("_lrn"))
    )
    k = 4
    q_sz = F.col("_n") / k
    big = (F.col("_n") % k) * (F.floor(q_sz) + 1)
    quartile = F.when(
        F.col("_rn") <= big, F.ceil(F.col("_rn") / (F.floor(q_sz) + 1))
    ).otherwise(
        (F.col("_n") % k)
        + F.ceil((F.col("_rn") - big) / F.greatest(F.floor(q_sz), F.lit(1)))
    )
    return (
        ranked.withColumn("quartile", quartile.cast("bigint"))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").cast("double").alias("sum_price"),
        )
    )


# ---------------------------------------------------------------- x2b
def x2b_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r16 verify core: NO candidate-id semi cut — the three
    verify consumers (sizes + both intersection sides) read the full
    distinct-shingle table."""
    from data_lakes_tp2_student_spark.catalog.llm_ops import (
        _N_BANDS,
        _N_HASHES,
        _ROWS_PER_BAND,
    )
    from data_lakes_tp2_student_spark.operators.dedup import (
        distinct_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    sh = eager(distinct_shingles(docs, "doc_id", "text"))
    sigs = minhash_signatures(
        docs, "doc_id", "text", num_hashes=_N_HASHES, shingles=sh
    )
    pairs = eager(
        lsh_candidate_pairs(
            sigs, "doc_id", bands=_N_BANDS, rows_per_band=_ROWS_PER_BAND
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "s")
    b = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("_nb"))
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


CANDIDATES = {
    "x6_tpch_q21": q21_new,
    "x16_pmi_cooccurrence": x16_new,
    "e3c_ntile_buckets": e3c_new,
}
# names where CANDIDATES holds the OLD form and the registry the NEW one
INVERTED = {"x2b_jaccard_verify": x2b_old}


def rows_sorted(df: DataFrame):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    if name in INVERTED:
        old_fn, new_fn = INVERTED[name], REGISTRY.get(name).fn
    else:
        old_fn, new_fn = REGISTRY.get(name).fn, CANDIDATES[name]
    spark = get_spark(app_name=f"ab-{name}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # 1. exact result equality at SF_DIR
    a = rows_sorted(old_fn(spark, SF_DIR))
    spark.catalog.clearCache()
    b = rows_sorted(new_fn(spark, SF_DIR))
    spark.catalog.clearCache()
    assert [old_fn(spark, SF_DIR).columns] == [new_fn(spark, SF_DIR).columns]
    if a != b:
        bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
        print(f"MISMATCH rows={len(a)}/{len(b)} first_diffs={bad}")
        for i in bad:
            print("  old:", a[i])
            print("  new:", b[i])
        sys.exit(1)
    print(f"results EQUAL ({len(a)} rows)")

    # 2. interleaved timing, noop sink
    t = {"old": [], "new": []}
    order = (("old", old_fn), ("new", new_fn))
    if os.environ.get("AB_ORDER") == "reverse":
        order = (("new", new_fn), ("old", old_fn))
    for _ in range(reps):
        for tag, fn in order:
            spark.sparkContext.setJobDescription(f"{name}:{tag}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t[tag].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for tag in ("old", "new"):
        xs = sorted(t[tag])
        print(
            f"{tag}: best {xs[0]:.3f}  median {statistics.median(xs):.3f}  "
            f"all {[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
