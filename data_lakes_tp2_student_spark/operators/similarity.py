"""Vector similarity search (SURVEY.md §2 x3): brute-force cosine top-k as
the exact baseline, and a sign-LSH bucketed variant as the scale path.

Both are pure column expressions over ArrayType(Float) — `zip_with` +
`aggregate` for dot products (JVM-side, codegen) — no UDFs, no collect.

Scale design: brute force is a broadcast of the (small) query set against the
corpus — linear scans parallelize perfectly but cost O(|corpus|·|queries|);
the LSH variant buckets both sides by deterministic random-hyperplane sign
bits and equi-joins on the bucket, pruning the candidate set before the
exact cosine — the standard ANN shape for billion-row corpora. IVF would
swap the bucketer for k-means cells; the join topology is identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import Window

from ..functions.compute import spread


def cosine(a: str | Column, b: str | Column, decimals: int = 7) -> Column:
    """Cosine similarity between two float-array columns, computed in double
    (sequential fold over the list — identical order in any engine)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b

    def dsum(col: Column) -> Column:
        return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)

    dot = dsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))
    na = dsum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    nb = dsum(F.transform(b, lambda x: x.cast("double") * x.cast("double")))
    return F.round(dot / (F.sqrt(na) * F.sqrt(nb)), decimals)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """x3 — exact top-k neighbors per query by cosine. The query side is
    broadcast; ranking is a per-query window (partitions = |queries|)."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = (
        spread(corpus)  # cosine folds run interpreted; parallelize the scan
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(vec_col, "_qvec").alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def hyperplane_coefficients(planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane matrix seeded by md5(plane,dim) —
    reproducible in any engine/language (the oracle embeds the same literals)."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p},{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 1 else -1.0)
        out.append(row)
    return out


def sign_lsh_bucket(
    vec_col: str | Column, coefficients: list[list[float]]
) -> Column:
    """Bit-string bucket id: sign of the projection on each hyperplane."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for row in coefficients:
        coef = F.array(*[F.lit(c) for c in row])
        proj = F.aggregate(
            F.zip_with(vec, coef, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """x3 scale path — approximate top-k: candidates share the sign-LSH
    bucket (equi-join), exact cosine only within the bucket."""
    coefs = hyperplane_coefficients(planes, dim)
    c = spread(corpus).withColumn("_bucket", sign_lsh_bucket(vec_col, coefs))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        sign_lsh_bucket(vec_col, coefs).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(vec_col, "_qvec").alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
