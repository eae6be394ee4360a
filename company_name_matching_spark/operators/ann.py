"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — exact cosine top-k via a blocked cross join +
  window; the correctness baseline. Queries are expected to be a small
  subset (broadcast side); corpus side streams. O(|Q|·N) — fine when |Q|
  is bounded, unusable for all-pairs at scale.
* ``lsh_topk`` — random-hyperplane (sign) LSH: vectors bucketed by the bit
  pattern of sign(v·h_i); candidates share ≥1 of ``n_tables`` bucket keys;
  exact cosine re-rank inside buckets. Sub-quadratic scale path; recall
  controlled by (n_planes, n_tables).

All dot products are JVM-native (``zip_with`` + ``aggregate`` in double
precision) — no Python in the scoring loop.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from company_name_matching_spark.operators.dedup import cosine_col


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).

    Returns (query_id, neighbor_id, cosine, rank). The ORDER uses the
    rounded score + neighbor id so ranking is reproducible across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_v")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_v")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("q_v"), F.col("c_v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _bucket_col(vec_col, planes: list[list[float]], table_idx: int):
    """Sign-bit bucket key of one LSH table — JVM-native dot products."""
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(F.lit(f"t{table_idx}:"), *bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates must share an LSH bucket in
    ≥1 table; exact cosine re-rank within candidates."""
    tables = _hyperplanes(dim, n_planes, n_tables, seed)

    def bucketize(df, idc, vc, out_id, out_v):
        keys = F.array(
            *[_bucket_col(F.col(vc), tables[t], t) for t in range(n_tables)]
        )
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vc).alias(out_v),
            F.explode(keys).alias("bucket"),
        )

    qb = bucketize(queries, id_col, vec_col, "query_id", "q_v")
    cb = bucketize(corpus, id_col, vec_col, "neighbor_id", "c_v")
    cand = (
        qb.join(cb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cosine_col(F.col("q_v"), F.col("c_v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
