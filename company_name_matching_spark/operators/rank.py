"""Rank fusion and rerank strategies over per-query candidate rankings.

Distributed, window-based re-expressions of the reference's fusion suite
(all driver-side NumPy there):

* :func:`rrf_fuse`          — Reciprocal Rank Fusion (``matcher.py:41-55``,
  k=60): per-retriever ``row_number`` windows → join → Σ 1/(k+rank).
* :func:`weighted_fuse`     — linear score fusion (``matcher.py:370-376``),
  plain column arithmetic.
* :func:`adaptive_rerank`   — rerank only when the top1-top2 gap is below a
  threshold (``matcher.py:477-509``): ``lead(score)`` gap test gates a
  second-stage score, per query, with zero driver involvement.
* :func:`tfidf_rerank`      — V8 two-stage (``matcher.py:428-447``): stage-1
  top-N shortlist per query, final order by the stage-2 score.
* :func:`union_rerank`      — V9 (``matcher.py:449-475``): union of BOTH
  stages' top-N shortlists, final order by the stage-2 score.
* :func:`topk`              — windowed top-k with deterministic tiebreak
  (the reference's driver-side argsort, ``matcher.py:597``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk(
    scored: DataFrame, k: int, query_col: str = "query_id",
    score_col: str = "score", tiebreak_col: str = "candidate_id",
) -> DataFrame:
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: dict[str, DataFrame], k: int = 60,
    query_col: str = "query_id", cand_col: str = "candidate_id",
    score_col: str = "score",
) -> DataFrame:
    """RRF over N retrievers: each DataFrame is (query, candidate, score).

    Returns (query, candidate, rrf_score). Candidates missing from one
    retriever simply contribute nothing for it (same as the reference, which
    ranks the full corpus per retriever — here absent = beyond cutoff).
    """
    fused = None
    for name, df in rankings.items():
        w = Window.partitionBy(query_col).orderBy(
            F.col(score_col).desc(), F.col(cand_col).asc()
        )
        contrib = df.select(
            query_col, cand_col,
            (1.0 / (k + F.row_number().over(w))).alias(f"_c_{name}"),
        )
        fused = contrib if fused is None else fused.join(
            contrib, [query_col, cand_col], "full_outer"
        )
    parts = [c for c in fused.columns if c.startswith("_c_")]
    total = None
    for c in parts:
        t = F.coalesce(F.col(c), F.lit(0.0))
        total = t if total is None else total + t
    return fused.select(
        query_col, cand_col, F.round(total, 6).alias("rrf_score")
    )


def weighted_fuse(df: DataFrame, weights: dict[str, float],
                  out_col: str = "fused") -> DataFrame:
    expr = None
    for col, w in weights.items():
        t = F.lit(w) * F.col(col)
        expr = t if expr is None else expr + t
    return df.withColumn(out_col, expr)


def tfidf_rerank(
    stage1: DataFrame, stage2: DataFrame, rerank_n: int = 50,
    query_col: str = "query_id", cand_col: str = "candidate_id",
    score_col: str = "score",
) -> DataFrame:
    """V8 two-stage rerank (``matcher.py:428-447``): the cheap stage-1
    retriever shortlists its top ``rerank_n`` candidates per query; the
    final score is the best stage-2 score per shortlisted candidate
    (candidates the second stage never scored get 0.0, as the reference's
    ``np.zeros`` baseline does). Both inputs are (query, candidate, score);
    output is (query, candidate, rerank_score)."""
    shortlist = topk(stage1, rerank_n, query_col, score_col, cand_col).select(
        query_col, cand_col
    )
    best2 = stage2.groupBy(query_col, cand_col).agg(
        F.max(score_col).alias("_s2")
    )
    return shortlist.join(best2, [query_col, cand_col], "left").select(
        query_col, cand_col,
        F.round(F.coalesce(F.col("_s2"), F.lit(0.0)), 6).alias("rerank_score"),
    )


def union_rerank(
    stage1: DataFrame, stage2: DataFrame, rerank_n: int = 50,
    query_col: str = "query_id", cand_col: str = "candidate_id",
    score_col: str = "score",
) -> DataFrame:
    """V9 union rerank (``matcher.py:449-475``): shortlist = union of the
    two retrievers' per-query top-N (dropDuplicates), final score = best
    stage-2 score over the union."""
    s1 = topk(stage1, rerank_n, query_col, score_col, cand_col).select(
        query_col, cand_col
    )
    s2 = topk(stage2, rerank_n, query_col, score_col, cand_col).select(
        query_col, cand_col
    )
    union = s1.unionByName(s2).dropDuplicates([query_col, cand_col])
    best2 = stage2.groupBy(query_col, cand_col).agg(
        F.max(score_col).alias("_s2")
    )
    return union.join(best2, [query_col, cand_col], "left").select(
        query_col, cand_col,
        F.round(F.coalesce(F.col("_s2"), F.lit(0.0)), 6).alias("rerank_score"),
    )


def adaptive_rerank(
    scored: DataFrame, second_score_col: str, gap_threshold: float = 0.05,
    query_col: str = "query_id", cand_col: str = "candidate_id",
    score_col: str = "score",
) -> DataFrame:
    """Per query: if gap(top1, top2) < threshold, final ranking uses the
    second-stage score; otherwise the first stage stands. Adds
    ``final_score`` and ``used_rerank`` columns (reference semantics of
    ``matcher.py:477-509`` — the expensive path engaged only on ambiguity)."""
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(cand_col).asc()
    )
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    gaps = (
        ranked.where(F.col("_rn") <= 2)
        .groupBy(query_col)
        .agg(
            (F.max(score_col) - F.min(score_col)).alias("_gap"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            query_col,
            ((F.col("_n") > 1) & (F.col("_gap") < gap_threshold)).alias("used_rerank"),
        )
    )
    return (
        ranked.join(gaps, query_col)
        .withColumn(
            "final_score",
            F.when(F.col("used_rerank"), F.col(second_score_col)).otherwise(
                F.col(score_col)
            ),
        )
        .drop("_rn")
    )
