"""Failure analysis over the reference-corpus evaluation protocol — the
distributed twin of the reference's ``scripts/analyze_errors.py`` report
(tag distribution, per-method error rates, score stats for misses), built
on ``operators/erroranalysis.py``.

Corpus + queries come from ``eval_reference_corpus`` (the reference's own
protocol); failure collection and every category tag run as one
distributed plan — no driver-side loop over queries.

Usage: python scripts/analyze_errors.py [--corpus-limit 1000]
       [--max-queries 1000] [--min-score 0.0]
Falls back to the synthetic fixture corpus when the reference corpus file
is absent (this script never executes reference code either way).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def build_eval_frames(spark, corpus_limit, max_queries):
    import eval_reference_corpus as ref

    if ref.reference_available():
        corpus = ref.load_corpus(corpus_limit)
        queries = [
            (qid, text, tgt, "combinatorial")
            for qid, text, tgt in ref.generate_queries(
                corpus, max_queries=max_queries
            )
        ]
    else:
        from company_name_matching_spark.sources import fixtures

        corpus = fixtures.base_companies(corpus_limit or 200)
        queries = fixtures.labeled_queries(corpus, per_company=3)
    corpus_df = spark.createDataFrame(corpus, ["company_id", "name"])
    queries_df = spark.createDataFrame(
        queries, ["query_id", "query_text", "target_id", "method"]
    )
    return corpus_df, queries_df


def analyze(spark, corpus_limit=1000, max_queries=1000, min_score=0.0, k=5):
    from pyspark.sql import functions as F

    from company_name_matching_spark.operators import erroranalysis
    from company_name_matching_spark.operators.search import (
        SearchConfig,
        search_topk,
    )

    corpus_df, queries_df = build_eval_frames(spark, corpus_limit, max_queries)
    res = search_topk(
        corpus_df, queries_df, SearchConfig(k=k, min_score=min_score)
    )
    recs = erroranalysis.failure_records(res, queries_df)
    qmeta = queries_df.select("query_id", "query_text", "method").join(
        queries_df.select(
            "query_id", F.col("target_id").alias("_tid")
        ).join(
            corpus_df.select(
                F.col("company_id").alias("_tid"),
                F.col("name").alias("target_name"),
            ),
            "_tid",
        ).select("query_id", "target_name"),
        "query_id",
    )
    fails = recs.where(~F.col("is_top1_hit")).drop("method").join(
        qmeta, "query_id"
    )
    tagged = erroranalysis.tag_failures(fails)

    totals = recs.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("is_top1_hit"), 1).otherwise(0)).alias("hits"),
    ).collect()[0]
    per_method = (
        recs.groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(~F.col("is_top1_hit"), 1).otherwise(0)).alias("nf"),
        )
        .collect()
    )
    dist = erroranalysis.tag_distribution(tagged).collect()
    # Single aggregation job; avg/percentile over an empty frame return
    # nulls, checked on the one collected row (no separate count() guard —
    # that doubled the scan on large failure sets).
    score_stats = (
        fails.where(~F.col("suppressed"))
        .agg(
            F.round(F.avg("top1_score"), 4).alias("avg"),
            F.round(F.expr("percentile(top1_score, 0.5)"), 4).alias("p50"),
        )
        .collect()[0]
    )
    if score_stats["avg"] is None:
        score_stats = None
    examples = [
        r.asDict()
        for r in fails.select(
            "query_text", "target_name", "method", "top1_score",
            "target_rank", "suppressed",
        )
        .orderBy("query_id")
        .limit(8)
        .collect()
    ]
    return {
        "total": totals["total"],
        "failures": totals["total"] - totals["hits"],
        "top1": totals["hits"] / totals["total"] if totals["total"] else 0.0,
        "method_error_rate": {
            r["method"]: (r["nf"] / r["n"], r["nf"]) for r in per_method
        },
        "tags": [(r["tag"], r["n"]) for r in dist],
        "fail_score_stats": dict(score_stats.asDict()) if score_stats else None,
        "examples": examples,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-limit", type=int, default=1000)
    ap.add_argument("--max-queries", type=int, default=1000)
    ap.add_argument("--min-score", type=float, default=0.0)
    args = ap.parse_args()

    from company_name_matching_spark.session import get_spark

    spark = get_spark(app_name="error-analysis")
    spark.sparkContext.setLogLevel("ERROR")
    s = analyze(
        spark,
        corpus_limit=args.corpus_limit,
        max_queries=args.max_queries,
        min_score=args.min_score,
    )
    print("=" * 66)
    print(
        f"ERROR ANALYSIS ({s['total']} queries, {s['failures']} failures, "
        f"Top-1 {s['top1'] * 100:.2f}%)"
    )
    print("=" * 66)
    print("\nerror rate by query method:")
    for m, (rate, nf) in sorted(
        s["method_error_rate"].items(), key=lambda x: -x[1][0]
    ):
        print(f"  {m:>16}: {rate * 100:5.1f}%  (failed {nf})")
    print("\nfailure tags:")
    for tag, n in s["tags"]:
        print(f"  {tag:>24}: {n}")
    if s["fail_score_stats"]:
        print(f"\nfailed-query top1 scores: {s['fail_score_stats']}")
    if s["examples"]:
        print("\nexamples:")
        for ex in s["examples"]:
            print(f"  {ex}")
    spark.stop()


if __name__ == "__main__":
    main()
