"""Threshold/abstention sweep report — distributed twin of the reference's
``scripts/analyze_threshold.py`` (precision/coverage/F0.5 per min_score,
recommended thresholds for 95/98/99% precision targets, best-F0.5 pick).

Runs ``search_topk`` over the reference's real 4,019-name corpus when
available (same protocol as eval_reference_corpus), else over the labeled
synthetic fixtures. All scoring is distributed; only the O(51)-row sweep
table is collected.

Usage: python scripts/analyze_threshold.py [--max-queries 400] [--model fused]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def build_records(spark, max_queries: int, model: str):
    from pyspark.sql import functions as F

    import eval_reference_corpus as ev
    from company_name_matching_spark.operators import threshold
    from company_name_matching_spark.operators.search import SearchConfig, search_topk
    from company_name_matching_spark.sources import fixtures

    cfg = SearchConfig(k=3, model=model)
    if ev.reference_available():
        corpus = ev.load_corpus()
        qs = ev.generate_queries(corpus, max_queries=max_queries)
        corp_name = dict(corpus)
        corpus_df = spark.createDataFrame(corpus, ["company_id", "name"])
        queries_df = spark.createDataFrame(
            [(qid, text, tgt) for qid, text, tgt in qs],
            ["query_id", "query_text", "target_id"],
        )
        src = f"reference corpus ({len(corpus)} names)"
    else:
        comps = fixtures.base_companies(200)
        corpus_df = spark.createDataFrame(comps, "company_id string, name string")
        q = fixtures.labeled_queries(comps, per_company=3)
        queries_df = spark.createDataFrame(
            q, "query_id string, query_text string, target_id string, method string"
        ).limit(max_queries)
        src = "synthetic fixtures (200 companies)"
    res = search_topk(corpus_df, queries_df, cfg)
    return threshold.search_top1_records(res, queries_df), src


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-queries", type=int, default=400)
    ap.add_argument("--model", default="fused", choices=["fused", "hybrid_bm25"])
    args = ap.parse_args()

    from company_name_matching_spark.operators import threshold
    from company_name_matching_spark.session import get_spark

    spark = get_spark(app_name="threshold-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    records, src = build_records(spark, args.max_queries, args.model)
    sweep = threshold.threshold_sweep(records)
    rows = sweep.orderBy("threshold").collect()
    total = records.count()

    print(f"source: {src}  model: {args.model}  queries: {total}")
    print(f"{'thr':>6} {'coverage':>9} {'precision':>10} {'correct':>8} "
          f"{'answered':>9} {'F0.5':>8}")
    for r in rows:
        print(f"{r['threshold']:>6.2f} {r['coverage']:>8.1f}% "
              f"{r['precision']:>9.1f}% {r['correct']:>8} "
              f"{r['answered']:>9} {r['f05']:>8.2f}")

    rec = threshold.recommend_thresholds(sweep)
    for target, hit in rec["targets"].items():
        if hit is None:
            print(f">= {target:.0f}% precision: not achievable")
        else:
            print(f">= {target:.0f}% precision: threshold={hit['threshold']:.2f} "
                  f"coverage={hit['coverage']:.1f}% "
                  f"({hit['answered']}/{total} answered)")
    b = rec["best_f05"]
    print(f"best F0.5: threshold={b['threshold']:.2f} "
          f"precision={b['precision']:.1f}% coverage={b['coverage']:.1f}% "
          f"F0.5={b['f05']:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
