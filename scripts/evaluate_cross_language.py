"""Cross-language (EN→VI) matching evaluation — distributed twin of the
reference's ``scripts/evaluate_cross_language.py`` protocol (corpus = unique
targets of the golden set, top-5 search, Top-1/3/5 accuracy, per-category
and per-tier breakdown). The golden set itself is locally authored
(``sources/crosslang.py``).

Usage: python scripts/evaluate_cross_language.py [--model fused]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def evaluate(spark, model: str = "fused", k: int = 5,
             use_aliases: bool = False,
             dense_encoder_factory=None) -> dict:
    from pyspark.sql import functions as F

    from company_name_matching_spark.operators.blocking import BlockingConfig
    from company_name_matching_spark.operators.search import SearchConfig, search_topk
    from company_name_matching_spark.sources import crosslang

    corpus, queries = crosslang.corpus_and_queries()
    corpus_df = spark.createDataFrame(corpus, ["company_id", "name"])
    queries_df = spark.createDataFrame(
        [(qid, q) for qid, q, _, _, _ in queries], ["query_id", "query_text"]
    )
    # the token channel is the cross-language recall path: EN queries share
    # brand tokens, not prefixes or char-ngram bands, with the VI corpus form
    cfg = SearchConfig(
        k=k,
        model=model,
        query_aliases=crosslang.EN_VI_ALIASES if use_aliases else (),
        dense_encoder_factory=dense_encoder_factory,
        blocking=BlockingConfig(channels=("prefix", "lsh", "token")),
    )
    out = search_topk(corpus_df, queries_df, cfg)
    got = {
        r["query_id"]: r
        for r in out.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("score"))).alias("top1_score"),
            F.collect_list(F.struct("rank", "company_id")).alias("results"),
        )
        .collect()
    }

    stats: dict = {"by_tier": {}, "by_category": {}, "misses": []}
    for qid, qtext, target_id, cat, tier in queries:
        r = got.get(qid)
        ranks = sorted(
            (res["rank"] for res in (r["results"] if r else [])
             if res["company_id"] == target_id)
        )
        best = ranks[0] if ranks else None
        for scope, key in (("by_tier", tier), ("by_category", cat)):
            d = stats[scope].setdefault(
                key, {"total": 0, "top1": 0, "top3": 0, "top5": 0}
            )
            d["total"] += 1
            if best == 1:
                d["top1"] += 1
            if best is not None and best <= 3:
                d["top3"] += 1
            if best is not None and best <= 5:
                d["top5"] += 1
        if best != 1:
            stats["misses"].append(
                {"tier": tier, "query": qtext, "target_id": target_id,
                 "best_rank": best}
            )
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fused",
                    choices=["fused", "hybrid_bm25", "hybrid_dense"])
    ap.add_argument("--aliases", action="store_true",
                    help="apply EN->VI sector aliases on the query side")
    args = ap.parse_args()

    from company_name_matching_spark.session import get_spark

    spark = get_spark(app_name="crosslang-eval")
    spark.sparkContext.setLogLevel("ERROR")
    stats = evaluate(spark, model=args.model, use_aliases=args.aliases)

    print(f"model: {args.model} aliases: {args.aliases}")
    for scope in ("by_tier", "by_category"):
        print(f"\n{scope}:")
        for key, d in sorted(stats[scope].items()):
            print(f"  {key:>14}: Top-1 {d['top1']}/{d['total']}"
                  f"  Top-3 {d['top3']}/{d['total']}"
                  f"  Top-5 {d['top5']}/{d['total']}")
    if stats["misses"]:
        print("\nmisses (best rank):")
        for m in stats["misses"]:
            print(f"  [{m['tier']}] {m['query']!r} -> rank {m['best_rank']}")
    spark.stop()


if __name__ == "__main__":
    main()
