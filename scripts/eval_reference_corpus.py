"""Accuracy evaluation on the reference's REAL corpus.

Reproduces the reference's published evaluation protocol
(``scripts/evaluate_matching.py:39-93`` + ``scripts/generate_eval_dataset.py``)
head-to-head against this engine's distributed ``search_topk``:

* corpus     — ``data/sample_system_names.txt`` (4,019 real Vietnamese
               organisation names), ids ``CORP_{idx:04d}``;
* queries    — combinatorial type-variant substitutions from the LOCAL
               reimplementation of the reference's generator
               (``functions/variants.py`` — parity-tested against the
               reference's ``CombinatorialGenerator``; nothing from the
               untrusted reference tree executes here, per ADVICE r2).
               Variants are sorted per name (the reference materialises
               ``list(set(...))``, which is hash-order nondeterministic)
               and a fixed-seed sample is drawn, mirroring
               ``MAX_QUERIES=1000`` / ``random.seed(42)``;
* metrics    — Top-1 with tie-as-rank-1 semantics
               (``evaluate_matching.py:53-61``): every result tied at the
               top-1 score counts as rank 1, which is how the reference
               handles near-duplicate corpus entries sharing a normalised
               form. Top-3 = target anywhere in the returned top-5 groups
               (``evaluate_matching.py:63-65``).

Published reference numbers (docs/evaluation.md:64-66): Top-1 99.82% /
Top-3 99.99% at corpus 1,000 × 50,000 queries; 99.71%/99.98% at 5,000.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")
NAMES_FILE = REFERENCE_ROOT / "data" / "sample_system_names.txt"


def reference_available() -> bool:
    return NAMES_FILE.exists()


def load_corpus(limit: int | None = None) -> list[tuple[str, str]]:
    """[(corp_id, name)] in file order, ids as the reference assigns them."""
    names = [
        line.strip()
        for line in NAMES_FILE.read_text(encoding="utf-8").splitlines()
        if line.strip()
    ]
    if limit:
        names = names[:limit]
    return [(f"CORP_{i:04d}", n) for i, n in enumerate(names)]


def generate_queries(
    corpus: list[tuple[str, str]], max_queries: int = 1000, seed: int = 42
) -> list[tuple[str, str, str]]:
    """[(query_id, query_text, target_corp_id)] via the local
    reimplementation of the reference's combinatorial generator,
    deterministically sampled."""
    from company_name_matching_spark.functions.variants import type_variants

    all_q: list[tuple[str, str]] = []
    for corp_id, name in corpus:
        # sorted(): set order is hash-seed dependent; sorting makes OUR
        # sample reproducible
        for v in sorted(type_variants(name)):
            if v:
                all_q.append((v, corp_id))
    rng = random.Random(seed)
    if len(all_q) > max_queries:
        all_q = rng.sample(all_q, max_queries)
    return [(f"Q_{i:05d}", text, tgt) for i, (text, tgt) in enumerate(all_q)]


def evaluate(spark, corpus_limit: int | None = None, max_queries: int = 1000):
    """Run search_topk over the real corpus; return metrics dict."""
    from pyspark.sql import functions as F

    from company_name_matching_spark.operators.search import (
        SearchConfig,
        search_topk,
    )

    corpus = load_corpus(corpus_limit)
    queries = generate_queries(corpus, max_queries=max_queries)
    corp_name = dict(corpus)

    corpus_df = spark.createDataFrame(corpus, ["company_id", "name"])
    queries_df = spark.createDataFrame(
        [(qid, text) for qid, text, _ in queries], ["query_id", "query_text"]
    )
    out = search_topk(corpus_df, queries_df, SearchConfig(k=5))
    rows = (
        out.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("score"))).alias("top1_score"),
            F.collect_list(F.struct("score", "company_name")).alias("results"),
        )
        .collect()
    )
    by_qid = {r["query_id"]: r for r in rows}

    hits1 = hits3 = 0
    misses: list[dict] = []
    for qid, text, tgt in queries:
        target_name = corp_name[tgt]
        r = by_qid.get(qid)
        if r is None:
            misses.append({"query": text, "target": target_name, "got": None})
            continue
        top1_group = {
            res["company_name"]
            for res in r["results"]
            if res["score"] == r["top1_score"]
        }
        if target_name in top1_group:
            hits1 += 1
        else:
            misses.append(
                {"query": text, "target": target_name, "got": sorted(top1_group)[:3]}
            )
        if any(res["company_name"] == target_name for res in r["results"]):
            hits3 += 1
    n = len(queries)
    return {
        "corpus_size": len(corpus),
        "n_queries": n,
        "top1": hits1 / n,
        "top3": hits3 / n,
        "misses": misses,
    }


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from company_name_matching_spark.session import get_spark

    spark = get_spark(app_name="ref-corpus-eval")
    m = evaluate(spark)
    print(
        f"corpus={m['corpus_size']} queries={m['n_queries']} "
        f"Top-1={m['top1']:.4%} Top-3={m['top3']:.4%} "
        f"(reference publishes 99.82%/99.99% at corpus 1k)"
    )
    for miss in m["misses"][:10]:
        print(f"  MISS: {miss['query']!r} -> wanted {miss['target']!r}, got {miss['got']}")
    spark.stop()
