"""Threshold/abstention sweep (reference scripts/analyze_threshold.py)."""

import pytest
from pyspark.sql import functions as F

from company_name_matching_spark.operators import threshold
from company_name_matching_spark.operators.search import SearchConfig, search_topk
from company_name_matching_spark.sources import fixtures


def test_threshold_sweep_known_values(spark):
    """Hand-computed sweep over 4 records — exact metric semantics of
    analyze_threshold.py:53-67."""
    recs = spark.createDataFrame(
        [("a", 0.95, True), ("b", 0.85, True), ("c", 0.80, False), ("d", 0.0, False)],
        "qid string, top1_score double, is_correct boolean",
    )
    rows = {r["threshold"]: r for r in
            threshold.threshold_sweep(recs, [0.0, 0.9, 1.0]).collect()}
    # t=0.0: all 4 answered, 2 correct
    assert rows[0.0]["answered"] == 4 and rows[0.0]["correct"] == 2
    assert rows[0.0]["coverage"] == 100.0 and rows[0.0]["precision"] == 50.0
    f05 = 1.25 * 50.0 * 100.0 / (0.25 * 50.0 + 100.0)
    assert rows[0.0]["f05"] == pytest.approx(f05, abs=1e-6)
    # t=0.9: only 'a' answered, precision 100, coverage 25
    assert rows[0.9]["answered"] == 1 and rows[0.9]["precision"] == 100.0
    assert rows[0.9]["coverage"] == 25.0
    # t=1.0: nothing answered → precision 0 (reference convention)
    assert rows[1.0]["answered"] == 0 and rows[1.0]["precision"] == 0.0
    assert rows[1.0]["f05"] == 0.0


def test_threshold_sweep_on_labeled_search(spark):
    """End-to-end: sweep the real search scores over labeled queries; at
    some threshold precision must reach >=99 with nonzero coverage, and
    recommend_thresholds must surface it."""
    comps = fixtures.base_companies(40)
    corpus = spark.createDataFrame(comps, "company_id string, name string")
    q = fixtures.labeled_queries(comps, per_company=2)
    queries = spark.createDataFrame(
        q, "query_id string, query_text string, target_id string, method string"
    )
    res = search_topk(corpus, queries, SearchConfig(k=3))
    recs = threshold.search_top1_records(res, queries)
    assert recs.count() == queries.count()
    sweep = threshold.threshold_sweep(recs)
    assert sweep.count() == 51
    rec = threshold.recommend_thresholds(sweep)
    t99 = rec["targets"][99.0]
    assert t99 is not None and t99["coverage"] > 0
    assert rec["best_f05"]["f05"] > 0
    # coverage is monotone non-increasing in threshold
    covs = [r["coverage"] for r in sweep.orderBy("threshold").collect()]
    assert all(a >= b for a, b in zip(covs, covs[1:]))


def test_top1_partner_records(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9, True), (1, 3, 0.95, False)],
        "left_id long, right_id long, jaccard double, correct boolean",
    )
    uni = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    recs = {r["qid"]: r for r in threshold.top1_partner_records(
        pairs, uni, "id").collect()}
    # qid 1: best partner is 3 (0.95) → incorrect
    assert recs[1]["top1_score"] == 0.95 and recs[1]["is_correct"] is False
    # qid 2 best (only) partner is 1 at 0.9 → correct
    assert recs[2]["top1_score"] == 0.9 and recs[2]["is_correct"] is True
    # qid 4 has no pairs → (0.0, False)
    assert recs[4]["top1_score"] == 0.0 and recs[4]["is_correct"] is False


def test_top1_records_tie_policy_first(spark):
    """tie_policy='first' scores exactly one rank-1 row (the reference's
    results[0] shape, deterministic min-company_id tiebreak); 'any' counts
    the target anywhere in the tied group."""
    results = spark.createDataFrame(
        [
            ("Q1", "B", 0.9, 1),  # tie at rank 1: B and C
            ("Q1", "C", 0.9, 1),
            ("Q2", "A", 0.8, 1),
        ],
        "query_id string, company_id string, score double, rank int",
    )
    queries = spark.createDataFrame(
        [("Q1", "C"), ("Q2", "A")], "query_id string, target_id string"
    )
    any_rows = {
        r["query_id"]: r["is_correct"]
        for r in threshold.search_top1_records(results, queries).collect()
    }
    first_rows = {
        r["query_id"]: r["is_correct"]
        for r in threshold.search_top1_records(
            results, queries, tie_policy="first"
        ).collect()
    }
    assert any_rows == {"Q1": True, "Q2": True}
    assert first_rows == {"Q1": False, "Q2": True}  # B < C wins the tie
    import pytest as _pytest

    with _pytest.raises(ValueError):
        threshold.search_top1_records(results, queries, tie_policy="weird")
