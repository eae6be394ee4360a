"""Threshold / abstention analysis — distributed re-expression of the
reference's ``scripts/analyze_threshold.py:53-138``.

The reference sweeps ``min_score`` over driver-side (top1_score, is_correct)
records to find precision/coverage/F0.5 trade-offs and recommended
abstention thresholds. Here the same table is computed declaratively:
records × a literal threshold dimension (a broadcast crossJoin — the
threshold list is O(50) rows), then one groupBy. The records table itself
never leaves the executors; only the O(|thresholds|) sweep table does.

Metric FORMULAS preserved exactly (analyze_threshold.py:53-67):

* coverage  = answered / total · 100
* precision = correct_answered / answered · 100 (0 when nothing answered)
* F0.5      = 1.25·P·C / (0.25·P + C) — weights precision 2× over coverage
* a query with no results counts as (score 0.0, incorrect)

Correctness labeling is NOT bit-identical to the reference on score ties:
the reference scores only ``results[0]`` (its in-memory sort order, which
is not reproducible cross-engine), so :func:`search_top1_records` defaults
to tie-as-rank-1 (target anywhere among rank-1 rows counts correct,
evaluate_matching.py:53-61) — on duplicate-heavy corpora this reports
precision ≥ the reference's. Pass ``tie_policy="first"`` for strict
single-row semantics under the engine's deterministic tiebreak
(min company_id among rank-1 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def search_top1_records(
    results: DataFrame,
    queries: DataFrame,
    target_col: str = "target_id",
    query_id: str = "query_id",
    tie_policy: str = "any",
) -> DataFrame:
    """(query_id, top1_score, is_correct) from ``search_topk`` output + a
    labeled query table. Queries with no results at all → (0.0, false)
    (analyze_threshold.py:49-50).

    ``tie_policy="any"`` (default): correct if the target appears among
    rank-1 rows (evaluate_matching.py:53-61). ``"first"``: the reference's
    ``results[0]`` shape — exactly one rank-1 row counts, chosen by the
    engine's deterministic tiebreak (min company_id); see module header.
    """
    if tie_policy not in ("any", "first"):
        raise ValueError(f"unknown tie_policy {tie_policy!r}")
    rank1 = results.where(F.col("rank") == 1)
    if tie_policy == "first":
        rank1 = rank1.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy("company_id")
            ),
        ).where(F.col("_rn") == 1)
    top1 = rank1.groupBy(query_id).agg(
        F.max("score").alias("top1_score"),
        F.collect_set("company_id").alias("_got"),
    )
    return (
        queries.select(query_id, target_col)
        .join(top1, query_id, "left")
        .select(
            query_id,
            F.coalesce(F.col("top1_score"), F.lit(0.0)).alias("top1_score"),
            F.coalesce(
                F.array_contains(F.col("_got"), F.col(target_col)), F.lit(False)
            ).alias("is_correct"),
        )
    )


def threshold_sweep(
    records: DataFrame,
    thresholds: list[float] | None = None,
) -> DataFrame:
    """records(top1_score, is_correct) → one row per threshold:
    (threshold, answered, correct, coverage, precision, f05).

    Percentages rounded to 6dp for cross-engine comparison. The default
    grid is the reference's 0.00..1.00 step 0.02."""
    if thresholds is None:
        thresholds = [round(0.02 * i, 2) for i in range(51)]
    spark = records.sparkSession
    tdf = spark.createDataFrame([(float(t),) for t in thresholds], "threshold double")
    total = records.count()
    if total == 0:
        return tdf.select(
            "threshold",
            F.lit(0).cast("bigint").alias("answered"),
            F.lit(0).cast("bigint").alias("correct"),
            F.lit(0.0).alias("coverage"),
            F.lit(0.0).alias("precision"),
            F.lit(0.0).alias("f05"),
        )
    answered = F.sum(
        F.when(F.col("top1_score") >= F.col("threshold"), 1).otherwise(0)
    ).cast("bigint")
    correct = F.sum(
        F.when(
            (F.col("top1_score") >= F.col("threshold")) & F.col("is_correct"), 1
        ).otherwise(0)
    ).cast("bigint")
    agg = (
        records.crossJoin(F.broadcast(tdf))
        .groupBy("threshold")
        .agg(answered.alias("answered"), correct.alias("correct"))
    )
    cov = F.col("answered").cast("double") / F.lit(float(total)) * 100.0
    prec = F.when(
        F.col("answered") > 0,
        F.col("correct").cast("double") / F.col("answered") * 100.0,
    ).otherwise(0.0)
    agg = agg.withColumn("coverage", F.round(cov, 6)).withColumn(
        "precision", F.round(prec, 6)
    )
    f05 = F.when(
        (F.col("precision") + F.col("coverage")) > 0,
        1.25
        * F.col("precision")
        * F.col("coverage")
        / (0.25 * F.col("precision") + F.col("coverage")),
    ).otherwise(0.0)
    return agg.withColumn("f05", F.round(f05, 6)).orderBy("threshold")


def recommend_thresholds(
    sweep: DataFrame, precision_targets: tuple[float, ...] = (95.0, 98.0, 99.0)
) -> dict:
    """Smallest threshold reaching each precision target + the best-F0.5
    row (analyze_threshold.py:127-140). The sweep table is O(|thresholds|)
    rows — collecting it is bounded."""
    rows = sweep.orderBy("threshold").collect()
    out: dict = {"targets": {}, "best_f05": None}
    for target in precision_targets:
        hit = next((r for r in rows if r["precision"] >= target), None)
        out["targets"][target] = (
            None
            if hit is None
            else {
                "threshold": hit["threshold"],
                "coverage": hit["coverage"],
                "answered": hit["answered"],
            }
        )
    if rows:
        best = max(rows, key=lambda r: r["f05"])
        out["best_f05"] = {
            "threshold": best["threshold"],
            "precision": best["precision"],
            "coverage": best["coverage"],
            "f05": best["f05"],
        }
    return out


def top1_partner_records(
    pairs: DataFrame,
    universe: DataFrame,
    id_col: str,
    score_col: str = "jaccard",
    correct_col: str = "correct",
) -> DataFrame:
    """Adapt a symmetric pair table (left_id, right_id, score, correct)
    into sweep records: every id in ``universe`` becomes a query whose
    top1_score is its best partner's score (0.0 when it has no pairs) and
    whose is_correct is the pair-level ``correct_col`` of that best row.
    Deterministic argmax: score desc, partner id asc. SQL-expressible end
    to end — this is the oracle-backed adapter the driver gate uses."""
    both = pairs.select(
        F.col("left_id").alias("qid"),
        F.col("right_id").alias("pid"),
        F.col(score_col).alias("s"),
        F.col(correct_col).alias("c"),
    ).unionByName(
        pairs.select(
            F.col("right_id").alias("qid"),
            F.col("left_id").alias("pid"),
            F.col(score_col).alias("s"),
            F.col(correct_col).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), F.col("pid").asc())
    best = both.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return (
        universe.select(F.col(id_col).alias("qid"))
        .join(best, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("s"), F.lit(0.0)).alias("top1_score"),
            F.coalesce(F.col("c"), F.lit(False)).alias("is_correct"),
        )
    )
