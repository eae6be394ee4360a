"""Match-quality gates — the reference's alerting surface
(``utils/metrics.py:154-183`` + the avg-score/confidence metrics around it)
computed as ONE distributed aggregation, no driver-side loops.

Usage: ``alerts = check_quality_alerts(match_quality_metrics(matches),
{"avg_score": 0.85, "high_confidence_rate": 0.7})`` after the scoring
stage; a non-empty list fails the pipeline's quality gate (L3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIGH_CONFIDENCE = 0.90  # stage4_match.py:122


def match_quality_metrics(matches: DataFrame,
                          score_col: str = "score") -> dict[str, float | None]:
    """One agg pass: avg_score, match_rate, high_confidence_rate, n_pairs."""
    row = matches.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg(score_col).alias("avg_score"),
        F.avg(F.col("is_match").cast("double")).alias("match_rate"),
        F.avg((F.col(score_col) >= HIGH_CONFIDENCE).cast("double")).alias(
            "high_confidence_rate"
        ),
    ).collect()[0]
    d = row.asDict()
    return {k: (float(v) if v is not None else None) for k, v in d.items()}


def check_quality_alerts(metrics: dict, thresholds: dict[str, float]) -> list[str]:
    """Alert for every metric below its threshold (generalizes the
    reference's two hard-coded checks, ``metrics.py:154-183``)."""
    alerts = []
    for key, floor in thresholds.items():
        val = metrics.get(key)
        if val is not None and val < floor:
            alerts.append(f"ALERT: {key} ({val:.4f}) below threshold ({floor:.4f})")
    return alerts
