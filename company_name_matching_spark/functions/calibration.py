"""Score calibration helpers (SURVEY §2 F11).

The reference squashes raw cross-encoder logits through a sigmoid before
fusing them with lexical scores (``src/matcher.py`` rerank path). Here the
same calibration is a pure JVM column expression — no UDF — so it stays
inside whole-stage codegen and composes with any scoring column
(:mod:`..operators.scoring` fusion, the cross-encoder seam in
:mod:`..operators.encode`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sigmoid(col: Column) -> Column:
    """1 / (1 + e^-x) as a JVM expression (codegen-friendly)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def scaled_sigmoid(col: Column, center: float, scale: float) -> Column:
    """Sigmoid with an affine input transform — maps an unbounded score to
    (0, 1) with the steepest slope at ``center``."""
    return sigmoid((col - F.lit(float(center))) / F.lit(float(scale)))
