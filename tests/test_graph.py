"""Unit tests for operators/graph.py (deterministic PageRank rounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from company_name_matching_spark.operators import graph


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_hand_computed_one_round(spark):
    # a -> b, a -> c, b -> c : N=3, start 1/3 (rounded 12dp)
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = _ranks(graph.pagerank(e, iterations=1, damping=0.85))
    r0 = round(1.0 / 3, 12)
    tp = (1.0 - 0.85) / 3
    assert got["a"] == round(tp, 12)  # no in-edges: teleport only
    assert got["b"] == round(tp + 0.85 * round(r0 / 2, 12), 12)
    assert got["c"] == round(
        tp + 0.85 * float(round(r0 / 2, 12) + round(r0 / 1, 12)), 12
    )


def test_pagerank_sink_accumulates_over_rounds(spark):
    # star into a sink: the sink's rank strictly grows, sources decay
    e = spark.createDataFrame(
        [(f"u{i}", "hub") for i in range(5)], "src string, dst string"
    )
    r1 = _ranks(graph.pagerank(e, iterations=1))
    r3 = _ranks(graph.pagerank(e, iterations=3))
    assert r1["hub"] > r1["u0"]
    # after round 1 the sources hold steady at teleport
    assert r3["u0"] == r1["u0"]
    # dangling mass is dropped (documented): hub keeps only teleport
    # inflow after its sources decayed to teleport
    assert r3["hub"] < r1["hub"]


def test_pagerank_partition_invariant_and_deterministic(spark):
    import random

    rng = random.Random(3)
    edges = [(f"n{rng.randint(0, 40)}", f"n{rng.randint(0, 40)}")
             for _ in range(300)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = _ranks(graph.pagerank(df.repartition(1), iterations=3))
    b = _ranks(graph.pagerank(df.repartition(17), iterations=3))
    assert a == b  # bit-identical despite different physical plans


def test_pagerank_rank_mass_bounded(spark):
    # without dangling redistribution total mass is <= 1 and >= teleport*N
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
    )
    out = graph.pagerank(e, iterations=4)
    total = out.agg(F.sum("rank")).first()[0]
    assert 0.15 <= total <= 1.0 + 1e-9


def test_pagerank_validates_iterations(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        graph.pagerank(e, iterations=0)
