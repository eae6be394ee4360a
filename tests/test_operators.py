"""Operator-level Spark tests: normalize, blocking, clustering."""

from pyspark.sql import functions as F

from company_name_matching_spark.operators import blocking, clustering, normalize
from company_name_matching_spark.sources import fixtures


def _names(spark, n=60, per=4):
    pages = fixtures.pages_dataframe(spark, n_companies=n, per_company=per)
    return pages, normalize.normalize_pages(pages)


def test_normalize_schema_and_filters(spark):
    pages, names = _names(spark, 40, 3)
    cols = set(names.columns)
    assert {"record_id", "url", "name", "cleaned", "norm_key", "match_key",
            "tokens", "entity_type", "has_repeat"} <= cols
    assert names.where(F.col("match_key") == "").count() == 0
    # record_id deterministic: re-run produces identical ids
    names2 = normalize.normalize_pages(pages)
    assert (
        names.select("record_id").exceptAll(names2.select("record_id")).count() == 0
    )


def test_normalize_entity_type_native_matches_pandas(spark):
    """JVM-native entity-type extraction must equal the vectorized kernel."""
    import pandas as pd

    from company_name_matching_spark.functions import vnnorm

    _, names = _names(spark, 60, 2)
    rows = names.select("match_key", "entity_type").collect()
    got = [r["entity_type"] for r in rows]
    want = vnnorm.extract_entity_type(pd.Series([r["match_key"] for r in rows])).tolist()
    assert got == [w if w is not None else None for w in want]


def test_dedup_exact_keeps_longest(spark):
    import datetime as dt

    # u1/u2 share a norm_key (differ only in case/diacritics/padding);
    # norm_key deliberately keeps special chars (reference-UDF parity), so
    # punctuation differences would be different keys.
    rows = [
        ("u1", dt.datetime(2026, 1, 1), b"x", "CÔNG TY TNHH SỮA VIỆT NAM  ", "vi", "e", "k"),
        ("u2", dt.datetime(2026, 1, 1), b"x", "cong ty tnhh sua viet nam", "vi", "e", "k"),
        ("u3", dt.datetime(2026, 1, 1), b"x", "CP KHÁC BIỆT", "vi", "e", "k"),
    ]
    pages = spark.createDataFrame(rows, fixtures.PAGES_SCHEMA)
    names = normalize.normalize_pages(pages)
    out = normalize.dedup_exact(names, keep="longest")
    grp = {r["norm_key"]: r for r in out.collect()}
    dup = [r for r in grp.values() if r["duplicate_group_size"] == 2]
    assert len(dup) == 1 and dup[0]["is_duplicate"]
    assert len(dup[0]["name"]) == max(len(rows[0][3]), len(rows[1][3]))


def test_group_original_names_salted_cap_deterministic(spark):
    """A hot group bigger than the cap: the salted two-phase aggregation
    must return exactly the lexicographically smallest `cap` names (i.e.
    equal a global sort+slice), independent of partitioning."""
    rows = [("k", f"name{i:03d}") for i in range(250)] + [("k2", "solo")]
    df = spark.createDataFrame(rows, "norm_key string, name string")
    for parts in (1, 7):
        out = {
            r["norm_key"]: r["original_names"]
            for r in normalize.group_original_names(
                df.repartition(parts), cap=100
            ).collect()
        }
        assert out["k"] == sorted(f"name{i:03d}" for i in range(250))[:100]
        assert out["k2"] == ["solo"]


def test_dedup_exact_collect_names(spark):
    import datetime as dt

    rows = [
        ("u1", dt.datetime(2026, 1, 1), b"x", "CÔNG TY TNHH SỮA VIỆT NAM  ", "vi", "e", "k"),
        ("u2", dt.datetime(2026, 1, 1), b"x", "cong ty tnhh sua viet nam", "vi", "e", "k"),
        ("u3", dt.datetime(2026, 1, 1), b"x", "CP KHÁC BIỆT", "vi", "e", "k"),
    ]
    names = normalize.normalize_pages(
        spark.createDataFrame(rows, fixtures.PAGES_SCHEMA)
    )
    out = normalize.dedup_exact(names, keep="longest", collect_names=10)
    dup = [r for r in out.collect() if r["is_duplicate"]]
    assert len(dup) == 1
    assert dup[0]["original_names"] == sorted([rows[0][3], rows[1][3]])


def test_blocking_variants_share_block(spark):
    _, names = _names(spark, 30, 4)
    blocks = blocking.generate_blocks(names)
    # every record has a prefix block + 4 LSH bands
    per_rec = blocks.groupBy("record_id").count().agg(F.min("count")).collect()[0][0]
    assert per_rec >= 1
    # records of the same entity share ≥1 block key (prefix key equality)
    pages = fixtures.pages_dataframe(spark, n_companies=30, per_company=4)
    ids = names.join(pages.select("url", "entity_id"), "url").select(
        "record_id", "entity_id"
    )
    pairs = blocking.candidate_pairs(names)
    truth_pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.entity_id") == F.col("b.entity_id"))
        .where(F.col("a.record_id") < F.col("b.record_id"))
        .select(
            F.col("a.record_id").alias("left_id"), F.col("b.record_id").alias("right_id")
        )
    )
    missed = truth_pairs.join(pairs, ["left_id", "right_id"], "left_anti").count()
    total = truth_pairs.count()
    assert total > 0
    # blocking recall ≥ 99% of true pairs (north-star requirement)
    assert missed / total < 0.01, f"blocking missed {missed}/{total} true pairs"


def test_hot_block_cap_drops_oversized(spark):
    _, names = _names(spark, 40, 3)
    cfg = blocking.BlockingConfig(max_block_size=2)
    blocks = blocking.filter_blocks(blocking.generate_blocks(names, cfg), cfg)
    sizes = blocks.groupBy("block_key").count()
    assert sizes.agg(F.max("count")).collect()[0][0] <= 2


def test_minhash_deterministic(spark):
    df = spark.createDataFrame(
        [("a", "tnhh son ha viet"), ("b", "tnhh son ha viet")], "record_id string, match_key string"
    ).withColumn("tokens", F.split("match_key", " "))
    cfg = blocking.BlockingConfig()
    sig = df.select(
        "record_id", blocking.minhash_signature_col(F.col("match_key"), cfg).alias("sig")
    ).collect()
    assert sig[0]["sig"] == sig[1]["sig"]
    assert len(sig[0]["sig"]) == cfg.minhash_bands * cfg.minhash_rows


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, singleton 99 absent from edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    labels, rounds = clustering.connected_components(edges)
    got = {r["record_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    assert rounds <= 5


def test_connected_components_star_and_cycle(spark):
    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)], "src long, dst long"
    )
    labels, _ = clustering.connected_components(edges)
    got = {r["record_id"]: r["cluster_id"] for r in labels.collect()}
    assert got[5] == got[1] == got[2] == got[3] == 1
    assert got[7] == got[8] == got[9] == 7


def test_candidate_pairs_equals_naive_self_join(spark):
    """The fused collect_set pair expansion (blocking.candidate_pairs) must
    emit EXACTLY the pairs of the textbook blocked self-join over the same
    filtered blocks — on a corpus with cross-channel overlap (pairs found by
    both prefix and LSH band must appear once) and a hot-cap boundary."""
    from company_name_matching_spark.operators import blocking, normalize

    rows = []
    # 30 near-duplicate variants of one name (well under the hot cap) +
    # distinct names sharing tokens, + unrelated singletons
    for i in range(30):
        rows.append((f"u{i}", f"cong ty tnhh son ha {i % 3}"))
    for i in range(10):
        rows.append((f"v{i}", f"thuong mai dich vu hoa binh {i}"))
    rows += [("w1", "doc nhat vo nhi"), ("w2", "khong giong ai ca")]
    pages = spark.createDataFrame(rows, "pid string, text string")
    names = normalize.normalize_mentions(pages, "pid", "text")
    cfg = blocking.BlockingConfig()

    got = {
        (r["left_id"], r["right_id"])
        for r in blocking.candidate_pairs(names, cfg).collect()
    }
    blocks = blocking.filter_blocks(blocking.generate_blocks(names, cfg), cfg)
    l, r = blocks.alias("l"), blocks.alias("r")
    naive = {
        (row["left_id"], row["right_id"])
        for row in (
            l.join(r, "block_key")
            .where(F.col("l.record_id") < F.col("r.record_id"))
            .select(
                F.col("l.record_id").alias("left_id"),
                F.col("r.record_id").alias("right_id"),
            )
            .dropDuplicates(["left_id", "right_id"])
            .collect()
        )
    }
    assert got == naive and len(got) > 0, f"sym diff: {got ^ naive}"


def test_generate_blocks_rejects_unknown_channels(spark):
    """A typo'd channel name must fail loudly, not silently lose recall."""
    import pytest as _pytest

    from company_name_matching_spark.operators import blocking, normalize

    names = normalize.normalize_mentions(
        spark.createDataFrame([("u1", "cong ty tnhh abc")], "pid string, text string"),
        "pid", "text",
    )
    with _pytest.raises(ValueError, match="tokens"):
        blocking.generate_blocks(
            names, blocking.BlockingConfig(channels=("prefix", "lsh", "tokens"))
        )
    with _pytest.raises(ValueError):
        blocking.generate_blocks(names, blocking.BlockingConfig(channels=()))
