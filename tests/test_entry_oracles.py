"""Local mirror of the driver's correctness gate: run every entry query in
Spark and its oracle in DuckDB at sf0.001 and demand exact value equality
(the driver hashes values, so approximate equality is not enough).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalization. Width differences inside a type
    class (int32 vs int64) are normalized, but int↔float is NOT coerced —
    the driver's value hash is type-sensitive, so a DuckDB HUGEINT (arriving
    as float64) against a Spark BIGINT must FAIL here like it fails there."""
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, con):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    got_kinds = [d.kind for d in got.dtypes]
    want_kinds = [d.kind for d in want.dtypes]
    assert got_kinds == want_kinds, (
        f"{name}: dtype-class mismatch {list(zip(got.columns, got_kinds, want_kinds))}"
        " — the driver's value hash is type-sensitive (int vs float differs)"
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # materializes without error, stable schema
    assert len(df.columns) > 0


def test_br_lookahead_rule_is_noop_on_oracle_data(con):
    """The DuckDB oracle omits the lookahead 'br ' rule; assert the rule
    cannot fire on this data (no 'br' token followed by a legal-form word)."""
    n = con.sql(
        r"SELECT count(*) FROM part WHERE lower(p_name) SIMILAR TO "
        r"'.*\bbr (co|cty|công|tnhh|cp|chi|cn)\b.*'"
    ).fetchone()[0]
    assert n == 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"p_partkey", "cluster_id", "cluster_size"} == set(df.columns)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_fuzzy_er_oracle_domain_facts(spark, sf_dir):
    """The er_cluster_fuzzy_parts oracle replays normalization with the
    clean_name SQL twin and no alias/entity/repeat modeling — valid only
    while part names (a) pass validation un-filtered, (b) produce
    match_key == cleaned (no MATCH_ALIASES rule fires), and (c) carry no
    entity type. Guard those facts so testdata or rule-table drift fails
    loudly here instead of as a driver hash mismatch."""
    from pyspark.sql import functions as F

    from company_name_matching_spark.operators import normalize

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    names = normalize.normalize_mentions(
        p.select(
            F.col("p_partkey").cast("string").alias("pid"),
            F.col("p_name").alias("nm"),
        ),
        "pid",
        "nm",
    )
    agg = names.agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum(F.when(F.col("match_key") != F.col("cleaned"), 1).otherwise(0)).alias("alias_fired"),
        F.sum(F.when(F.col("entity_type").isNotNull(), 1).otherwise(0)).alias("typed"),
    ).collect()[0]
    assert agg["kept"] == p.count()
    assert agg["alias_fired"] == 0
    assert agg["typed"] == 0
