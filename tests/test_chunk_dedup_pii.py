"""Unit tests for the round-5 operators: CCNet-style corpus-level chunk
deduplication (operators/dedup.chunk_dup_stats / dedup_chunks_keep_first)
and the JVM-only PII redaction chain (functions/pii)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from company_name_matching_spark.functions import pii
from company_name_matching_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# chunk_dup_stats
# ---------------------------------------------------------------------------

def test_chunk_dup_stats_known_values(spark):
    # chunks (3 tokens): doc1 = ["a b c", "d e f"]; doc2 = ["a b c", "x"];
    # doc3 = ["q r s"].  "a b c" occurs twice corpus-wide.
    d = _docs(spark, [
        (1, "a b c d e f"),
        (2, "a b c x"),
        (3, "q r s"),
    ])
    got = {r["doc_id"]: r.asDict()
           for r in dedup.chunk_dup_stats(d, chunk_tokens=3).collect()}
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
    assert got[1]["dup_chunk_ratio"] == 0.5
    assert got[2]["n_chunks"] == 2 and got[2]["n_dup_chunks"] == 1
    assert got[3] == {"doc_id": 3, "n_chunks": 1, "n_dup_chunks": 0,
                      "dup_chunk_ratio": 0.0}


def test_chunk_dup_stats_blank_docs_excluded(spark):
    d = _docs(spark, [(1, ""), (2, "   "), (3, "only real doc")])
    got = dedup.chunk_dup_stats(d).collect()
    assert {r["doc_id"] for r in got} == {3}


def test_chunk_dup_stats_multispace_tokens(spark):
    # double spaces produce empty split tokens which must be removed
    # BEFORE chunking (Python str.split semantics)
    d = _docs(spark, [(1, "a  b   c"), (2, "a b c")])
    got = {r["doc_id"]: r["n_dup_chunks"]
           for r in dedup.chunk_dup_stats(d, chunk_tokens=3).collect()}
    assert got == {1: 1, 2: 1}  # identical chunk "a b c" both sides


# ---------------------------------------------------------------------------
# dedup_chunks_keep_first
# ---------------------------------------------------------------------------

def test_keep_first_semantics(spark):
    d = _docs(spark, [
        (1, "a b c d e f"),   # chunks: "a b c", "d e f"
        (2, "a b c g h i"),   # "a b c" dup (doc1 is first) ; "g h i" new
        (3, "a b c"),         # fully removed
    ])
    got = {r["doc_id"]: r.asDict()
           for r in dedup.dedup_chunks_keep_first(d, chunk_tokens=3).collect()}
    assert got[1]["kept_text"] == "a b c d e f"
    assert got[1]["n_kept"] == 2 and got[1]["n_removed"] == 0
    assert got[2]["kept_text"] == "g h i"
    assert got[2]["n_kept"] == 1 and got[2]["n_removed"] == 1
    assert got[3]["kept_text"] == ""
    assert got[3]["n_kept"] == 0 and got[3]["n_removed"] == 1


def test_keep_first_within_doc_duplicate(spark):
    # the same chunk twice INSIDE one doc: first occurrence (lower
    # chunk_idx) wins, second is removed
    d = _docs(spark, [(1, "a b c a b c")])
    row = dedup.dedup_chunks_keep_first(d, chunk_tokens=3).collect()[0]
    assert row["kept_text"] == "a b c"
    assert row["n_kept"] == 1 and row["n_removed"] == 1


def test_keep_first_preserves_chunk_order(spark):
    d = _docs(spark, [(1, "z z z m m m a a a")])
    row = dedup.dedup_chunks_keep_first(d, chunk_tokens=3).collect()[0]
    assert row["kept_text"] == "z z z m m m a a a"  # original order, not sorted


def test_keep_first_stats_consistent_with_dup_stats(spark):
    d = _docs(spark, [
        (1, "w1 w2 w3 w4 w5 w6 w7"),
        (2, "w1 w2 w3 w4 w5 w6"),
        (3, "unique tokens entirely here now"),
    ])
    stats = dedup.chunk_dup_stats(d, chunk_tokens=3)
    kept = dedup.dedup_chunks_keep_first(d, chunk_tokens=3)
    n_occ = stats.agg(F.sum("n_chunks")).collect()[0][0]
    n_kept = kept.agg(F.sum("n_kept")).collect()[0][0]
    n_rm = kept.agg(F.sum("n_removed")).collect()[0][0]
    assert n_kept + n_rm == n_occ
    # number of kept occurrences == number of DISTINCT chunks corpus-wide
    occ = dedup._chunk_occurrences(d, "doc_id", "text", 3)
    assert n_kept == occ.select("chunk").distinct().count()


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

PII_SAMPLES = [
    ("contact me at bob.smith+x@mail.example.org today",
     "contact me at <EMAIL> today", {"email": 1}),
    ("server at 10.0.255.3 and 192.168.1.1 up",
     "server at <IP> and <IP> up", {"ipv4": 2}),
    ("call 555-867-5309 or 555.867.5309 now",
     "call <PHONE> or <PHONE> now", {"phone": 2}),
    ("ssn 123-45-6789 on file", "ssn <SSN> on file", {"ssn": 1}),
    ("no pii here at all", "no pii here at all", {}),
    # chain order: dotted digit runs resolve as IP, not phone
    ("x 1.23.456.789 y", "x <IP> y", {"ipv4": 1}),
]


@pytest.mark.parametrize("raw,want,counts", PII_SAMPLES)
def test_redact_pii_known_values(spark, raw, want, counts):
    df = spark.createDataFrame([(raw,)], ["t"])
    row = df.select(
        pii.redact_pii(F.col("t")).alias("red"),
        *[pii.pii_count(F.col("t"), n).alias(n)
          for n, _p, _t in pii.PII_PATTERNS],
    ).collect()[0]
    assert row["red"] == want
    for n, _p, _t in pii.PII_PATTERNS:
        assert row[n] == counts.get(n, 0), (n, raw)


def test_redact_pii_duckdb_twin_exact(spark):
    """Spark chain vs DuckDB-generated twin, byte-for-byte, over every
    sample (the cross-engine invariant the oracle gate relies on)."""
    rows = [(i, raw) for i, (raw, _w, _c) in enumerate(PII_SAMPLES)]
    df = spark.createDataFrame(rows, ["i", "contact"])
    got = (df.select("i", pii.redact_pii(F.col("contact")).alias("r"))
           .toPandas().sort_values("i").reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["i", "contact"]))
    want = con.execute(
        f"SELECT i, {pii.oracle_redact_sql('contact')} AS r FROM d ORDER BY i"
    ).fetchdf()
    assert got["r"].tolist() == want["r"].tolist()


def test_pii_counts_decompose_redaction(spark):
    """Counts are measured at each pattern's chain position, so the sum of
    replacements equals the number of tokens in the redacted output."""
    raw = "a@b.co 1.2.3.4 555-123-4567 123-45-6789 and a@b.co"
    df = spark.createDataFrame([(raw,)], ["t"])
    row = df.select(
        pii.redact_pii(F.col("t")).alias("red"),
        pii.pii_counts_struct(F.col("t")).alias("c"),
    ).collect()[0]
    red = row["red"]
    c = row["c"].asDict()
    for name, tok in [("email", "<EMAIL>"), ("ipv4", "<IP>"),
                      ("phone", "<PHONE>"), ("ssn", "<SSN>")]:
        assert red.count(tok) == c[name], (name, red, c)


class TestDecontaminate:
    def _dfs(self, spark):
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                (1, "x y alpha beta gamma z"),      # shares 1 shingle
                (2, "beta gamma delta epsilon q"),  # shares 2 shingles
                (3, "totally clean text here ok"),  # clean
                (4, "alpha beta"),                  # shorter than n -> clean
                (5, "alpha beta gamma alpha beta gamma"),  # dup shingle counted once
            ],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_known_values(self, spark):
        from company_name_matching_spark.operators import dedup

        corpus, bench = self._dfs(spark)
        out = {
            r.doc_id: (r.n_contaminated_shingles, r.contaminated)
            for r in dedup.decontaminate(corpus, bench, n=3).collect()
        }
        assert out == {
            1: (1, 1),
            2: (2, 1),
            3: (0, 0),
            4: (0, 0),
            5: (1, 1),
        }

    def test_partition_invariance(self, spark):
        from company_name_matching_spark.operators import dedup

        corpus, bench = self._dfs(spark)
        a = sorted(map(tuple, dedup.decontaminate(corpus, bench, n=3).collect()))
        b = sorted(
            map(
                tuple,
                dedup.decontaminate(
                    corpus.repartition(5), bench.repartition(3), n=3
                ).collect(),
            )
        )
        assert a == b


class TestC4LineClean:
    def test_rules(self, spark):
        from company_name_matching_spark.functions import textstats

        docs = spark.createDataFrame(
            [
                # 4 good lines + 1 short + 1 unpunctuated + 1 javascript
                (1, "this is a proper sentence one.\n"
                    "this is a proper sentence two!\n"
                    "is this a proper sentence three?\n"
                    'he said "a proper sentence four."\n'
                    "too short.\n"
                    "five tokens but no terminal punctuation here\n"
                    "enable javascript to view this content."),
                # fails the >=3-surviving-lines page rule
                (2, "only one proper sentence survives here.\nshort."),
                # lorem ipsum kills the page even with good lines
                (3, "this is a proper sentence one.\n"
                    "this is a proper sentence two.\n"
                    "this is a proper sentence three.\n"
                    "lorem ipsum dolor sit amet and more."),
                # brace kills the page
                (4, "this is a proper sentence one.\n"
                    "this is a proper sentence two.\n"
                    "window.config = { a: 1 } is code.\n"
                    "this is a proper sentence three."),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in textstats.c4_line_clean(docs).collect()}
        assert out[1].n_lines_kept == 4 and out[1].n_lines_dropped == 3
        assert out[1].page_kept == 1
        assert "javascript" not in out[1].clean_text
        assert out[2].page_kept == 0 and out[2].n_lines_kept == 1
        assert out[3].page_kept == 0  # lorem ipsum page rule
        assert out[4].page_kept == 0  # brace page rule
        # non-destructive: every input doc present
        assert set(out) == {1, 2, 3, 4}

    def test_no_terminal_punct_mode(self, spark):
        from company_name_matching_spark.functions import textstats

        docs = spark.createDataFrame(
            [(1, "five tokens but no terminal punctuation here\n"
                 "another line with enough tokens present\n"
                 "and one more line to clear the page rule")],
            "doc_id long, text string",
        )
        strict = textstats.c4_line_clean(docs).collect()[0]
        loose = textstats.c4_line_clean(
            docs, require_terminal_punct=False
        ).collect()[0]
        assert strict.n_lines_kept == 0 and strict.page_kept == 0
        assert loose.n_lines_kept == 3 and loose.page_kept == 1
