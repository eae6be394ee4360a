"""Dense-encode seam: distributed plumbing with the deterministic stand-in
encoder, composed into the V8/V9 rerank operators (the reference's dense
channel shape, matcher.py:267-331 + 428-475)."""

from pyspark.sql import functions as F

from company_name_matching_spark.operators import encode, rank


def test_encode_texts_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "son ha viet nam"), (2, "viet nam son ha"), (3, "hoan toan khac xyz")],
        "record_id long, name string",
    )
    v1 = {r["record_id"]: r["embedding"] for r in encode.encode_texts(df).collect()}
    v2 = {r["record_id"]: r["embedding"] for r in encode.encode_texts(df).collect()}
    assert v1 == v2  # deterministic across runs
    assert len(v1[1]) == 64
    # permutation invariance (mean-pooled-embedding property)
    assert v1[1] == v1[2]


def test_dense_pair_scores_and_union_rerank(spark):
    corpus = spark.createDataFrame(
        [("c1", "cong ty son ha"), ("c2", "son ha viet nam"), ("c3", "khac biet")],
        "candidate_id string, name string",
    )
    queries = spark.createDataFrame(
        [("q1", "son ha viet nam")], "query_id string, query_text string"
    )
    pairs = queries.crossJoin(corpus.select("candidate_id"))
    dense = encode.dense_pair_scores(queries, corpus, pairs)
    scores = {r["candidate_id"]: r["score"] for r in dense.collect()}
    assert scores["c2"] == 1.0  # identical token set
    assert scores["c2"] > scores["c1"] > scores["c3"]

    # stage1: pretend lexical scores mis-rank; dense stage2 fixes the order
    stage1 = spark.createDataFrame(
        [("q1", "c1", 0.9), ("q1", "c2", 0.8), ("q1", "c3", 0.7)],
        "query_id string, candidate_id string, score double",
    )
    out = rank.union_rerank(stage1, dense, rerank_n=2)
    top = out.orderBy(F.col("rerank_score").desc()).first()
    assert top["candidate_id"] == "c2"


def test_cross_encoder_scores_known_values(spark):
    """V11 seam: joint pair scorer, executor-side factory, sigmoid-calibrated
    logits. Stand-in logit = 4*J(tokens)-2 → identical texts sigmoid(2),
    disjoint sigmoid(-2), half-overlap J=1/3 → sigmoid(-2/3)."""
    import math

    pairs = spark.createDataFrame(
        [
            ("q1", "c1", "son ha viet nam", "son ha viet nam"),
            ("q1", "c2", "son ha viet nam", "khac biet hoan toan"),
            ("q1", "c3", "son ha", "son khac"),
        ],
        "query_id string, candidate_id string, query_text string, name string",
    )
    got = {
        r["candidate_id"]: r["score"]
        for r in encode.cross_encoder_scores(pairs).collect()
    }
    sig = lambda x: 1.0 / (1.0 + math.exp(-x))
    assert got["c1"] == round(sig(2.0), 6)
    assert got["c2"] == round(sig(-2.0), 6)
    assert got["c3"] == round(sig(4.0 / 3.0 - 2.0), 6)


def test_cross_encoder_composes_with_union_rerank(spark):
    """The seam slots into the V9 union-rerank exactly like the dense
    channel: rerank a lexical shortlist by cross-encoder score."""
    shortlist = spark.createDataFrame(
        [
            ("q1", "c1", "son ha viet nam", "son ha viet nam", 0.9),
            ("q1", "c2", "son ha viet nam", "son ha", 0.8),
        ],
        "query_id string, candidate_id string, query_text string, name string, lex double",
    )
    ce = encode.cross_encoder_scores(shortlist)
    fused = (
        shortlist.select("query_id", "candidate_id", "lex")
        .join(ce, ["query_id", "candidate_id"])
        .withColumn("final", F.col("lex") * 0.5 + F.col("score") * 0.5)
        .orderBy(F.desc("final"))
        .collect()
    )
    assert fused[0]["candidate_id"] == "c1"  # exact pair outranks partial
