"""Failure categorization for search evaluation — distributed re-expression
of the reference's ``scripts/analyze_errors.py:46-146`` (tag taxonomy) and
``:150-186`` (failure collection under tie-as-rank-1 semantics).

The reference loops queries in the driver and tags each failure with Python
string predicates; here failure collection is a join + window over the
``search_topk`` output and every tag is a JVM column expression, so the
whole analysis is one distributed plan (and the tag logic has an exact
DuckDB twin — see the ``error_tags_parts`` oracle).

Tag parity notes (analyze_errors.py:52-146):

* ``no_accent``     — query survives accent folding unchanged;
* ``all_upper``     — the letters-only projection equals its uppercase
  (reference: ``all(c.isupper())``; identical on cased alphabets, which
  Vietnamese/English are);
* ``all_lower``     — whole query equals its lowercase (reference checks
  the raw string, not letters-only — mirrored);
* ``single_token`` / ``short_query`` (≤3) / ``long_query``;
* ``abbreviated``   — 1 token ≤6 chars vs multi-word target, or ≤half the
  target's words and all-upper;
* ``word_reorder``  — same accent-folded lowercase token SET, different
  string;
* ``no_token_overlap`` / ``low_token_overlap`` (<0.3 raw-token Jaccard);
* ``suppressed``    — no results at all (min_score emptied the list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from company_name_matching_spark.functions.vnnorm import ACCENT_DST, ACCENT_SRC


def _fold(col):
    return F.translate(col, ACCENT_SRC, ACCENT_DST)


def _letters(col):
    return F.regexp_replace(col, r"[^\p{L}]", "")


def _tokset(col):
    """Distinct lowercase whitespace tokens (reference token_overlap).

    Empty tokens are removed: ``F.split`` on a blank/whitespace-only string
    yields ``[""]`` where the reference's Python ``str.split()`` yields
    ``[]`` — without the filter a blank query and blank target would share
    the spurious ``""`` token and suppress ``no_token_overlap``
    (ADVICE r5)."""
    return F.array_remove(
        F.array_distinct(F.split(F.trim(F.lower(col)), r"\s+")), ""
    )


def failure_records(
    results: DataFrame,
    queries: DataFrame,
    query_id: str = "query_id",
    target_col: str = "target_id",
    method_col: str | None = "method",
) -> DataFrame:
    """Labeled queries × search results → per-query outcome records.

    Tie-as-rank-1 (analyze_errors.py:160-166): ``top1_score`` is the score
    of the FIRST result in ENGINE order (the ``rank`` column — promotion
    can put a lower score first, and the reference reads its own
    ``results[0]``), and every result whose score EQUALS it counts as a
    hit — including score-ties the engine happened to rank lower (the
    reference compares raw scores, not rank labels). Adds ``is_top1_hit``,
    ``suppressed`` (no results), ``target_in_topk`` and ``target_rank``
    (position in the returned list under engine order, company_id as the
    deterministic intra-rank tiebreak).
    """
    w = Window.partitionBy(query_id).orderBy(
        F.col("rank").asc(), F.col("company_id").asc()
    )
    ordered = results.withColumn("_pos", F.row_number().over(w))
    # keyed to _pos (row_number in engine order), NOT the literal rank
    # label: a 0-based or post-filtered rank column would otherwise make
    # every query look suppressed while target_in_topk stayed true
    # (r4 review)
    per_q = ordered.groupBy(query_id).agg(
        F.max(F.when(F.col("_pos") == 1, F.col("score"))).alias("top1_score"),
        F.collect_list(F.struct("_pos", "company_id", "score")).alias(
            "_ranked"
        ),
    )
    per_q = per_q.withColumn(
        "_top1_group",
        F.transform(
            F.filter(
                F.col("_ranked"), lambda s: s["score"] == F.col("top1_score")
            ),
            lambda s: s["company_id"],
        ),
    )
    cols = [query_id, target_col] + ([method_col] if method_col else [])
    joined = queries.select(*cols).join(per_q, query_id, "left")
    # F.get, not element_at: ANSI mode (Spark 4 default) makes element_at
    # THROW on an empty array (target absent from the result list)
    target_pos = F.get(
        F.filter(
            F.col("_ranked"), lambda s: s["company_id"] == F.col(target_col)
        ),
        0,
    )["_pos"]
    return (
        joined.withColumn("suppressed", F.col("top1_score").isNull())
        .withColumn(
            "is_top1_hit",
            F.coalesce(
                F.array_contains(F.col("_top1_group"), F.col(target_col)),
                F.lit(False),
            ),
        )
        .withColumn("target_rank", target_pos)
        .withColumn("target_in_topk", F.col("target_rank").isNotNull())
        .withColumn("top1_score", F.coalesce("top1_score", F.lit(0.0)))
        .drop("_top1_group", "_ranked")
    )


def tag_col(query_text, target_name, method=None):
    """array<string> of failure-category tags — all JVM expressions, no UDF
    (analyze_errors.py categorize_query, minus the method tag when
    ``method`` is None)."""
    q = F.trim(query_text)
    letters = _letters(q)
    q_words = F.split(q, r"\s+")
    t_words = F.split(F.trim(target_name), r"\s+")
    all_upper = (letters != "") & (letters == F.upper(letters))
    q_fold = F.lower(_fold(q))
    t_fold = F.lower(_fold(F.trim(target_name)))
    q_set = F.array_sort(F.array_distinct(F.split(q_fold, r"\s+")))
    t_set = F.array_sort(F.array_distinct(F.split(t_fold, r"\s+")))
    qs = _tokset(q)
    ts = _tokset(target_name)
    inter = F.size(F.array_intersect(qs, ts))
    union = F.size(F.array_union(qs, ts))
    overlap = F.when(
        union > 0, inter.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))
    tags = [
        F.when(q == _fold(q), F.lit("no_accent")).otherwise(F.lit("accented")),
        F.when(all_upper, F.lit("all_upper"))
        .when(q == F.lower(q), F.lit("all_lower"))
        .otherwise(F.lit("mixed_case")),
        F.when(F.size(q_words) == 1, F.lit("single_token"))
        .when(F.size(q_words) <= 3, F.lit("short_query"))
        .otherwise(F.lit("long_query")),
        F.when(
            (
                (F.size(q_words) == 1)
                & (F.length(F.element_at(q_words, 1)) <= 6)
                & (F.size(t_words) >= 2)
            )
            | (
                (F.size(q_words) <= F.size(t_words).cast("double") / 2)
                & all_upper
            ),
            F.lit("abbreviated"),
        ),
        F.when((q_set == t_set) & (q_fold != t_fold), F.lit("word_reorder")),
        F.when(overlap == 0.0, F.lit("no_token_overlap")).when(
            overlap < 0.3, F.lit("low_token_overlap")
        ),
    ]
    if method is not None:
        tags.insert(0, F.concat(F.lit("method:"), method))
    return F.filter(F.array(*tags), lambda t: t.isNotNull())


def tag_failures(
    records: DataFrame,
    query_text_col: str = "query_text",
    target_name_col: str = "target_name",
    method_col: str | None = "method",
) -> DataFrame:
    """Failed outcome records (+query/target text) → records with a
    ``tags`` array; ``suppressed`` rides in as its own tag
    (analyze_errors.py:195-196)."""
    method = F.col(method_col) if method_col else None
    tagged = records.withColumn(
        "tags", tag_col(F.col(query_text_col), F.col(target_name_col), method)
    )
    if "suppressed" in records.columns:
        tagged = tagged.withColumn(
            "tags",
            F.when(
                F.col("suppressed"),
                F.concat("tags", F.array(F.lit("suppressed"))),
            ).otherwise(F.col("tags")),
        )
    return tagged


def tag_distribution(tagged: DataFrame) -> DataFrame:
    """tags arrays → (tag, n) counts, descending then lexicographic."""
    return (
        tagged.select(F.explode("tags").alias("tag"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tag")
    )
