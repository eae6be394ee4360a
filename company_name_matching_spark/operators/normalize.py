"""Stage N — pages → normalized name mentions.

Input: the Common-Crawl-shaped ``pages`` table
(``url, warc_ts, html, text, lang`` per BASELINE.json input_hint).
Output: ``names(record_id, url, name, cleaned, norm_key, tokens,
entity_type, has_repeat)``.

Design notes (Spark-first):

* One Arrow pandas UDF produces the two derived strings in a single pass
  (shape of the reference's ``preprocess_batch_udf``,
  ``vietnamese_udfs.py:55-108``, but fully vectorized — no row loop).
* Everything downstream of the strings is JVM-native: tokenization
  (``split``), entity-type extraction (ordered ``array_contains`` coalesce,
  parity with ``matcher.py:15-23``), repeated-token detection (``rlike`` with
  backreferences, parity with ``matcher.py:26-38``), validation filters
  (parity with ``utils/validation.py:40-84``).
* ``record_id = xxhash64(url)`` — deterministic across runs, unlike the
  reference's ``monotonically_increasing_id`` (``stage2_deduplicate.py:87``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from company_name_matching_spark.functions import vnnorm

_NORM_SCHEMA = StructType(
    [
        StructField("cleaned", StringType(), False),
        StructField("norm_key", StringType(), False),
        StructField("match_key", StringType(), False),
    ]
)


@F.pandas_udf(_NORM_SCHEMA)
def _normalize_udf(text: pd.Series) -> pd.DataFrame:
    # one 53-rule canonical pass shared by both outputs (the former
    # clean_name + norm_key calls each re-ran the full chain)
    cleaned, nkey = vnnorm.clean_name_and_norm_key(text)
    return pd.DataFrame(
        {
            "cleaned": cleaned,
            "norm_key": nkey,
            # match_key re-applies only the alias layer on the cleaned string
            "match_key": vnnorm._apply_rules(cleaned, vnnorm.MATCH_ALIASES)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip(),
        }
    )


@F.pandas_udf(StringType())
def clean_name_udf(s: pd.Series) -> pd.Series:
    """Standalone vectorized clean_company_name UDF (SURVEY.md F5/U1)."""
    return vnnorm.clean_name(s)


@F.pandas_udf(ArrayType(StringType()))
def dual_variants_udf(s: pd.Series) -> pd.Series:
    """F7 parity (``vietnamese_udfs.py:111-148``): per name, the two search
    variants ``[cleaned, accent-folded-raw]`` as one array-returning
    vectorized UDF (SURVEY U3) — callers ``explode`` it into variant rows,
    the reference's dual-variant indexing flow."""
    cleaned = vnnorm.clean_name(s)
    folded = (
        vnnorm.fold_accents(vnnorm.nfc_lower(s))
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )
    return pd.Series([[a, b] for a, b in zip(cleaned, folded)])


# Whole-token regexes (Java regex supports backreferences + lookarounds).
_REPEAT_UNIGRAM = r"(?<!\S)(\S{2,})\s+\1(?!\S)"
_REPEAT_BIGRAM = r"(?<!\S)(\S+)\s+(\S+)\s+\1\s+\2(?!\S)"


def entity_type_col(tokens_col):
    """First entity-type token present, in specificity order (JVM-native)."""
    expr = F.lit(None).cast("string")
    # build coalesce(when(contains tok1), when(contains tok2), ...) in order
    whens = [
        F.when(F.array_contains(tokens_col, et), F.lit(et))
        for et in vnnorm.ENTITY_TYPE_TOKENS
    ]
    return F.coalesce(*whens, expr)


def validate_mentions(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Null/empty, length-range, and special-chars-only filters
    (parity: ``utils/validation.py:40-84``). All pushdown-friendly natives."""
    c = F.col(text_col)
    return df.where(
        c.isNotNull()
        & (F.trim(c) != "")
        & F.length(c).between(3, 200)
        & ~c.rlike(r"^[^a-zA-Z0-9À-ɏḀ-ỿ]+$")
    )


def _with_norm(df: DataFrame, text_col: str, kernel: str) -> DataFrame:
    """Attach the ``_norm`` struct via the chosen kernel.

    ``kernel="pandas"`` (DEFAULT) is the vectorized Arrow kernel —
    measured FASTER than the JVM alternative and kept by measurement,
    not assumption. ``"auto"`` routes rows inside the provably
    byte-identical safe charset (``vnnorm_jvm.SAFE_TEXT_PATTERN``)
    through the JVM regexp chain (zero Python workers) and the rest
    through the pandas kernel, then unions; ``"jvm"`` applies the JVM
    chain unconditionally (caller asserts safe-charset input).

    Why pandas wins (interleaved fresh-JVM A/B, 217k pages,
    ``bench_normalize_kernel.json``): best-of-2 normalize-stage 12.1 s
    pandas vs 18.5 s auto at local[8]; 8.9 vs 30.8 at local[32]. The
    ~120-rule chain nested as one Column expression exceeds janino's
    64 KB method limit, so Spark falls back to INTERPRETED evaluation —
    a per-row tree walk with a UTF8String→String→UTF8String
    materialization per regexp_replace, which costs far more than one
    Arrow round-trip into the vectorized kernel (and degrades further
    at 32 threads where the extra allocations saturate the memory
    bus). The JVM twin stays available as an executable spec (its
    differential suite hardens the kernel) and for pure-SQL
    deployments that cannot run Python workers at all."""
    from company_name_matching_spark.functions import vnnorm_jvm

    col = F.col(text_col)
    # asNondeterministic (guide §4.4): downstream filters on UDF-derived
    # columns (``match_key != ""``, entry-level predicates) get pushed below
    # the projection by DUPLICATING the UDF — the normalize plan carried
    # FOUR ArrowEvalPython nodes for this one call, i.e. the 53-rule kernel
    # (the pipeline's hottest per-row cost) ran 4x per row. Marking it
    # non-deterministic forbids the optimizer from cloning or reordering it;
    # the kernel is a pure function of the text, so results are unchanged —
    # only the duplication disappears (plan now shows exactly one
    # ArrowEvalPython; differential tests unchanged).
    norm_udf = _normalize_udf.asNondeterministic()
    if kernel == "pandas":
        return df.withColumn("_norm", norm_udf(col))
    if kernel == "jvm":
        return df.withColumn("_norm", vnnorm_jvm.normalized_struct(col))
    safe = vnnorm_jvm.is_jvm_safe(col)
    jvm = df.where(safe).withColumn(
        "_norm", vnnorm_jvm.normalized_struct(col)
    )
    arrow = df.where(~safe).withColumn("_norm", norm_udf(col))
    return jvm.unionByName(arrow)


def normalize_mentions(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = (),
    id_domain: str = "",
    dedup_normalize: str = "never",
    kernel: str = "pandas",
) -> DataFrame:
    """Generic mention normalization: any (id, text) table → normalized
    records with all scoring-side features. One shuffle-free map (or a
    distinct-text contraction when duplication pays for it — below).

    CONTRACT: ``id_col`` must be unique within ``df`` — ``record_id`` is its
    hash, and a duplicated id fans out every downstream per-record join
    (the batch pipeline treats the url AS the page identity; the streaming
    path enforces uniqueness with its anti-join). When two normalized
    tables from DIFFERENT id spaces are unioned (e.g. search's corpus ∪
    queries), give each a distinct ``id_domain`` — it is hashed with the id
    so a corpus id that happens to equal a query id cannot collide.

    ``dedup_normalize``: web corpora repeat the same mention text across
    millions of pages, and the 53-rule Arrow kernel is the pipeline's
    single hottest per-row cost — so ``"always"`` runs the kernel once
    per DISTINCT text and joins the results back (the same row-domain
    contraction the scoring stage applies to featurization and CCNet
    applies to LID/LM scoring; output is bit-identical because the
    kernel is a pure function of the text). ``"auto"`` spends one cheap
    count/approx-distinct aggregation and contracts when duplication
    ≥ 2×. ``"never"`` (DEFAULT) keeps the shuffle-free per-row map —
    measured A/B on the 162,888-page / 24×-duplicated bench workload at
    local[8] (interleaved best-of-2, fresh JVMs): per-row 7.4 s vs
    contraction 11.0 s, because the distinct() shuffle of the text
    column costs more than the vectorized kernel saves on short
    mention strings. The contraction pays only when per-row kernel
    cost ≫ shuffle cost per row (long documents, or kernels far
    heavier than this one) — that regime is exactly CCNet's
    dedup-before-LM ordering, which plans/webcorpus.py applies at the
    document level instead."""
    if dedup_normalize not in ("auto", "always", "never"):
        raise ValueError(
            f"dedup_normalize must be 'auto', 'always' or 'never', "
            f"got {dedup_normalize!r}"
        )
    if kernel not in ("auto", "pandas", "jvm"):
        raise ValueError(
            f"kernel must be 'auto', 'pandas' or 'jvm', got {kernel!r}"
        )
    df = validate_mentions(df, text_col)
    contract = dedup_normalize == "always"
    if dedup_normalize == "auto":
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(text_col).alias("d"),
        ).first()
        contract = stats["n"] >= 2 * max(int(stats["d"]), 1)
    if contract:
        normed = _with_norm(
            df.select(F.col(text_col).alias("_t")).distinct(), "_t", kernel
        )
        df = df.join(normed, df[text_col] == normed["_t"]).drop("_t")
    else:
        df = _with_norm(df, text_col, kernel)
    rid = (
        F.xxhash64(F.concat(F.lit(id_domain), F.col(id_col).cast("string")))
        if id_domain
        else F.xxhash64(id_col)  # default path: ids unchanged, bit-for-bit
    )
    df = (
        df.select(
            rid.alias("record_id"),
            F.col(id_col).alias("source_id"),
            *keep_cols,
            F.col(text_col).alias("name"),
            F.col("_norm.cleaned").alias("cleaned"),
            F.col("_norm.norm_key").alias("norm_key"),
            F.col("_norm.match_key").alias("match_key"),
        )
        .where(F.col("match_key") != "")
        .withColumn("tokens", F.split("match_key", " "))
        .withColumn("entity_type", entity_type_col(F.col("tokens")))
        .withColumn(
            "has_repeat",
            F.col("cleaned").rlike(_REPEAT_UNIGRAM)
            | F.col("cleaned").rlike(_REPEAT_BIGRAM),
        )
    )
    return df


def normalize_pages(
    pages: DataFrame, text_col: str = "text", dedup_normalize: str = "never",
    kernel: str = "pandas",
) -> DataFrame:
    """pages → names with all scoring-side features (url is the identity)."""
    return normalize_mentions(
        pages, "url", text_col, dedup_normalize=dedup_normalize, kernel=kernel
    ).withColumnRenamed("source_id", "url")


def group_original_names(
    names: DataFrame,
    key_col: str = "norm_key",
    name_col: str = "name",
    cap: int = 100,
    n_salts: int = 16,
) -> DataFrame:
    """``original_names`` group metadata (``stage2_deduplicate.py:106-148``)
    as a TWO-PHASE SALTED collect_list (SURVEY A1's skew note): phase 1
    aggregates within (key, salt) shards so no single reducer materializes a
    hot group's full list; phase 2 merges ≤ ``n_salts`` already-capped
    partials. Deterministic: each phase sorts before capping, and the
    lexicographically smallest ``cap`` names of the group always survive the
    per-salt cap (each is within its own salt's smallest ``cap``), so the
    result equals a global sort+slice regardless of partitioning.

    Returns (key_col, original_names: array<string> sorted, capped).
    """
    salted = names.select(key_col, name_col).withColumn(
        "_salt", F.pmod(F.xxhash64(name_col), F.lit(n_salts))
    )
    p1 = salted.groupBy(key_col, "_salt").agg(
        F.slice(F.sort_array(F.collect_list(name_col)), 1, cap).alias("_part")
    )
    return p1.groupBy(key_col).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("_part"))), 1, cap
        ).alias("original_names")
    )


def dedup_exact(
    names: DataFrame, keep: str = "longest", collect_names: int = 0
) -> DataFrame:
    """Exact dedup by ``norm_key`` with the reference's window semantics
    (``stage2_deduplicate.py:79-99``) but a deterministic tiebreaker
    (``xxhash64(name)`` instead of ``monotonically_increasing_id``).

    Returns one canonical row per norm_key plus group metadata. With
    ``collect_names > 0``, attaches the reference's ``original_names`` audit
    column (capped, sorted) via the salted two-phase aggregation.
    """
    from pyspark.sql.window import Window

    if keep == "longest":
        order = [F.length("name").desc(), F.xxhash64("name").asc()]
    else:  # "first" → deterministic stand-in: smallest record hash
        order = [F.xxhash64("name").asc()]
    w = Window.partitionBy("norm_key").orderBy(*order)
    grp = Window.partitionBy("norm_key")
    out = (
        names.withColumn("_rn", F.row_number().over(w))
        .withColumn("duplicate_group_size", F.count(F.lit(1)).over(grp))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("is_duplicate", F.col("duplicate_group_size") > 1)
    )
    if collect_names > 0:
        out = out.join(
            group_original_names(names, cap=collect_names), "norm_key", "left"
        )
    return out
