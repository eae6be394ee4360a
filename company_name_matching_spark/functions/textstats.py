"""Text-analysis operators for large-scale training-data pipelines.

All of these are JVM-native column expressions (no Python at all), designed
so an ANSI-SQL oracle (DuckDB) can compute the identical value — that is the
correctness gate. Heuristics are deliberately simple + deterministic; the
point is distributed plumbing, pushdown-friendly expressions, and exact
cross-engine reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword list (shared with the SQL oracle).
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

# Vietnamese diacritic detector (shared with SQL oracle as a character class).
_VI_CHARS = "àáạảãâầấậẩẫăằắặẳẵèéẹẻẽêềếệểễìíịỉĩòóọỏõôồốộổỗơờớợởỡùúụủũưừứựửữỳýỵỷỹđ"


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens_col(text)))


# GPT-2-style pre-tokenizer pattern, restricted to the RE2-compatible subset
# (no lookahead) so a DuckDB oracle can reproduce counts bit-for-bit:
# contractions | space+letters | space+digits | space+other | whitespace.
# This is the "BPE-ish" LLM token ESTIMATOR for training-data budgeting —
# counts pre-tokenizer segments, not merged BPE ids (a real vocab merge
# changes counts by a roughly constant factor per language).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """LLM-token estimate per document (GPT-2 pre-tokenizer segments)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def stopword_ratio(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    sw = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(
        F.size(toks) > 0, sw.cast("double") / F.size(toks).cast("double")
    ).otherwise(0.0)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.when(
        F.length(text) > 0,
        F.length(stripped).cast("double") / F.length(text).cast("double"),
    ).otherwise(0.0)


def mean_token_len(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")
    ).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Simple [0,1] quality heuristic: penalize extreme repetition, high
    punctuation, and degenerate length. Deterministic + SQL-expressible."""
    tc = token_count(text).cast("double")
    uniq = distinct_token_count(text).cast("double")
    rep = F.when(tc > 0, uniq / tc).otherwise(0.0)  # 1 = no repetition
    punct = punct_ratio(text)
    len_ok = F.when(F.length(text).between(20, 10000), F.lit(1.0)).otherwise(0.5)
    return F.round(rep * 0.5 + (1.0 - punct) * 0.3 + len_ok * 0.2, 6)


def langid(text: Column) -> Column:
    """N-gram-free language heuristic: Vietnamese diacritics ⇒ 'vi'; else
    English stopword density ⇒ 'en'; else 'other'. Deterministic."""
    has_vi = text.rlike(f"[{_VI_CHARS}]")
    return (
        F.when(has_vi, F.lit("vi"))
        .when(stopword_ratio(text) >= 0.05, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of lowercase, whitespace-collapsed
    text — the exact-dedup key."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))
