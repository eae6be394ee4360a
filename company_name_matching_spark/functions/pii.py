"""PII detection / redaction for web-text corpora.

A training-data pipeline over crawled pages must strip personally
identifying strings before anything downstream sees the text (the
reference pipeline operates on crawled Vietnamese company pages — the
same corpus class where emails/phones are pervasive). This module is
the JVM-only fast path for that stage: every pattern is applied with
``regexp_replace`` / ``regexp_count`` inside whole-stage codegen — no
Python in the loop, no UDF.

Patterns are deliberately restricted to syntax that Java regex (Spark)
and RE2 (DuckDB / Go scanners) interpret identically — ``\\b``, ``\\d``,
bounded repetition, character classes; no backreferences, no lookaround
— so the DuckDB oracle can replay redaction byte-for-byte and a future
non-JVM scanner stays consistent.

Order matters and is part of the contract: EMAIL runs first (an address
can embed digit runs a later pattern would mangle), IPV4 before PHONE
(``1.23.456.7890``-style dotted digit runs must resolve as addresses,
not dotted phone numbers), SSN last (its 3-2-4 shape is disjoint from
PHONE's 3-3-4 but shares the hyphen alphabet).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement token) — applied strictly in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category token, in the fixed
    ``PII_PATTERNS`` order. Pure ``regexp_replace`` chain — one codegen
    stage, zero shuffles, linear in text length."""
    out = text
    for _name, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_count(text: Column, name: str) -> Column:
    """Non-overlapping match count for one category, counted on the
    text AS SEEN at that category's position in the redaction chain
    (earlier categories already replaced) — so counts decompose the
    redaction exactly: applying the chain removes precisely the counted
    spans, never a span an earlier pattern already consumed."""
    out = text
    for pname, pat, _tok in PII_PATTERNS:
        if pname == name:
            return F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, _tok)
    raise KeyError(name)


def pii_counts_struct(text: Column) -> Column:
    """All category counts as a struct (one pass per pattern, still a
    single projection — Catalyst collapses the shared prefix chains)."""
    return F.struct(
        *[pii_count(text, name).alias(name) for name, _p, _t in PII_PATTERNS]
    )


def oracle_redact_sql(expr: str) -> str:
    """The DuckDB twin of :func:`redact_pii` over SQL expression
    ``expr`` — same patterns, same order, global-replace flag."""
    out = expr
    for _name, pat, tok in PII_PATTERNS:
        # DuckDB single-quoted literals are standard-conforming: no
        # backslash processing, so the pattern passes through verbatim.
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{tok}', 'g')"
    return out


def oracle_count_sql(expr: str, name: str) -> str:
    """DuckDB twin of :func:`pii_count`: count after replaying the
    chain prefix, via ``len(regexp_extract_all(...))``."""
    out = expr
    for pname, pat, tok in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        if pname == name:
            return f"len(regexp_extract_all({out}, '{sql_pat}'))"
        out = f"regexp_replace({out}, '{sql_pat}', '{tok}', 'g')"
    raise KeyError(name)
