"""Deterministic synthetic fixtures: companies, labeled variant queries, and
the ``pages`` input table (Common-Crawl-style shape per BASELINE.json
``input_hint``).

Everything derives from ``seed=42`` (the reference's sampling convention,
``scripts/evaluate_matching.py:29-31``) and regenerates byte-stable, so the
text-parity and normalization-parity tests are exact. No external data.

The variant generator mirrors the *behavior* of the reference's deterministic
combinatorial rules (``src/synthetic/combinatorial.py:8-66``): legal-form /
functional-phrase substitutions × {original, no-accent, UPPER,
no-accent-UPPER}. Outputs are sorted for determinism (the reference iterates
a set).
"""

from __future__ import annotations

import html as _html
import random
import re
from dataclasses import dataclass

from company_name_matching_spark.functions.variants import (
    TYPE_VARIANTS as _TYPE_VARIANT_PAIRS,
)
from company_name_matching_spark.functions.vnnorm import (
    ACCENT_DST,
    ACCENT_SRC,
)

_ACCENT_TRANSLATE = str.maketrans(ACCENT_SRC, ACCENT_DST)


def _no_accent(s: str) -> str:
    return s.translate(_ACCENT_TRANSLATE)


# Phrase-substitution table — single source of truth lives in
# functions/variants.py (VERDICT r3: two in-repo copies could drift).
# Kept as an ordered dict here because variants_for iterates .items().
TYPE_VARIANTS: dict[str, list[str]] = dict(_TYPE_VARIANT_PAIRS)

_LEGAL_FORMS = [
    "CÔNG TY TNHH",
    "CÔNG TY CỔ PHẦN",
    "CÔNG TY TNHH MTV",
    "TẬP ĐOÀN",
    "HỢP TÁC XÃ",
]

_FUNCTIONAL = [
    "THƯƠNG MẠI DỊCH VỤ",
    "SẢN XUẤT THƯƠNG MẠI",
    "XUẤT NHẬP KHẨU",
    "ĐẦU TƯ XÂY DỰNG",
    "THƯƠNG MẠI",
    "DỊCH VỤ",
    "PHÁT TRIỂN",
    "VẬN TẢI",
    "",
]

_BRAND_WORDS = [
    "SƠN", "HÀ", "VIỆT", "NAM", "PHÚC", "HƯNG", "THỊNH", "AN", "BÌNH", "MINH",
    "TÂN", "LONG", "HẢI", "ĐẠI", "PHÁT", "QUANG", "HỒNG", "NGỌC", "KIM", "THÀNH",
    "TRƯỜNG", "THỦY", "LỘC", "GIA", "HUY", "HÀO", "DUY", "TÍN", "HOA", "MAI",
    "SỮA", "THÉP", "GỖ", "BAO", "BÌ", "CƠ", "KHÍ", "ĐIỆN", "TỬ", "HOÀNG",
]


@dataclass(frozen=True)
class Company:
    company_id: str
    name: str


def base_companies(n: int = 200, seed: int = 42) -> list[tuple[str, str]]:
    """Deterministic corpus of ``n`` distinct companies.

    Includes the edge cases the reference's post-processing handles
    (FIXTURES.md §2): repeated consecutive tokens, sibling entities differing
    only in legal form, and English-form names.
    """
    rng = random.Random(seed)
    out: list[tuple[str, str]] = []
    seen_brands: set[str] = set()
    i = 0
    while len(out) < n:
        # unique brand = 2-3 words + optional number
        for _ in range(100):
            k = rng.choice([2, 2, 3])
            brand = " ".join(rng.sample(_BRAND_WORDS, k))
            if rng.random() < 0.15:
                brand += f" SỐ {rng.randint(1, 9)}"
            if brand not in seen_brands:
                seen_brands.add(brand)
                break
        legal = rng.choice(_LEGAL_FORMS)
        func = rng.choice(_FUNCTIONAL)
        name = " ".join(x for x in [legal, func, brand] if x)
        r = rng.random()
        if r < 0.06:
            name = f"CHI NHÁNH {rng.randint(1, 3)} {name}"
        elif r < 0.10:
            # English surface form (normalizes back via entity rules)
            eng = rng.choice(["JSC", "CO.,LTD", "LLC", "GROUP"])
            name = f"{_no_accent(brand).title()} {eng}"
        elif r < 0.13:
            # repeated-token data-quality artifact
            name = name.replace("DỊCH VỤ", "DỊCH VỤ DỊCH VỤ", 1) \
                if "DỊCH VỤ" in name else f"{name} {brand.split()[0]} {brand.split()[0]}"
        if rng.random() < 0.3:
            name = name.title()
        out.append((f"CORP_{i:04d}", name))
        i += 1
        # sibling legal form for ~8% of brands — distinct entity, same brand
        if rng.random() < 0.08 and len(out) < n:
            sibling_legal = "CÔNG TY CỔ PHẦN" if "TNHH" in legal else "CÔNG TY TNHH"
            out.append((f"CORP_{i:04d}", " ".join(x for x in [sibling_legal, func, brand] if x)))
            i += 1
    return out[:n]


def variants_for(name: str, limit: int = 12, seed: int = 42) -> list[str]:
    """Deterministic combinatorial surface variants of ``name``.

    Behavioral mirror of ``combinatorial.py:32-66``: substitute every known
    phrase with each alternative, then add no-accent / UPPER permutations;
    drop the original lowercase form; return a deterministic sample.
    """
    name_lower = name.lower()
    current = [name_lower]
    for key, alts in TYPE_VARIANTS.items():
        if key in name_lower:
            nxt = []
            for var in current:
                for alt in [key] + alts:
                    nxt.append(var.replace(key, alt))
            current = sorted(set(nxt))
    final: set[str] = set()
    for v in current:
        v_na = _no_accent(v)
        final.update({v.strip(), v_na.strip(), v.upper().strip(), v_na.upper().strip()})
    final.discard(name_lower)
    ordered = sorted(final)
    if len(ordered) <= limit:
        return ordered
    rng = random.Random(f"{seed}:{name}")
    return sorted(rng.sample(ordered, limit))


def typo_variants(name: str, k: int, seed: int = 42) -> list[str]:
    """Deterministic single-edit typos (swap/drop/double a char) on the
    no-accent lowercase form — bench workload realism: typo pairs exercise
    the fuzzy scoring path (they never collapse to an exact match key)."""
    rng = random.Random(f"{seed}:typo:{name}")
    base = _no_accent(name.lower())
    out = []
    for _ in range(k):
        s = list(base)
        idxs = [j for j, c in enumerate(s) if c.isalnum()]
        if not idxs:
            continue
        j = rng.choice(idxs)
        op = rng.random()
        if op < 0.4 and j + 1 < len(s) and s[j + 1] != " ":
            s[j], s[j + 1] = s[j + 1], s[j]
        elif op < 0.7 and len(s) > 4:
            del s[j]
        else:
            s.insert(j, s[j])
        out.append("".join(s))
    return out


def labeled_queries(
    companies: list[tuple[str, str]], per_company: int = 6, seed: int = 42
) -> list[tuple[str, str, str, str]]:
    """(query_id, query_text, target_id, method) rows — pairwise ground truth."""
    rows = []
    qn = 0
    for cid, name in companies:
        for v in variants_for(name, limit=per_company, seed=seed):
            rows.append((f"Q_{qn:06d}", v, cid, "combinatorial"))
            qn += 1
    return rows


# ---------------------------------------------------------------------------
# pages table (input_hint shape) + deterministic HTML text extraction
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def render_html(text: str) -> bytes:
    """Minimal deterministic page body embedding one mention."""
    return f"<html><body><h1>{_html.escape(text)}</h1></body></html>".encode("utf-8")


def extract_text(html_bytes: bytes | None) -> str:
    """Deterministic inverse of :func:`render_html` for arbitrary simple HTML:
    strip tags, unescape entities, collapse whitespace. The per-url
    byte-identical invariant is asserted against the ``text`` column."""
    if html_bytes is None:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    no_tags = _TAG_RE.sub(" ", raw)
    return _WS_RE.sub(" ", _html.unescape(no_tags)).strip()


def pages_rows(
    n_companies: int = 200,
    per_company: int = 6,
    seed: int = 42,
    upsample: int = 1,
    typos_per_company: int = 0,
) -> list[tuple]:
    """Rows for the ``pages`` table: one page per corpus name and per labeled
    query variant. Returns tuples
    ``(url, warc_ts_epoch, html, text, lang, entity_id, kind)`` where
    ``entity_id``/``kind`` are ground-truth side-channels consumed only by
    tests (the pipeline itself reads just the input_hint columns).

    ``upsample`` replicates the mention distribution under distinct urls for
    bench scaling (the reference upsamples the same way,
    ``scripts/spark_evaluation.py:50-54``).
    """
    companies = base_companies(n_companies, seed=seed)
    queries = labeled_queries(companies, per_company=per_company, seed=seed)
    base = [(name, cid, "corpus") for cid, name in companies]
    base += [(qtext, tid, "variant") for _, qtext, tid, _ in queries]
    if typos_per_company:
        for cid, name in companies:
            for t in typo_variants(name, typos_per_company, seed):
                base.append((t, cid, "typo"))
    rows = []
    seq = 0
    t0 = 1767225600  # 2026-01-01T00:00:00Z
    for rep in range(upsample):
        for text, entity_id, kind in base:
            url = f"https://fixture.test/{seq:08d}"
            lang = "en" if text.isascii() else "vi"
            rows.append(
                (url, t0 + seq, render_html(text), extract_text(render_html(text)),
                 lang, entity_id if rep == 0 else f"{entity_id}#u{rep}", kind)
            )
            seq += 1
    return rows


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "entity_id string, kind string"
)


def pages_dataframe(spark, n_companies: int = 200, per_company: int = 6,
                    seed: int = 42, upsample: int = 1, partitions: int | None = None,
                    typos_per_company: int = 0):
    """Materialize the fixture pages table as a Spark DataFrame."""
    import datetime as _dt

    rows = [
        (u, _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).replace(tzinfo=None),
         h, t, lang, eid, kind)
        for (u, ts, h, t, lang, eid, kind) in pages_rows(
            n_companies, per_company, seed, upsample, typos_per_company
        )
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df
