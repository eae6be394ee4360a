"""Cross-language (English→Vietnamese) golden evaluation set.

The reference evaluates EN→VI matching with a hardcoded test set
(``scripts/evaluate_cross_language.py:28-450``; its weakest query class at
93.8% Top-1, ``docs/evaluation.md:106-113``). This is a LOCALLY-AUTHORED
equivalent built from publicly-known Vietnamese companies — no content is
taken from the reference file; the protocol (corpus = unique targets,
top-5 search, Top-1/3/5 + per-category stats) is mirrored in
``scripts/evaluate_cross_language.py``.

Two tiers, because the two failure modes differ:

* ``surface``  — the EN query shares ≥1 discriminative token with the
  Vietnamese name after alias folding (brand words like "hoa phat",
  acronyms like "fpt"). A lexical engine MUST get these right once the
  token blocking channel and the EN legal-form aliases are in place —
  pytest gates Top-1 on this tier.
* ``semantic`` — pure translation pairs ("Mobile World" ↔ "Thế Giới Di
  Động") with no lexical bridge. Solvable only with a real dense encoder
  (the ``operators/encode.py`` seam; no model in this environment) —
  reported, never gated.
"""

from __future__ import annotations

# (query_en, target_vi, category, tier)
GOLDEN_PAIRS: list[tuple[str, str, str, str]] = [
    # tier: surface — brand token / acronym bridge
    ("Hoa Phat Group Joint Stock Company",
     "CÔNG TY CỔ PHẦN TẬP ĐOÀN HÒA PHÁT", "industrial", "surface"),
    ("FPT Corporation",
     "CÔNG TY CỔ PHẦN FPT", "technology", "surface"),
    ("Masan Group Corporation",
     "CÔNG TY CỔ PHẦN TẬP ĐOÀN MASAN", "food", "surface"),
    ("Vingroup Joint Stock Company",
     "TẬP ĐOÀN VINGROUP - CÔNG TY CP", "conglomerate", "surface"),
    ("Vinhomes Joint Stock Company",
     "CÔNG TY CỔ PHẦN VINHOMES", "realestate", "surface"),
    ("Novaland Group Joint Stock Company",
     "CÔNG TY CỔ PHẦN TẬP ĐOÀN NOVALAND", "realestate", "surface"),
    ("Vietjet Aviation Joint Stock Company",
     "CÔNG TY CỔ PHẦN HÀNG KHÔNG VIETJET", "aviation", "surface"),
    ("SSI Securities Corporation",
     "CÔNG TY CỔ PHẦN CHỨNG KHOÁN SSI", "finance", "surface"),
    ("Bao Viet Holdings",
     "TẬP ĐOÀN BẢO VIỆT", "insurance", "surface"),
    ("Hoa Sen Group",
     "CÔNG TY CỔ PHẦN TẬP ĐOÀN HOA SEN", "industrial", "surface"),
    ("Duc Giang Chemicals Group Joint Stock Company",
     "CÔNG TY CỔ PHẦN TẬP ĐOÀN HÓA CHẤT ĐỨC GIANG", "chemicals", "surface"),
    ("Vinamilk Joint Stock Company",
     "CÔNG TY CỔ PHẦN SỮA VIỆT NAM VINAMILK", "dairy", "surface"),
    ("Sai Gon Thuong Tin Commercial Joint Stock Bank",
     "NGÂN HÀNG TMCP SÀI GÒN THƯƠNG TÍN", "banking", "surface"),
    ("Phu Nhuan Jewelry Joint Stock Company",
     "CÔNG TY CỔ PHẦN VÀNG BẠC ĐÁ QUÝ PHÚ NHUẬN", "retail", "surface"),
    ("Gemadept Corporation",
     "CÔNG TY CỔ PHẦN GEMADEPT", "logistics", "surface"),
    # tier: semantic — translation-only, needs a dense encoder
    ("Vinamilk",
     "CÔNG TY CỔ PHẦN SỮA VIỆT NAM", "dairy", "semantic"),
    ("Vietnam Dairy Products JSC",
     "CÔNG TY CỔ PHẦN SỮA VIỆT NAM", "dairy", "semantic"),
    ("Mobile World Investment Corporation",
     "CÔNG TY CỔ PHẦN ĐẦU TƯ THẾ GIỚI DI ĐỘNG", "retail", "semantic"),
    ("Vietnam Electricity",
     "TẬP ĐOÀN ĐIỆN LỰC VIỆT NAM", "utilities", "semantic"),
    ("Bank for Foreign Trade of Vietnam",
     "NGÂN HÀNG TMCP NGOẠI THƯƠNG VIỆT NAM", "banking", "semantic"),
    ("Vietnam Airlines JSC",
     "TỔNG CÔNG TY HÀNG KHÔNG VIỆT NAM", "aviation", "semantic"),
    ("Saigon Beer Alcohol Beverage Corporation",
     "TỔNG CÔNG TY CỔ PHẦN BIA RƯỢU NƯỚC GIẢI KHÁT SÀI GÒN", "beverage",
     "semantic"),
    ("Military Commercial Joint Stock Bank",
     "NGÂN HÀNG TMCP QUÂN ĐỘI", "banking", "semantic"),
    ("Asia Commercial Bank",
     "NGÂN HÀNG TMCP Á CHÂU", "banking", "semantic"),
    ("Vietnam Rubber Group",
     "TẬP ĐOÀN CÔNG NGHIỆP CAO SU VIỆT NAM", "industrial", "semantic"),
]


def corpus_and_queries():
    """Reference protocol (evaluate_cross_language.py:452-455): corpus =
    unique targets; returns (corpus rows, query rows) with stable ids."""
    targets = sorted({t for _, t, _, _ in GOLDEN_PAIRS})
    corpus = [(f"VN_{i:03d}", name) for i, name in enumerate(targets)]
    by_name = {name: cid for cid, name in corpus}
    queries = [
        (f"XQ_{i:03d}", q, by_name[t], cat, tier)
        for i, (q, t, cat, tier) in enumerate(GOLDEN_PAIRS)
    ]
    return corpus, queries


# Query-side EN→VI sector-term aliases (SearchConfig.query_aliases) — the
# generic institution vocabulary any Vietnamese-market engine carries
# (bank/airlines/securities/...), NOT a name-translation dictionary: brand
# translations ("Mobile World" ↔ "thế giới di động") are exactly what the
# dense channel exists for and are deliberately absent. Patterns run on the
# normalized (lowercase, accent-free) query match_key; Java regex (\b ok).
# Replacements are accent-free to match the match_key alphabet.
EN_VI_ALIASES: tuple[tuple[str, str], ...] = (
    (r"\bcommercial bank\b", "ngan hang tmcp"),
    (r"\bbank\b", "ngan hang"),
    (r"\bairlines\b", "hang khong"),
    (r"\bairways\b", "hang khong"),
    (r"\baviation\b", "hang khong"),
    (r"\bsecurities\b", "chung khoan"),
    (r"\binsurance\b", "bao hiem"),
    (r"\belectricity\b", "dien luc"),
    (r"\bdairy products\b", "sua"),
    (r"\bdairy\b", "sua"),
    (r"\bmilk\b", "sua"),
    (r"\brubber\b", "cao su"),
    (r"\bbeer\b", "bia"),
    (r"\bbeverage\b", "nuoc giai khat"),
    (r"\bjewelry\b", "vang bac"),
    (r"\bgroup\b", "tap doan"),
)
