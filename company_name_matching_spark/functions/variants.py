"""Combinatorial type-variant generation for evaluation corpora.

Local reimplementation of the reference's synthetic query generator
(``src/synthetic/combinatorial.py:8-67``) so evaluation never imports or
executes code from the untrusted reference tree (ADVICE r2). Behavior
parity is exact: the substitution table below IS the generator's semantics
(the strings are Vietnamese legal-form/abbreviation equivalences), while
the applier is written fresh.

Semantics being matched (combinatorial.py:34-67):

* substitution keys are tested against the LOWERCASED ORIGINAL name and
  applied in table order; each matching key fans every current variation
  out over ``[key] + alternatives`` via plain ``str.replace``;
* each surviving variation contributes four surface forms — as-is,
  accent-folded, uppercased, and folded+uppercased — all stripped;
* the lowercased original is removed from the final set.

Verified equivalent to the reference generator on the full 4,019-name
corpus (tests/test_reference_corpus_accuracy.py::test_variant_generator_parity
— opt-in via SPARK_GRAFT_PARITY_REF=1, the only test that executes
reference code, so default pytest runs never do).
"""

from __future__ import annotations

from company_name_matching_spark.functions.vnnorm import _ACCENT_TRANSLATE

# (key, alternatives) — ORDER MATTERS: later keys run over the output of
# earlier substitutions, exactly like the reference's dict iteration.
TYPE_VARIANTS: list[tuple[str, list[str]]] = [
    ("công ty tnhh mtv", ["tnhh mtv", "tnhh một thành viên", "tnhh 1tv",
                          "tnhh 1 thành viên", "cong ty tnhh mtv",
                          "tnhh mot thanh vien"]),
    ("cong ty tnhh mtv", ["tnhh mtv", "tnhh 1tv", "tnhh 1 thanh vien"]),
    ("công ty tnhh", ["tnhh", "cty tnhh", "co. ltd", "co.,ltd",
                      "trách nhiệm hữu hạn", "cong ty tnhh",
                      "trach nhiem huu han"]),
    ("cong ty tnhh", ["tnhh", "cty tnhh", "co. ltd", "co.,ltd"]),
    ("công ty cổ phần", ["cp", "ctcp", "cty cp", "jsc", "cổ phần",
                         "cong ty co phan", "co phan"]),
    ("cong ty co phan", ["cp", "ctcp", "cty cp", "jsc", "co phan"]),
    ("tập đoàn", ["group", "tđ", "tap doan", "tapdoan"]),
    ("tap doan", ["group", "tđ", "tapdoan"]),
    ("thương mại dịch vụ", ["tm dv", "tm&dv", "tmdv",
                            "thương mại và dịch vụ", "tm-dv",
                            "thuong mai dich vu"]),
    ("thuong mai dich vu", ["tm dv", "tmdv", "tm-dv"]),
    ("sản xuất thương mại", ["sx tm", "sxtm", "sx & tm", "sản xuất tm",
                             "sx-tm", "san xuat thuong mai"]),
    ("san xuat thuong mai", ["sx tm", "sxtm", "sx-tm"]),
    ("xuất nhập khẩu", ["xnk", "import export", "imp-exp",
                        "xuat nhap khau"]),
    ("xuat nhap khau", ["xnk", "import export"]),
    ("đầu tư xây dựng", ["đt xd", "dtxd", "đầu tư và xây dựng",
                         "dau tu xay dung"]),
    ("dau tu xay dung", ["đt xd", "dtxd"]),
    ("văn phòng đại diện", ["vpđd", "vpdd", "rep office",
                            "van phong dai dien"]),
    ("van phong dai dien", ["vpdd", "rep office"]),
    ("chi nhánh", ["cn", "br", "chi nhanh"]),
    ("chi nhanh", ["cn", "br"]),
    ("một thành viên", ["mtv", "1tv", "1 thành viên", "mot thanh vien"]),
]


def fold_accents_str(text: str) -> str:
    """Scalar accent fold, byte-equivalent to the vectorized F4 operator."""
    return text.translate(_ACCENT_TRANSLATE)


def type_variants(original_name: str) -> set[str]:
    """All type-substituted surface variants of a company name.

    Returns the variant SET (excluding the lowercased original); callers
    wanting determinism should sort it — set iteration order is
    hash-seed dependent, which is also why the eval protocol sorts.
    """
    name_lower = original_name.lower()
    variations = [name_lower]
    for key, alts in TYPE_VARIANTS:
        if key not in name_lower:
            continue
        variations = list({
            var.replace(key, sub) for var in variations for sub in [key] + alts
        })
    out: set[str] = set()
    for v in variations:
        folded = fold_accents_str(v)
        out.update(
            (v.strip(), folded.strip(), v.upper().strip(),
             folded.upper().strip())
        )
    out.discard(name_lower)
    return out
