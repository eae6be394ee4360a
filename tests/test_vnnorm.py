"""Byte-parity tests for the normalization kernel.

Golden values in ``golden_norms.json`` were produced by executing the
reference functions (``/root/reference/src/preprocess.py``) once; the tests
assert our vectorized pandas implementation is byte-identical (the
differential-test pattern of the reference's own
``scripts/spark_quality_memory_validation.py:202-310``).

A second (skippable) test diffs live against the reference module when
``/root/reference`` is present, over a larger generated corpus.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pandas as pd
import pytest

from company_name_matching_spark.functions import vnnorm

GOLDEN = json.loads(
    (Path(__file__).parent / "golden_norms.json").read_text(encoding="utf-8")
)


def _series(key: str) -> pd.Series:
    return pd.Series([g[key] for g in GOLDEN])


def test_nfc_lower_golden():
    got = vnnorm.nfc_lower(_series("raw")).tolist()
    want = [g["nfc_lower"] for g in GOLDEN]
    assert got == want


def test_entity_rules_golden():
    got = vnnorm.apply_entity_rules(_series("nfc_lower")).tolist()
    want = [g["entity_norm"] for g in GOLDEN]
    assert got == want


def test_functional_rules_golden():
    got = vnnorm.apply_functional_rules(_series("entity_norm")).tolist()
    want = [g["functional_norm"] for g in GOLDEN]
    assert got == want


def test_fold_accents_golden():
    got = vnnorm.fold_accents(_series("raw")).tolist()
    want = [g["no_accent_raw"] for g in GOLDEN]
    assert got == want


def test_clean_name_golden():
    got = vnnorm.clean_name(_series("raw"), remove_stopwords=True).tolist()
    want = [g["cleaned"] for g in GOLDEN]
    assert got == want


def test_clean_name_keep_stopwords_golden():
    got = vnnorm.clean_name(_series("raw"), remove_stopwords=False).tolist()
    want = [g["cleaned_keep_sw"] for g in GOLDEN]
    assert got == want


def test_norm_key_golden():
    got = vnnorm.norm_key(_series("raw")).tolist()
    want = [g["norm_key"] for g in GOLDEN]
    assert got == want


def test_nulls_and_empties():
    s = pd.Series([None, "", "   ", "ABC"])
    assert vnnorm.clean_name(s).tolist() == ["", "", "", "abc"]
    assert vnnorm.norm_key(s).tolist() == ["", "", "", "abc"]
    assert vnnorm.fold_accents(s).tolist() == ["", "", "   ", "ABC"]


def test_repeated_tokens():
    s = pd.Series(
        [
            "dich vu dich vu tong hop",  # repeated bigram
            "san san xuat",  # repeated unigram
            "a a b",  # single-char repeat → NOT flagged (len>1 rule)
            "tnhh hoa mai",
            "a&b a&b x",  # non-word chars inside token
            "",
        ]
    )
    assert vnnorm.has_repeated_tokens(s).tolist() == [
        True,
        True,
        False,
        False,
        True,
        False,
    ]


def test_extract_entity_type_specificity_order():
    s = pd.Series(
        [
            "cn cp abc",  # cn beats cp (specificity order)
            "tnhh mtv abc",  # tnhh beats mtv
            "sua viet nam",  # none
            "abc-cn xyz",  # 'cn' embedded in a hyphenated token → NOT a token
            "cp sua viet nam",
        ]
    )
    assert vnnorm.extract_entity_type(s).tolist() == ["cn", "tnhh", None, None, "cp"]


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/src"), reason="reference repo not present"
)
def test_live_diff_against_reference():
    """Differential parity over a generated corpus: raw names, their variants,
    and rule-triggering phrases, byte-for-byte on all three derived strings."""
    sys.path.insert(0, "/root/reference")
    try:
        from src.preprocess import (  # type: ignore
            clean_company_name,
            normalize_entity_types,
            normalize_functional_terms,
            normalize_vietnamese_text,
            remove_accents,
        )
    finally:
        sys.path.remove("/root/reference")

    from company_name_matching_spark.sources.fixtures import base_companies

    names = [n for _, n in base_companies(200)]
    # add stress strings
    names += [
        "BR CO PHAN A", "br cty b", "br x", "SX & TM A", "sx-tm b",
        "1 TV C", "ĐT XD D", "đtxd e", "TM & DV F", "tm va dich vu g",
        "CO., LTD H", "co.ltd i", "REP  OFFICE J", "representative office k",
    ]
    s = pd.Series(names)
    ours_clean = vnnorm.clean_name(s).tolist()
    ours_key = vnnorm.norm_key(s).tolist()
    ours_keep = vnnorm.clean_name(s, remove_stopwords=False).tolist()
    for i, n in enumerate(names):
        ref_clean = clean_company_name(n, remove_stopwords=True)
        ref_keep = clean_company_name(n, remove_stopwords=False)
        nk = remove_accents(
            normalize_functional_terms(
                normalize_entity_types(normalize_vietnamese_text(n))
            )
        ).strip()
        assert ours_clean[i] == ref_clean, f"clean mismatch on {n!r}"
        assert ours_keep[i] == ref_keep, f"keep-sw mismatch on {n!r}"
        assert ours_key[i] == nk, f"norm_key mismatch on {n!r}"


def test_fused_clean_and_norm_key_byte_equal():
    """clean_name_and_norm_key (one shared canonical pass) must be
    byte-identical to the independent clean_name / norm_key calls on the
    golden corpus + tricky synthetics."""
    import json
    import pandas as pd
    from pathlib import Path

    from company_name_matching_spark.functions import vnnorm

    golden = json.loads(
        (Path(__file__).parent / "golden_norms.json").read_text()
    )
    texts = [g["raw"] for g in golden] + [
        "", "  ", "CÔNG TY TNHH MTV ÁNH DƯƠNG - CN HÀ NỘI",
        "cty cp -- xnk & thương mại 123", None,
    ]
    s = pd.Series(texts, dtype="object")
    fused_clean, fused_key = vnnorm.clean_name_and_norm_key(s)
    pd.testing.assert_series_equal(fused_clean, vnnorm.clean_name(s))
    pd.testing.assert_series_equal(fused_key, vnnorm.norm_key(s))
