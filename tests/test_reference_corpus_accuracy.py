"""Head-to-head accuracy on the reference's REAL corpus.

The reference publishes Top-1 99.82% / Top-3 99.99% (corpus 1,000 × 50k
queries; ``docs/evaluation.md:64-66``) falling to 99.71%/99.98% at corpus
5,000. This test runs the reference's own evaluation protocol — its corpus
(``data/sample_system_names.txt``, all 4,019 names), a parity-tested local
reimplementation of its combinatorial query generator
(``functions/variants.py``; the reference tree's code never executes in
default pytest runs), its tie-as-rank-1 semantics
(``scripts/evaluate_matching.py:53-61``) — against the distributed
``search_topk`` and demands Top-1 ≥ 0.99.

Measured at round 2: Top-1 = 100.00% (seed 42, n=1000) and 99.95%
(seed 7, n=2000) on the FULL 4,019-name corpus.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

import eval_reference_corpus as ev


@pytest.mark.skipif(
    not ev.reference_available(), reason="reference corpus not present"
)
def test_top1_accuracy_on_reference_corpus(spark):
    m = ev.evaluate(spark, corpus_limit=None, max_queries=400)
    assert m["corpus_size"] == 4019
    assert m["n_queries"] == 400
    assert m["top1"] >= 0.99, f"Top-1 {m['top1']:.4%}; misses: {m['misses'][:5]}"
    assert m["top3"] >= 0.99, f"Top-3 {m['top3']:.4%}"


def test_variant_generator_known_values():
    """Local generator sanity on hand-derived expectations (always runs)."""
    from company_name_matching_spark.functions.variants import type_variants

    got = type_variants("Công ty TNHH ABC")
    # a few forms that MUST be present under the substitution semantics
    for expect in ("tnhh abc", "cty tnhh abc", "CTY TNHH ABC",
                   "co.,ltd abc", "trach nhiem huu han abc",
                   "CONG TY TNHH ABC"):
        assert expect in got, expect
    assert "công ty tnhh abc" not in got  # lowercased original removed

    # no substitution key present -> only case/accent variants
    got2 = type_variants("Nhà hàng Hoa Sen")
    assert got2 == {"nha hang hoa sen", "NHÀ HÀNG HOA SEN",
                    "NHA HANG HOA SEN"}


@pytest.mark.skipif(
    "SPARK_GRAFT_PARITY_REF" not in __import__("os").environ
    or not ev.reference_available(),
    reason="opt-in: executes reference code (SPARK_GRAFT_PARITY_REF=1)",
)
def test_variant_generator_parity_vs_reference():
    """Full-corpus parity of the local generator vs the reference's own
    CombinatorialGenerator. Opt-in only — the ONLY place reference code may
    execute (ADVICE r2 removed it from the runtime eval path)."""
    from company_name_matching_spark.functions.variants import type_variants

    sys.path.insert(0, "/root/reference")
    try:
        from src.synthetic.combinatorial import CombinatorialGenerator
    finally:
        sys.path.pop(0)

    gen = CombinatorialGenerator()
    for _, name in ev.load_corpus():
        assert set(gen.generate(name)) == type_variants(name), name
