"""End-to-end tests for the web-corpus → training-data composition plan
(plans/webcorpus.prepare_training_corpus): snapshot dedup → extraction →
filtering → near-dup CC → decontamination → packing, with resume."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from company_name_matching_spark.plans import webcorpus
from company_name_matching_spark.sources import fixtures

BASE = dt.datetime(2026, 1, 1)

LONG_A = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"
LONG_A2 = LONG_A.replace("tonight", "today")  # near-dup of LONG_A
LONG_B = "completely different subject matter about spark shuffle partitions and adaptive query execution plans"
BENCH_TXT = "held out benchmark question with its own unique answer tokens"
CONTAMINATED = "a document that leaks the held out benchmark question about answers"
SHORT = "too short"


def _pages(spark):
    rows = [
        # two fetches of the same page (tracking param + fragment differ)
        ("https://a.com/1?utm_source=x", BASE, LONG_A),
        ("https://a.com/1#frag", BASE + dt.timedelta(days=1), LONG_A),
        # near-duplicate page on another host
        ("https://b.com/2", BASE, LONG_A2),
        # distinct keeper
        ("https://c.com/3", BASE, LONG_B),
        # contaminated vs benchmark (shares the 3-gram 'held out benchmark')
        ("https://d.com/4", BASE, CONTAMINATED),
        # below min_tokens
        ("https://e.com/5", BASE, SHORT),
    ]
    return spark.createDataFrame(
        [
            (u, ts, fixtures.render_html(t), t, "en", "x", "k")
            for (u, ts, t) in rows
        ],
        fixtures.PAGES_SCHEMA,
    )


def _bench(spark):
    return spark.createDataFrame(
        [(900, BENCH_TXT)], "doc_id long, text string"
    )


CFG = webcorpus.WebCorpusConfig(
    min_tokens=4,
    neardup_threshold=0.7,
    decontaminate_n=3,
    pack_budget=8,
)


def test_end_to_end_stage_semantics(spark):
    res = webcorpus.prepare_training_corpus(
        spark, _pages(spark), benchmark=_bench(spark), cfg=CFG
    )
    c = res.stage_counts
    # 6 fetches -> 5 canonical urls -> 5 extracted -> 4 past the token
    # floor -> 3 after near-dup CC -> 2 after decontamination
    assert c["snapshots"] == 5
    assert c["extract"] == 5
    assert c["filter"] == 4
    assert c["neardup"] == 3
    assert c["decontaminate"] == 2
    texts = {r.text for r in res.docs.collect()}
    assert LONG_B in texts
    assert texts & {LONG_A, LONG_A2}  # one near-dup representative kept
    assert CONTAMINATED not in texts
    # packing covers every surviving token exactly once
    packed = res.packed.collect()
    assert {r.doc_id for r in packed} == {r.doc_id for r in res.docs.collect()}
    total = sum(r.n_tokens for r in packed)
    ex = res.examples.collect()
    assert sum(r.n_tokens for r in ex) == total
    # per-example rollup keys = exactly the examples some doc STARTS in
    # (its n_tokens can exceed the budget via boundary-spanning docs)
    assert {r.example_id for r in ex} == {r.example_id for r in packed}
    assert min(r.example_id for r in ex) == 0


def test_extracts_when_text_missing(spark):
    res = webcorpus.prepare_training_corpus(
        spark, _pages(spark).drop("text"), benchmark=_bench(spark), cfg=CFG
    )
    assert res.stage_counts["decontaminate"] == 2
    texts = {r.text for r in res.docs.collect()}
    assert LONG_B in texts and CONTAMINATED not in texts


def test_resume_from_checkpoint(spark, tmp_path):
    ck = str(tmp_path / "wc")
    first = webcorpus.prepare_training_corpus(
        spark, _pages(spark), benchmark=_bench(spark),
        checkpoint_dir=ck, cfg=CFG,
    )
    second = webcorpus.prepare_training_corpus(
        spark, _pages(spark), benchmark=_bench(spark),
        checkpoint_dir=ck, cfg=CFG,
    )
    assert second.stage_counts == first.stage_counts
    resumed = {m["stage"]: m["resumed"] for m in second.metrics}
    assert all(resumed.values()), resumed
    a = sorted(r.doc_id for r in first.docs.collect())
    b = sorted(r.doc_id for r in second.docs.collect())
    assert a == b


def test_config_validation():
    with pytest.raises(ValueError, match="sample_rate"):
        webcorpus.WebCorpusConfig(sample_rate=0.0)
    with pytest.raises(ValueError, match="pack_budget"):
        webcorpus.WebCorpusConfig(pack_budget=0)
