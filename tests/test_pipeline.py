"""End-to-end acceptance: pairwise F1 ≥ 0.99 on labeled combinatorial pairs
at the same blocking key (BASELINE.json north_rule), plus checkpoint/resume.
"""

import json

from pyspark.sql import functions as F

from company_name_matching_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from company_name_matching_spark.sources import fixtures


def _f1(matches, ids, pred_col):
    sc = (
        matches.join(
            ids.withColumnRenamed("record_id", "left_id").withColumnRenamed(
                "entity_id", "l_ent"
            ),
            "left_id",
        ).join(
            ids.withColumnRenamed("record_id", "right_id").withColumnRenamed(
                "entity_id", "r_ent"
            ),
            "right_id",
        )
    ).withColumn("truth", F.col("l_ent") == F.col("r_ent"))
    agg = sc.agg(
        F.sum(F.when(F.col(pred_col) & F.col("truth"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col(pred_col) & ~F.col("truth"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col(pred_col) & F.col("truth"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return (2 * p * r / (p + r) if p + r else 0.0), tp, fp, fn


def test_pipeline_pairwise_f1(spark):
    pages = fixtures.pages_dataframe(spark, n_companies=120, per_company=5)
    res = run_pipeline(spark, pages)
    ids = (
        res.names.select("record_id", "url")
        .join(pages.select("url", "entity_id"), "url")
        .select("record_id", "entity_id")
    )
    f1, tp, fp, fn = _f1(res.matches, ids, "is_match")
    assert f1 >= 0.99, f"pair-level F1={f1:.4f} (tp={tp} fp={fp} fn={fn})"

    # cluster-level pairwise F1 over the same candidate universe
    lab = res.clusters.join(ids, "record_id")
    pred = (
        res.matches.select("left_id", "right_id")
        .join(
            lab.withColumnRenamed("record_id", "left_id")
            .withColumnRenamed("cluster_id", "l_cl"),
            "left_id",
        )
        .join(
            lab.withColumnRenamed("record_id", "right_id")
            .withColumnRenamed("cluster_id", "r_cl"),
            "right_id",
        )
        .withColumn("same_cluster", F.col("l_cl") == F.col("r_cl"))
        .select("left_id", "right_id", "same_cluster")
    )
    f1c, tp, fp, fn = _f1(pred, ids, "same_cluster")
    assert f1c >= 0.99, f"cluster-level F1={f1c:.4f} (tp={tp} fp={fp} fn={fn})"

    # every record is labeled exactly once
    assert res.clusters.count() == res.names.count()
    assert res.clusters.groupBy("record_id").count().where("count > 1").count() == 0


def test_sibling_legal_forms_stay_separate(spark):
    """TNHH vs CP of the same brand must land in different clusters
    (entity-type discrimination, matcher.py:640-657)."""
    import datetime as dt

    rows = []
    for i, t in enumerate(
        ["CÔNG TY TNHH SƠN HÀ", "cong ty tnhh son ha", "CÔNG TY CỔ PHẦN SƠN HÀ",
         "ctcp son ha"]
    ):
        rows.append((f"u{i}", dt.datetime(2026, 1, 1), fixtures.render_html(t),
                     t, "vi", "x", "k"))
    pages = spark.createDataFrame(rows, fixtures.PAGES_SCHEMA)
    res = run_pipeline(spark, pages)
    got = {r["url"]: r["cluster_id"] for r in
           res.clusters.join(res.names, "record_id").select("url", "cluster_id").collect()}
    assert got["u0"] == got["u1"]
    assert got["u2"] == got["u3"]
    assert got["u0"] != got["u2"]


def test_checkpoint_resume(spark, tmp_path):
    pages = fixtures.pages_dataframe(spark, n_companies=30, per_company=3)
    ck = str(tmp_path / "ck")
    res1 = run_pipeline(spark, pages, checkpoint_dir=ck)
    assert all(not m["resumed"] for m in res1.metrics)
    # markers + metrics written
    assert (tmp_path / "ck" / "normalize" / "_COMPLETE.json").exists()
    meta = json.loads((tmp_path / "ck" / "score" / "_COMPLETE.json").read_text())
    assert meta["rows"] > 0 and meta["elapsed_s"] > 0

    # resume: all stages restored, results identical
    res2 = run_pipeline(spark, pages, checkpoint_dir=ck)
    assert all(m["resumed"] for m in res2.metrics)
    assert (
        res1.clusters.exceptAll(res2.clusters).count() == 0
        and res2.clusters.exceptAll(res1.clusters).count() == 0
    )

    # partial resume: delete the last stage marker → only it recomputes
    (tmp_path / "ck" / "cluster" / "_COMPLETE.json").unlink()
    res3 = run_pipeline(spark, pages, checkpoint_dir=ck)
    by_stage = {m["stage"]: m["resumed"] for m in res3.metrics}
    assert by_stage["normalize"] and by_stage["pairs"] and by_stage["score"]
    assert not by_stage["cluster"]

    # metrics table accumulated rows for all runs, with per-partition lineage
    metrics = spark.read.parquet(str(tmp_path / "ck" / "metrics"))
    assert metrics.count() >= 12
    first = json.loads(
        metrics.where(~F.col("resumed")).select("partitions_json").first()[0]
    )
    assert isinstance(first, list)


def test_pipeline_degenerate_inputs(spark):
    """Edge partitions a 100-TB run WILL hit: empty input, a single record,
    an all-identical corpus, and rows that fail every validation filter —
    each must flow through normalize→block→score→cluster without error and
    with the a-priori-correct cluster/match counts."""
    import datetime as dt

    from company_name_matching_spark.sources import fixtures

    def pages(rows):
        data = [
            (u, dt.datetime(2026, 1, 1), fixtures.render_html(t), t, "vi", "x", "k")
            for u, t in rows
        ]
        return spark.createDataFrame(data, fixtures.PAGES_SCHEMA)

    cases = {
        "empty": ([], 0, 0),
        "single": ([("u1", "CÔNG TY TNHH MỘT MÌNH")], 1, 0),
        "identical": (
            [(f"u{i}", "CÔNG TY TNHH GIỐNG NHAU") for i in range(5)], 1, 10
        ),
        "all_invalid": ([("u1", ""), ("u2", "##$%"), ("u3", "ab")], 0, 0),
    }
    for name, (rows, want_clusters, want_matches) in cases.items():
        res = run_pipeline(spark, pages(rows))
        got_c = res.clusters.select("cluster_id").distinct().count()
        got_m = res.matches.count()
        assert (got_c, got_m) == (want_clusters, want_matches), (
            f"{name}: got clusters={got_c} matches={got_m}"
        )


def test_pipeline_pivot_method_and_golden(spark):
    """cluster_method='pivot' + emit_golden: labels well-formed (one label
    per record, exact-duplicate groups never split, every cluster id is a
    member of its own cluster), and the golden table is one canonical row
    per cluster whose member counts sum to the corpus."""
    from company_name_matching_spark.plans.pipeline import (
        PipelineConfig, run_pipeline,
    )

    pages = fixtures.pages_dataframe(spark, n_companies=40, per_company=4)
    cfg = PipelineConfig(cluster_method="pivot", emit_golden=True)
    res = run_pipeline(spark, pages, cfg=cfg)
    rows = res.clusters.collect()
    n_pages = pages.count()
    assert len(rows) == n_pages
    assert len({r.record_id for r in rows}) == n_pages
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cluster_id, set()).add(r.record_id)
    # every cluster id labels itself (a real pivot / self-cluster)
    for cid, members in by_c.items():
        assert cid in members
    # exact-duplicate groups co-cluster
    mk = {r.record_id: r.match_key
          for r in res.names.select("record_id", "match_key").collect()}
    lab = {r.record_id: r.cluster_id for r in rows}
    from collections import defaultdict
    groups = defaultdict(set)
    for rid, k in mk.items():
        groups[k].add(lab[rid])
    assert all(len(v) == 1 for v in groups.values())
    # golden: one row per cluster, membership accounted exactly
    g = res.golden.collect()
    assert len(g) == len(by_c)
    assert sum(r.n_records for r in g) == n_pages
    assert all(r.canonical_name for r in g)


def test_pipeline_rejects_unknown_cluster_method(spark):
    import pytest as _pytest

    from company_name_matching_spark.plans.pipeline import (
        PipelineConfig, run_pipeline,
    )

    pages = fixtures.pages_dataframe(spark, n_companies=5, per_company=2)
    with _pytest.raises(ValueError, match="cluster_method"):
        run_pipeline(spark, pages, cfg=PipelineConfig(cluster_method="x"))
