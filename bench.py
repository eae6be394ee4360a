#!/usr/bin/env python
"""Benchmark entry point (driver contract).

Headline workload: the full record-linkage pipeline (normalize → block →
score → cluster) over a deterministically synthesized Common-Crawl-shaped
``pages`` corpus sized to the scale factor, reporting
candidate-pairs-scored/sec — the BASELINE.md throughput metric. Plus wall
times for representative entry queries at ``$SPARK_GRAFT_SF_DIR``.

Prints ONE JSON line:
  {"metric": "er_pipeline_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "pairs_scored": N, "pairs_per_sec": N,
   "pages": N, "cpus": N, "scaling": {...when scripts/bench_scaling.py ran}}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# one long-lived JVM runs the ER pipeline AND every query: at 32 threads an
# 8g heap GC-thrashes on the later heavy joins (measured 2x slowdowns);
# 16g removes the artifact (the box has 125 GB)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

# queries worth timing at the bench scale (mix of agg/join/window/UDF/pair ops)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "top_customer_per_nation",
    "events_sessionize",
    "norm_clean_names",
    "text_stats",
    "docs_fingerprint_groups",
    "docs_jaccard_neardup",
    "docs_minhash_neardup",
    "emb_neardup",
    "ann_topk",
    "ann_ivf_topk",
    "tfidf_rerank_parts",
    "dup_group_names",
    # round-4 operators
    "docs_winnow_neardup",
    "docs_char_lm_quality",
    "er_cluster_fuzzy_parts",
    # round-5 operators
    "docs_repetition_signals",
    "pages_extract_text",
    "docs_decontaminate",
    "docs_c4_line_clean",
    "fs_match_parts",
    "parts_metablocking",
    "er_cluster_pivot_docs",
    "er_vmeasure_parts",
]


def _sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _mem_probe(_):
    """Framework-free memory-bandwidth probe (same kernel as
    scripts/bench_scaling.py's ceiling microbench)."""
    import numpy as np
    import pandas as pd

    t0 = time.monotonic()
    s = pd.Series(["tnhh son ha viet nam so %d x" % i for i in range(60000)])
    for _ in range(6):
        s.str.replace(r"\b(son|nam)\b", "xx", regex=True)
        a = np.arange(3_000_000, dtype=np.float64)
        ((a * 1.7 + 3) % 97.0).sum()
    return time.monotonic() - t0


def host_calibration() -> dict:
    """One cheap framework-free probe so every bench JSON is
    self-calibrating: sandbox VMs differ by several x in memory bandwidth
    across sessions (round 5 measured a 5.7x generation gap at 32 busy
    cores), so absolute seconds are only comparable WITHIN a matching
    calibration. Reference points from prior rounds' hosts are included
    for the reader."""
    import multiprocessing as mp

    with mp.Pool(8) as p:
        times = p.map(_mem_probe, range(8))
    return {
        "mem_bound_per_task_s_8busy": round(sum(times) / len(times), 2),
        "reference_hosts_8busy": {"r4": 3.61, "r5": 7.93},
    }


def main() -> None:
    import __spark_entry__ as entrymod
    from company_name_matching_spark.plans.pipeline import run_pipeline
    from company_name_matching_spark.session import get_spark
    from company_name_matching_spark.sources import fixtures

    sf = _sf_of(SF_DIR)
    calib = host_calibration()  # before the JVM exists: pure-host numbers
    spark = get_spark(app_name="bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # --- headline: ER pipeline over synthesized pages scaled to sf ---
    n_companies = 800
    per_company = 6
    base_rows = None  # computed from generator determinism below
    target_pages = max(400, int(400_000 * sf))
    # one fixture unit ≈ n_companies * (1 + per_company) rows
    unit = n_companies * (1 + per_company)
    upsample = max(1, math.ceil(target_pages / unit))
    from company_name_matching_spark.sources.store import materialize

    pages = materialize(
        fixtures.pages_dataframe(
            spark, n_companies=n_companies, per_company=per_company,
            upsample=upsample, partitions=2 * CPUS,
        ),
        "bench_pages",
    )
    n_pages = pages.count()

    # best-of-3 with FRESH checkpoint dirs each run (a shared dir would
    # resume instead of recompute); host drift is ±30% over minutes and
    # the driver records a single bench invocation, so the extra repeat is
    # cheap variance insurance on the headline
    import tempfile

    import shutil

    er_sec = None
    for _ in range(3):
        ckdir = tempfile.mkdtemp(prefix="bench_er_", dir="/dev/shm")
        t0 = time.monotonic()
        res = run_pipeline(spark, pages, checkpoint_dir=ckdir)
        pairs_scored = res.matches.count()
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        dt = time.monotonic() - t0
        er_sec = dt if er_sec is None or dt < er_sec else er_sec
        # RAM-backed scratch: drop each run's checkpoint before the next
        # (three retained copies would sit in tmpfs through the per-query
        # timing phase)
        shutil.rmtree(ckdir, ignore_errors=True)

    # --- per-query timings at the sf dir ---
    # best-of-2: this host's throughput drifts ±30% over minutes (see
    # BENCH.md); min of two runs is the least-contaminated estimate
    queries = entrymod.queries()
    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            _materialize(queries[name](spark, SF_DIR))
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        qtimes[name] = round(best, 3)

    out = {
        "metric": "er_pipeline_sec",
        "value": round(er_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "pages": n_pages,
        "pairs_scored": pairs_scored,
        "pairs_per_sec": round(pairs_scored / er_sec, 1) if er_sec > 0 else None,
        "clusters": n_clusters,
        "cpus": CPUS,
        "host_calibration": calib,
    }
    # Compact scaling summary ONLY (round-2 lesson: embedding the full
    # bench_scaling.json blob pushed this line past the driver's tail
    # capture and the headline was recorded as parsed:null). Full detail
    # stays in bench_scaling.json on disk.
    scaling_file = Path(__file__).parent / "bench_scaling.json"
    if scaling_file.exists():
        try:
            blob = json.loads(scaling_file.read_text())
            compact: dict = {}
            for key in ("strong_2_to_8", "strong_8_to_32",
                        "weak_1_to_4", "weak_2_to_8", "weak_8_to_32"):
                if key in blob and isinstance(blob[key], dict):
                    compact[key] = round(blob[key].get("efficiency", float("nan")), 3)
            levels = blob.get("levels", {})
            if isinstance(levels, dict):
                compact["pairs_per_sec_by_cpus"] = {
                    k: round(v.get("pairs_per_sec", 0.0), 1)
                    for k, v in levels.items()
                    if isinstance(v, dict)
                }
            out["scaling"] = compact
        except Exception:
            pass
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
