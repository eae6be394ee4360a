#!/usr/bin/env python
"""spark-submit entry point for the record-linkage pipeline.

Production launch (cluster):

    python scripts/make_dist.py   # builds dist/company_name_matching_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/company_name_matching_spark.zip \
        scripts/run_pipeline.py \
        --input /path/to/pages --checkpoint /path/to/ck --output /path/to/out

Sandbox launch (this environment, local[N] masters):

    spark-submit --master local[8] --driver-memory 8g --py-files dist/company_name_matching_spark.zip \
        scripts/run_pipeline.py --fixture-pages 800 --upsample 8

The job reads a pages table (url, warc_ts, html, text, lang), runs
normalize → block → score → cluster with per-stage checkpoints, and writes
the clusters table plus the metrics table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path (url,warc_ts,html,text,lang)")
    ap.add_argument("--fixture-pages", type=int, default=0,
                    help="synthesize N companies of fixture pages instead of --input")
    ap.add_argument("--upsample", type=int, default=1)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--cluster-method", choices=("cc", "pivot"), default="cc",
                    help="transitive components (reference semantics) or "
                         "ACN pivot clustering (star clusters, no chain "
                         "over-merge)")
    ap.add_argument("--golden", action="store_true",
                    help="also emit the golden-record survivorship table")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from company_name_matching_spark.plans.pipeline import (
        PipelineConfig, run_pipeline,
    )
    from company_name_matching_spark.sources import fixtures

    # under spark-submit a session already exists; standalone, build one
    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
    else:
        from company_name_matching_spark.session import get_spark

        spark = get_spark(app_name="run-pipeline", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.fixture_pages:
        pages = fixtures.pages_dataframe(
            spark, n_companies=args.fixture_pages, per_company=6,
            upsample=args.upsample,
        )
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --fixture-pages")

    t0 = time.monotonic()
    cfg = PipelineConfig(
        cluster_method=args.cluster_method, emit_golden=args.golden
    )
    res = run_pipeline(spark, pages, checkpoint_dir=args.checkpoint, cfg=cfg)
    pairs = res.matches.count()
    clusters = res.clusters.select("cluster_id").distinct().count()
    sec = time.monotonic() - t0
    if args.output:
        res.clusters.write.mode("overwrite").parquet(args.output)
    print(json.dumps({
        "pairs_scored": pairs,
        "clusters": clusters,
        "sec": round(sec, 2),
        "pairs_per_sec": round(pairs / sec, 1) if sec else None,
        "stages": [
            {k: m[k] for k in ("stage", "rows", "elapsed_s", "resumed")}
            for m in res.metrics
        ],
    }))


if __name__ == "__main__":
    main()
