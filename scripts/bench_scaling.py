#!/usr/bin/env python
"""Scaling-efficiency bench: same ER workload at two parallelism levels.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) is evidenced in this sandbox by running the identical job at
``local[8]`` and ``local[32]`` in fresh JVMs (subprocesses — one SparkContext
per process) on the same input, reporting throughput at both plus
efficiency = (T_8 / T_32) / 4.

Writes ``bench_scaling.json`` at the repo root (picked up by bench.py) and
refreshes the measurement table in ``BENCH.md``.

Launch shape mirrors production: each subprocess is equivalent to
``spark-submit --master local[N] --py-files dist/pkg.zip scripts/run_pipeline.py``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from company_name_matching_spark.session import get_spark
from company_name_matching_spark.sources import fixtures
from company_name_matching_spark.plans.pipeline import run_pipeline

cpus = int(sys.argv[1])
upsample = int(sys.argv[2])
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = fixtures.pages_dataframe(spark, n_companies=800, per_company=6,
                                 upsample=upsample, partitions=2 * cpus).cache()
n_pages = pages.count()
t0 = time.monotonic()
res = run_pipeline(spark, pages)
pairs = res.matches.count()
clusters = res.clusters.select("cluster_id").distinct().count()
sec = time.monotonic() - t0
spark.stop()
print(json.dumps({{"cpus": cpus, "pages": n_pages, "pairs_scored": pairs,
                   "clusters": clusters, "sec": round(sec, 2),
                   "pairs_per_sec": round(pairs / sec, 1)}}))
"""


def run_level(cpus: int, upsample: int) -> dict:
    script = WORKER.format(root=str(ROOT))
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(upsample)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    upsample = int(os.environ.get("SCALING_UPSAMPLE", "8"))
    low, high = 8, 32
    r_low = run_level(low, upsample)
    r_high = run_level(high, upsample)
    speedup = r_low["sec"] / r_high["sec"]
    efficiency = speedup / (high / low)
    result = {
        "workload": f"ER pipeline, 800 companies x 6 variants, upsample={upsample}",
        "low": r_low,
        "high": r_high,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target_efficiency": 0.8,
    }
    (ROOT / "bench_scaling.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
