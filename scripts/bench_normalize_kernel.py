#!/usr/bin/env python
"""Normalize-stage kernel A/B: Arrow pandas kernel vs JVM regexp chain.

Fresh JVM per run (the calibration discipline of bench_scaling.py),
interleaved A/B, best-of-N per (kernel, cpus). The workload is the
bench corpus shape (fixtures pages, 800 companies x 6 mentions,
upsampled), and the measured unit is the pipeline's actual normalize
stage: normalize_pages(...) materialized through the parquet barrier.

Usage: python scripts/bench_normalize_kernel.py [upsample] [reps]
Writes bench_normalize_kernel.json.
"""
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from company_name_matching_spark.session import get_spark
from company_name_matching_spark.sources import fixtures
from company_name_matching_spark.sources.store import materialize

cpus = int(sys.argv[1]); upsample = int(sys.argv[2]); kernel = sys.argv[3]
spark = get_spark(app_name=f"normkernel-{{cpus}}-{{kernel}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = materialize(fixtures.pages_dataframe(
    spark, n_companies=800, per_company=6, upsample=upsample,
    partitions=2 * cpus, typos_per_company=2), "pages")
n_pages = pages.count()
from company_name_matching_spark.operators import normalize
t0 = time.monotonic()
names = materialize(normalize.normalize_pages(pages, kernel=kernel), "names")
n = names.count()
sec = time.monotonic() - t0
spark.stop()
print(json.dumps({{"cpus": cpus, "kernel": kernel, "pages": n_pages,
                   "names": n, "sec": round(sec, 2)}}))
"""


def run_once(cpus: int, upsample: int, kernel: str) -> dict:
    script = WORKER.format(root=str(ROOT))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(upsample), kernel],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    upsample = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    runs = []
    for rep in range(reps):
        for cpus in (8, 32):
            for kernel in ("pandas", "auto"):
                r = run_once(cpus, upsample, kernel)
                r["rep"] = rep
                runs.append(r)
                print(json.dumps(r), flush=True)
    best = {}
    for r in runs:
        k = (r["cpus"], r["kernel"])
        if k not in best or r["sec"] < best[k]["sec"]:
            best[k] = r
    summary = {
        f"{c}T_{k}": best[(c, k)]["sec"]
        for c in (8, 32) for k in ("pandas", "auto")
        if (c, k) in best
    }
    for c in (8, 32):
        if (c, "pandas") in best and (c, "auto") in best:
            summary[f"{c}T_speedup"] = round(
                best[(c, "pandas")]["sec"] / best[(c, "auto")]["sec"], 3
            )
    out = {"workload": {"upsample": upsample, "pages": runs[0]["pages"]},
           "runs": runs, "best": summary}
    Path(ROOT / "bench_normalize_kernel.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
