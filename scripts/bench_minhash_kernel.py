#!/usr/bin/env python
"""Interleaved fresh-JVM A/B of the two minhash_pairs signature kernels
("jvm" two-barrier HOF form vs "arrow" fused numpy form) at sf0.1.

The two kernels are bit-identical by construction (same trigram hashes,
same universal-hash integer arithmetic — see blocking.sig_arrow_kernel),
so the pair COUNT is asserted equal every rep and the comparison is pure
wall time. Writes bench_minhash_kernel.json.
"""
import json
import os
import subprocess
import sys
import time

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from company_name_matching_spark.session import get_spark
from company_name_matching_spark.operators import dedup

kernel, sf, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet(f"{sf}/documents.parquet")
t0 = time.time()
n = dedup.minhash_pairs(d, threshold=0.8, kernel=kernel).count()
dt = time.time() - t0
print(json.dumps({"kernel": kernel, "sec": round(dt, 3), "pairs": n}))
spark.stop()
"""


def run(kernel: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, kernel, SF, str(CPUS)],
        capture_output=True, text=True, timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    results = {"jvm": [], "arrow": [], "sf": SF, "cpus": CPUS}
    for rep in range(REPS):
        for kernel in ("jvm", "arrow"):
            r = run(kernel)
            results[kernel].append(r)
            print(f"rep {rep} {kernel}: {r['sec']}s, {r['pairs']} pairs",
                  flush=True)
    pj = {r["pairs"] for r in results["jvm"]} | {
        r["pairs"] for r in results["arrow"]}
    assert len(pj) == 1, f"pair counts diverged: {pj}"
    results["pairs"] = pj.pop()
    results["best"] = {
        k: min(r["sec"] for r in results[k]) for k in ("jvm", "arrow")
    }
    results["speedup_best"] = round(
        results["best"]["jvm"] / results["best"]["arrow"], 3
    )
    with open("/root/repo/bench_minhash_kernel.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["best"]), "speedup:", results["speedup_best"])


if __name__ == "__main__":
    main()
