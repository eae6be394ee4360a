"""Materialization barrier: write-through-parquet instead of .persist().

Two reasons this is the engine-wide policy:

1. **Scaling.** Spark's in-memory columnar cache (InMemoryRelation) scan
   contends badly at high local thread counts — measured on this workload:
   reading a cached 83k-row names table inside the blocking stage took
   10.6 s at local[8] but **54.2 s at local[32]**, while the identical plan
   reading the same data back from parquet took 7-11 s at both levels.
   Parquet scans scale linearly with cores.
2. **Architecture.** On a real cluster every stage writes its output table
   (Iceberg/parquet) anyway — checkpoint/resume depends on it. Using the
   same mechanism for intra-run reuse keeps one code path.

Temp outputs live under a per-session scratch dir and are removed when the
SparkSession's JVM exits (they sit in java.io.tmpdir-style scratch space).
"""

from __future__ import annotations

import atexit
import itertools
import shutil
import tempfile

from pyspark.sql import DataFrame

_counter = itertools.count()
_scratch: str | None = None


def _scratch_dir() -> str:
    global _scratch
    if _scratch is None:
        # Prefer RAM-backed tmpfs: the barrier write/read must not serialize
        # on a single local disk (on a real cluster this I/O is distributed
        # across node-local disks / object storage).
        import os

        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        _scratch = tempfile.mkdtemp(prefix="cnms-scratch-", dir=base)
        atexit.register(shutil.rmtree, _scratch, ignore_errors=True)
    return _scratch


def materialize(df: DataFrame, label: str = "stage") -> DataFrame:
    """Hard materialization barrier: parquet write + read-back."""
    path = f"{_scratch_dir()}/{label}-{next(_counter)}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def fanout_repartition(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session shuffle width — but ONLY when
    the current scan is narrower (guide §2.5 input skew: repartition right
    after a too-few-splits read, before the work).

    For a MATERIALIZED (parquet-backed) table that is about to fan out into
    a much larger row set (candidate self-join probe, pair expansion), a
    small input is the silent serializer: a few-MB parquet barrier comes
    back as 1-2 splits, the build side of the following join broadcasts,
    and the multi-million-row join output plus its map-side partial
    aggregation all run in those 1-2 tasks (measured on the sf0.1 part
    PPJoin: 14.3 s serial vs 2.6 s repartitioned for the identical 18M-row
    candidate join). At scale the input arrives with >= width splits and
    this is a no-op — no unconditional shuffle is introduced.
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= n_part:
        return df
    return df.repartition(n_part)
