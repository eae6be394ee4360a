"""Table catalog: versioned parquet tables with Iceberg-shaped maintenance.

The production target is Iceberg (``writeTo(...).using("iceberg")``,
``CALL rewrite_data_files`` / ``expire_snapshots``, ``MERGE INTO`` — the
reference's Delta equivalents live in ``utils/delta_utils.py:13-186``). This
runtime has no Iceberg jar, so the same lifecycle is provided over parquet
directories with snapshot metadata — the pipeline code is storage-agnostic
through this module.

Layout per table::

    <root>/<name>/snap-00000/   parquet files
    <root>/<name>/snap-00001/
    <root>/<name>/_meta.json    {"current": 1, "snapshots": [...]}

Writes are write-new-snapshot-then-flip-pointer (atomic at the metadata
level, like an Iceberg commit).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def _meta_path(self, name: str) -> Path:
        return self.root / name / "_meta.json"

    def _meta(self, name: str) -> dict:
        p = self._meta_path(name)
        if not p.exists():
            return {"current": -1, "snapshots": []}
        return json.loads(p.read_text())

    def _commit(self, name: str, meta: dict) -> None:
        tmp = self._meta_path(name).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(meta, indent=1))
        tmp.replace(self._meta_path(name))

    def _snap_dir(self, name: str, snap: int) -> Path:
        return self.root / name / f"snap-{snap:05d}"

    # -- core ops ----------------------------------------------------------
    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> int:
        """Write a new snapshot and flip the current pointer (S5 analog)."""
        meta = self._meta(name)
        snap = meta["current"] + 1
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if mode == "append" and meta["current"] >= 0:
            prev = self.read(df.sparkSession, name)
            df = prev.unionByName(df)
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
        writer.parquet(str(self._snap_dir(name, snap)))
        meta["snapshots"].append(
            {"id": snap, "ts": time.time(), "op": mode,
             "partition_by": partition_by or []}
        )
        meta["current"] = snap
        self._commit(name, meta)
        return snap

    def read(self, spark: SparkSession, name: str,
             snapshot: int | None = None) -> DataFrame:
        """Read current (or time-traveled) snapshot (S4 analog)."""
        meta = self._meta(name)
        snap = meta["current"] if snapshot is None else snapshot
        if snap < 0:
            raise FileNotFoundError(f"table {name} does not exist")
        return spark.read.parquet(str(self._snap_dir(name, snap)))

    def compact(self, spark: SparkSession, name: str,
                target_partitions: int | None = None,
                sort_by: list[str] | None = None) -> int:
        """Rewrite data files: coalesce small files, optionally sort
        (Iceberg ``rewrite_data_files`` + sort_order; Delta OPTIMIZE/Z-order
        analog — reference ``delta_utils.py:61-85``)."""
        df = self.read(spark, name)
        n = target_partitions or max(1, df.rdd.getNumPartitions() // 4)
        if sort_by:
            df = df.repartitionByRange(n, *[F.col(c) for c in sort_by])
            df = df.sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n)
        return self.write(name, df, mode="overwrite")

    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[int]:
        """Delete all but the newest ``keep_last`` snapshots (Iceberg
        ``expire_snapshots``; Delta VACUUM analog — ``delta_utils.py:88-108``)."""
        import shutil

        meta = self._meta(name)
        snaps = sorted(s["id"] for s in meta["snapshots"])
        to_drop = snaps[:-keep_last] if keep_last else snaps
        for s in to_drop:
            shutil.rmtree(self._snap_dir(name, s), ignore_errors=True)
        meta["snapshots"] = [s for s in meta["snapshots"] if s["id"] not in to_drop]
        self._commit(name, meta)
        return to_drop

    def merge_insert_missing(self, spark: SparkSession, name: str,
                             updates: DataFrame, key: str) -> int:
        """``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` (the reference's
        only merge shape, ``delta_utils.py:154-186``): left-anti against the
        current snapshot, append the remainder, commit a new snapshot."""
        try:
            cur = self.read(spark, name)
        except FileNotFoundError:
            return self.write(name, updates)
        fresh = updates.join(cur.select(key), key, "left_anti")
        merged = cur.unionByName(fresh)
        return self.write(name, merged, mode="overwrite")
