"""Table catalog: versioned parquet tables with Iceberg-shaped maintenance.

The production target is Iceberg (``writeTo(...).using("iceberg")``,
``CALL rewrite_data_files`` / ``expire_snapshots``, ``MERGE INTO`` — the
reference's Delta equivalents live in ``utils/delta_utils.py:13-186``). This
runtime has no Iceberg jar, so the same lifecycle is provided over parquet
directories with snapshot metadata — the pipeline code is storage-agnostic
through this module.

Layout per table (Iceberg-style manifests: data directories are IMMUTABLE;
a snapshot is a *list of data dirs*, so append commits are O(new data) —
they write one new dir and extend the manifest, never rewriting history)::

    <root>/<name>/data-00000/   parquet files (immutable once committed)
    <root>/<name>/data-00001/
    <root>/<name>/_meta.json    {"current": 1, "snapshots":
                                 [{"id": 0, "dirs": ["data-00000"], ...},
                                  {"id": 1, "dirs": ["data-00000",
                                                     "data-00001"], ...}]}

Writes are write-new-files-then-flip-pointer (atomic at the metadata level,
like an Iceberg commit). Time travel reads any retained snapshot's dir set.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _strip_nullability(t):
    """Drop nullable/containsNull/valueContainsNull flags from a schema
    type JSON, recursively. A parquet round-trip flips containsNull on
    array columns (false→true), so comparing raw type JSON would falsely
    reject routine appends whose data came back through spark.read.parquet
    — nullability is writer-irrelevant for this catalog's append check."""
    if isinstance(t, dict):
        return {
            k: _strip_nullability(v)
            for k, v in t.items()
            if k not in ("nullable", "containsNull", "valueContainsNull")
        }
    if isinstance(t, list):
        return [_strip_nullability(x) for x in t]
    return t


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

    def _data_dir(self, name: str, idx: int) -> Path:
        return self.root / name / f"data-{idx:05d}"

    def _next_data_idx(self, meta: dict) -> int:
        used = [int(d.split("-")[1]) for s in meta["snapshots"] for d in s["dirs"]]
        return max(used) + 1 if used else 0

    def _snapshot(self, meta: dict, snap_id: int) -> dict:
        for s in meta["snapshots"]:
            if s["id"] == snap_id:
                return s
        raise FileNotFoundError(f"snapshot {snap_id} not found")

    # -- core ops ----------------------------------------------------------
    def create_table(self, spark: SparkSession, name: str,
                     schema: str | None = None) -> int | None:
        """Explicit CREATE TABLE IF NOT EXISTS (S9; the reference's
        ``delta_utils.create_table_if_not_exists``, delta_utils.py:111-151):
        no-op when the table exists, otherwise commits an EMPTY snapshot
        with the given DDL schema (e.g. ``"id BIGINT, name STRING"``)."""
        if self._meta(name)["current"] >= 0:
            return None
        empty = spark.createDataFrame([], schema or "id BIGINT")
        return self.write(name, empty, mode="overwrite")

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> int:
        """Commit a new snapshot (S5 analog).

        ``append`` writes ONLY the new rows into a fresh immutable data dir
        and extends the manifest — O(new data), the Iceberg append shape.
        ``overwrite`` starts a fresh dir set.

        Appends inherit the table's partition spec: a snapshot's dir set is
        read as multiple parquet roots, so mixing hive-partitioned and flat
        dirs in one snapshot would break partition-column discovery. An
        append with no explicit ``partition_by`` reuses the current
        snapshot's; an explicit mismatch is rejected (Iceberg requires a
        spec-evolution DDL for that, which this catalog doesn't model).
        """
        meta = self._meta(name)
        schema_json_out = df.schema.json()
        if mode == "append" and meta["current"] >= 0:
            cur = self._snapshot(meta, meta["current"])
            # append snapshots re-commit the TABLE's schema, not the
            # appender's: the check below proves them equivalent, but a
            # field-order-differing append must not silently reorder
            # read()'s column order for the whole table (r4 review)
            schema_json_out = cur.get("schema_json") or schema_json_out
            cur_spec = cur.get("partition_by", [])
            if partition_by is None:
                partition_by = cur_spec or None
            elif list(partition_by) != list(cur_spec):
                raise ValueError(
                    f"append partitioning {partition_by} != table spec {cur_spec}"
                )
            # schema invariant: read() pins the manifest schema over every
            # root, so a drifting append would otherwise surface as SILENT
            # null-fill / column loss instead of an error (r4 review).
            # Field order is writer-irrelevant; names+types must match.
            cur_schema = cur.get("schema_json")
            if not cur_schema:
                # legacy (pre-schema_json) snapshot: infer the TABLE's
                # schema from an existing root so the same names+types
                # gate still applies — otherwise the first append to a
                # legacy table would commit the APPENDER's schema as
                # authoritative and read() would pin it, turning drift
                # into silent null-fill instead of a loud error
                # (ADVICE r5). The inferred table schema, not the
                # appender's, is what gets committed.
                legacy_root = str(self.root / name / cur["dirs"][0])
                cur_schema = (
                    df.sparkSession.read.parquet(legacy_root).schema.json()
                )
                schema_json_out = cur_schema
            if cur_schema:
                want = {
                    (f["name"], json.dumps(_strip_nullability(f["type"]),
                                           sort_keys=True))
                    for f in json.loads(cur_schema)["fields"]
                }
                got = {
                    (f["name"], json.dumps(_strip_nullability(f["type"]),
                                           sort_keys=True))
                    for f in json.loads(df.schema.json())["fields"]
                }
                if got != want:
                    raise ValueError(
                        f"append schema {sorted(n for n, _ in got)} does not "
                        f"match table schema {sorted(n for n, _ in want)} "
                        "(names+types must be identical; this catalog does "
                        "not model schema evolution)"
                    )
        snap = meta["current"] + 1
        idx = self._next_data_idx(meta)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(self._data_dir(name, idx)))
        new_dir = self._data_dir(name, idx).name
        if mode == "append" and meta["current"] >= 0:
            dirs = list(self._snapshot(meta, meta["current"])["dirs"]) + [new_dir]
        else:
            dirs = [new_dir]
        meta["snapshots"].append(
            {"id": snap, "ts": time.time(), "op": mode, "dirs": dirs,
             "partition_by": partition_by or [],
             # authoritative read schema (Iceberg keeps schema in table
             # metadata): read() pins every root to it, so partition-column
             # TYPE inference never runs per-root — values like '01' vs
             # '1a' across appends can't infer different types and break
             # or silently widen the union (ADVICE r4)
             "schema_json": schema_json_out}
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
        snapshot_meta = self._snapshot(meta, snap)
        dirs = snapshot_meta["dirs"]
        paths = [str(self.root / name / d) for d in dirs]
        # the manifest's write-time schema is authoritative (Iceberg keeps
        # schema in table metadata): pinning it means partition-column TYPE
        # inference never runs, so values like '01' vs '1a' across appends
        # can't infer different types per root and break or silently widen
        # the union — and read-back types always equal written types
        # (ADVICE r4). Pre-r4 manifests lack it → legacy inference.
        schema_json = snapshot_meta.get("schema_json")
        pinned = None
        if schema_json:
            from pyspark.sql.types import StructType

            pinned = StructType.fromJson(json.loads(schema_json))
        if snapshot_meta.get("partition_by") and len(paths) > 1:
            # each data dir is its own hive-partitioned root; a multi-path
            # read has no single basePath, so union per-root scans
            from functools import reduce

            if pinned is None:  # pre-r4 manifest: first root decides
                pinned = spark.read.parquet(paths[0]).schema
            return reduce(
                DataFrame.unionByName,
                [spark.read.schema(pinned).parquet(p) for p in paths],
            )
        reader = spark.read.schema(pinned) if pinned is not None else spark.read
        return reader.parquet(*paths)

    def compact(self, spark: SparkSession, name: str,
                target_partitions: int | None = None,
                sort_by: list[str] | None = None) -> int:
        """Rewrite data files: coalesce small files, optionally sort
        (Iceberg ``rewrite_data_files`` + sort_order; Delta OPTIMIZE/Z-order
        analog — reference ``delta_utils.py:61-85``). Produces a
        single-dir snapshot; old dirs stay referenced by old snapshots
        until expire_snapshots reclaims them."""
        df = self.read(spark, name)
        n = target_partitions or max(1, df.rdd.getNumPartitions() // 4)
        if sort_by:
            df = df.repartitionByRange(n, *[F.col(c) for c in sort_by])
            df = df.sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n)
        return self.write(name, df, mode="overwrite")

    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots and delete data
        dirs no longer referenced by any retained snapshot (Iceberg
        ``expire_snapshots``; Delta VACUUM analog — ``delta_utils.py:88-108``)."""
        import shutil

        meta = self._meta(name)
        snaps = sorted(s["id"] for s in meta["snapshots"])
        to_drop = snaps[:-keep_last] if keep_last else snaps
        kept = [s for s in meta["snapshots"] if s["id"] not in to_drop]
        live_dirs = {d for s in kept for d in s["dirs"]}
        dead_dirs = {
            d for s in meta["snapshots"] if s["id"] in to_drop for d in s["dirs"]
        } - live_dirs
        for d in dead_dirs:
            shutil.rmtree(self.root / name / d, ignore_errors=True)
        meta["snapshots"] = kept
        self._commit(name, meta)
        return to_drop

    def merge_insert_missing(self, spark: SparkSession, name: str,
                             updates: DataFrame, key: str) -> int:
        """``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` (the reference's
        only merge shape, ``delta_utils.py:154-186``): left-anti against the
        current snapshot, append ONLY the missing rows as a new data dir —
        O(new data), existing files untouched."""
        try:
            cur = self.read(spark, name)
        except FileNotFoundError:
            return self.write(name, updates)
        fresh = updates.join(cur.select(key), key, "left_anti")
        return self.write(name, fresh, mode="append")
