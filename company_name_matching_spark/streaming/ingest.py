"""Structured Streaming ingestion for the record-linkage pipeline.

The batch pipeline is the system of record (the reference has no streaming
at all — SURVEY.md §2.11); this module adds the incremental-ingest path a
production deployment needs: new pages stream in, are normalized and
blocked incrementally, and pair generation runs **new-vs-all** instead of
all-vs-all (a left-anti resume against already-scored pairs).

Shape: ``readStream`` (any streaming source with the pages schema) →
``foreachBatch`` → per-microbatch incremental merge. foreachBatch is chosen
over stateful streaming operators deliberately: the pair join needs the full
historical block table, which lives in the checkpoint store, not in
executor state. Watermarking applies upstream (late pages are just new
records — record identity is the url hash, so replays are idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from company_name_matching_spark.operators import blocking, normalize


N_BLOCK_BUCKETS = 64


class IncrementalLinker:
    """foreachBatch handler: maintains cumulative names AND blocks stores
    and emits candidate pairs involving at least one new record per
    micro-batch.

    Per-batch cost is O(batch), not O(corpus): MinHash signatures are
    computed ONLY for the batch's new records and appended to a persistent
    blocks table (never recomputed — the round-1 version re-blocked the full
    history every batch, a fatal scale bug for continuous ingest). The
    blocks store is hash-partitioned on ``pmod(xxhash64(block_key), 64)``;
    the pair join statically prunes the store to the batch's buckets (≤64
    literal values collected driver-side) before the exact block_key join,
    so a small batch touches a small fraction of stored files."""

    def __init__(self, store_dir: str, cfg: blocking.BlockingConfig | None = None):
        self.store_dir = store_dir
        self.cfg = cfg or blocking.BlockingConfig()

    def _names_path(self) -> str:
        return f"{self.store_dir}/names"

    def _blocks_path(self) -> str:
        return f"{self.store_dir}/blocks"

    def process_batch(self, pages_batch: DataFrame, batch_id: int) -> DataFrame:
        """Normalize the batch, merge into the stores (idempotent on
        record_id), and return new candidate pairs (new×all ∪ new×new)."""
        spark = pages_batch.sparkSession
        new_names = normalize.normalize_pages(pages_batch)
        try:
            old_names = spark.read.parquet(self._names_path())
            seen = True
        except Exception:
            seen = False

        if seen:
            # idempotent merge: drop records already ingested (url-hash id)
            new_names = new_names.join(
                old_names.select("record_id"), "record_id", "left_anti"
            )
        from company_name_matching_spark.sources.store import materialize

        # parquet barrier (not localCheckpoint): replayable on executor loss
        new_names = materialize(new_names, "ingest_names")

        # block ONLY the new records; append their blocks to the store.
        # Write order matters under at-least-once foreachBatch: blocks go
        # FIRST. A crash between the two appends then leaves blocks-without-
        # names — harmless, since the replay's anti-join (keyed on the names
        # store) re-emits those records and the pair join runs through
        # new_blocks either way (duplicate stored block rows collapse in the
        # pair dropDuplicates). The reverse order (names first) would mark
        # records as seen while their blocks were never persisted, so they
        # could never pair with future batches.
        new_blocks = (
            blocking.generate_blocks(new_names, self.cfg)
            .withColumn(
                "bucket", F.pmod(F.xxhash64("block_key"), F.lit(N_BLOCK_BUCKETS))
            )
        )
        new_blocks = materialize(new_blocks, "ingest_blocks")
        new_blocks.write.mode("append").partitionBy("bucket").parquet(
            self._blocks_path()
        )
        new_names.write.mode("append").parquet(self._names_path())

        # bounded driver-side metadata: the batch's bucket ids (≤64 values)
        # → static partition pruning of the stored blocks table
        buckets = [
            r["bucket"] for r in new_blocks.select("bucket").distinct().collect()
        ]
        stored = spark.read.parquet(self._blocks_path()).where(
            F.col("bucket").isin(buckets)
        )
        # restrict to the batch's exact block keys (broadcast — one batch's
        # key set is small), then apply the hot-block cap on the matched
        # subset: all stored rows of a matched key are present, so per-key
        # counts equal true block sizes
        matched = stored.join(
            F.broadcast(new_blocks.select("bucket", "block_key").dropDuplicates()),
            ["bucket", "block_key"],
        )
        # dedupe BEFORE the size filter: a crash-replay append (blocks are
        # written before names, by design) can leave duplicate stored rows,
        # and filter_blocks counts rows — duplicated rows would inflate a
        # block past the hot cap and silently drop legitimate pairs
        matched = blocking.filter_blocks(
            matched.select("block_key", "record_id").dropDuplicates(), self.cfg
        )
        pairs = (
            new_blocks.select("block_key", "record_id").alias("l")
            .join(matched.alias("r"), "block_key")
            .where(F.col("l.record_id") != F.col("r.record_id"))
            .select(
                F.least("l.record_id", "r.record_id").alias("left_id"),
                F.greatest("l.record_id", "r.record_id").alias("right_id"),
            )
            .dropDuplicates(["left_id", "right_id"])
        )
        return pairs


def stream_pages(
    spark,
    source_df: DataFrame,
    store_dir: str,
    pairs_sink_dir: str,
    cfg: blocking.BlockingConfig | None = None,
    trigger_once: bool = True,
):
    """Wire a streaming pages DataFrame through the incremental linker.

    ``source_df`` must be a streaming DataFrame with the pages schema.
    Returns the StreamingQuery. With ``trigger_once`` the query drains
    available input and stops — the testable/batch-backfill mode.
    """
    linker = IncrementalLinker(store_dir, cfg)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = linker.process_batch(batch_df, batch_id)
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            pairs_sink_dir
        )

    writer = source_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", f"{store_dir}/_stream_checkpoint"
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
