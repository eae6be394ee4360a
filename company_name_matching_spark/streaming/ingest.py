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


class IncrementalLinker:
    """foreachBatch handler: maintains a cumulative names store and emits
    candidate pairs involving at least one new record per micro-batch."""

    def __init__(self, store_dir: str, cfg: blocking.BlockingConfig | None = None):
        self.store_dir = store_dir
        self.cfg = cfg or blocking.BlockingConfig()
        self._initialized = False

    def _names_path(self) -> str:
        return f"{self.store_dir}/names"

    def process_batch(self, pages_batch: DataFrame, batch_id: int) -> DataFrame:
        """Normalize the batch, merge into the store (idempotent on
        record_id), and return new candidate pairs (new×all ∪ new×new)."""
        spark = pages_batch.sparkSession
        new_names = normalize.normalize_pages(pages_batch)
        try:
            old_names = spark.read.parquet(self._names_path())
            seen = True
        except Exception:
            old_names = None
            seen = False

        if seen:
            # idempotent merge: drop records already ingested (url-hash id)
            new_names = new_names.join(
                old_names.select("record_id"), "record_id", "left_anti"
            )
        new_names = new_names.localCheckpoint(eager=True)
        new_names.write.mode("append").parquet(self._names_path())

        all_names = spark.read.parquet(self._names_path())
        all_blocks = blocking.filter_blocks(
            blocking.generate_blocks(all_names, self.cfg), self.cfg
        )
        new_blocks = blocking.generate_blocks(new_names, self.cfg).join(
            all_blocks.select("block_key").dropDuplicates(), "block_key"
        )
        pairs = (
            new_blocks.alias("l")
            .join(all_blocks.alias("r"), "block_key")
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
