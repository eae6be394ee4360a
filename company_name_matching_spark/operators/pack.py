"""GPT-style sequence packing: lay the corpus out as one global token
stream (doc order = ``id_col``) and cut it into fixed-budget training
examples.

The core primitive is a **distributed exclusive prefix sum** over the
per-document token counts. A naive Spark expression — a window ordered
by doc_id with no partition key — collapses the whole corpus into ONE
task (Spark even warns: "No Partition Defined for Window operation").
At 100 TB that is not slow, it is impossible. This module implements the
classic two-pass parallel scan instead:

  pass 1: range-partition by ``id_col`` and aggregate one token-sum row
          per partition bucket (P rows, P = shuffle parallelism);
  offsets: exclusive-cumsum those P bucket sums — a window over P rows,
          driver-scale no matter the corpus size;
  pass 2: broadcast-join the bucket offsets back and run the in-bucket
          cumsum as a window PARTITIONED by bucket — every task scans
          only its own bucket.

The result is boundary-invariant: wherever the range partitioner cuts,
``bucket_offset + within_bucket_cumsum`` is the same global offset, so
the output is deterministic even though partition boundaries are an
execution detail. The DuckDB oracle states the same thing as the naive
single window — the equivalence IS the correctness claim of the scan.

Reference analogy: the reference repo scores/prepares batches
sequentially (matcher.py processes query lists in order); packing is the
corpus-scale generalization a training pipeline needs before writing
tokenized shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_count_col(text_col):
    """Whitespace token count, Python ``str.split()`` semantics (empty /
    blank strings count 0 — ``split`` artifacts removed)."""
    return F.size(
        F.array_remove(F.split(F.trim(text_col), r"\s+"), "")
    ).cast("long")


def global_exclusive_cumsum(
    df: DataFrame, id_col: str, value_col: str, buckets: int | None = None
) -> DataFrame:
    """Add ``start_offset`` = sum of ``value_col`` over all rows with a
    strictly smaller ``id_col`` — the two-pass distributed scan described
    in the module docstring. ``id_col`` must be unique (it is the total
    order of the stream).
    """
    spark = df.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(buckets, F.col(id_col))
    d = d.withColumn("_bkt", F.spark_partition_id())
    # pass 1: one sum per bucket (P rows)
    sums = d.groupBy("_bkt").agg(F.sum(value_col).alias("_bsum"))
    # exclusive cumsum over P bucket rows: the single-partition window is
    # over P ≈ parallelism rows, not N corpus rows — driver-scale by
    # construction. Buckets are range-partitioned, so bucket id order IS
    # id order.
    w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_bkt", F.coalesce(F.sum("_bsum").over(w), F.lit(0)).alias("_boff")
    )
    # pass 2: in-bucket exclusive cumsum, partitioned (parallel) window
    win = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "start_offset",
            (
                F.col("_boff")
                + F.coalesce(F.sum(value_col).over(win), F.lit(0))
            ).cast("long"),
        )
        .drop("_bkt", "_boff")
    )


def pack_assignments(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document packing plan for fixed-``budget`` training examples.

    Concatenate all documents' whitespace tokens in ``id_col`` order and
    cut the stream every ``budget`` tokens. Each document learns:

    - ``n_tokens``      its own token count
    - ``start_offset``  global position of its first token (exclusive scan)
    - ``example_id``    the example its first token lands in
    - ``n_boundaries``  how many example cuts run through it (0 = intact;
                        long documents span several training examples)

    Shuffle budget: one range exchange + one P-row exchange + the
    broadcast join — independent of how many examples come out.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    d = global_exclusive_cumsum(d, "doc_id", "n_tokens")
    b = F.lit(budget).cast("long")
    first_ex = F.floor(F.col("start_offset") / b)
    last_ex = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / b
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        first_ex.cast("long").alias("example_id"),
        (last_ex - first_ex).cast("long").alias("n_boundaries"),
    )


def pack_examples(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-example summary of the packing plan: how many documents START
    in each example and how many tokens they contribute in total. One
    extra hash aggregation over :func:`pack_assignments` (shuffles on
    example_id, which is dense and unskewed by construction)."""
    a = pack_assignments(docs, budget, id_col, text_col)
    return a.groupBy("example_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )
