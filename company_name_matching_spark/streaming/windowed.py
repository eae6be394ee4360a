"""Event-time windowed ingest metrics with late-data handling — the
watermark + windowed-aggregation Structured Streaming pattern (the
incremental linker in ``ingest.py`` covers the foreachBatch/stateful-merge
pattern; this covers the declarative windowed path).

The reference has no streaming at all (SURVEY §2.11); this is the standard
monitoring companion a production crawl-ingest pipeline runs next to the
linker: pages/sec and distinct-URL counts per (event-time window, lang),
tolerant of out-of-order WARC timestamps up to the watermark delay, with
state that Spark can evict (bounded by windows still inside the watermark
— the unbounded-state failure mode of naive streaming groupBys).

Semantics (standard Spark, append mode):

* rows later than ``watermark`` behind the max observed event time are
  DROPPED (counted by Spark's event-time metrics, not silently resurrected
  into closed windows);
* a window's row is emitted exactly once, when the watermark passes the
  window end — so downstream consumers see each (window, lang) exactly
  once and the sink can be append-only parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_page_counts(
    pages: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """pages stream → one row per closed (event-time window, lang):
    (window_start, window_end, lang, n_pages, n_urls).

    Works on both streaming and batch DataFrames (batch ignores the
    watermark — Spark semantics — which gives the test an exact oracle:
    the batch run over ALL non-late rows must equal the union of streamed
    append-mode emissions).
    """
    w = F.window(F.col(ts_col), window_duration)
    return (
        pages.withWatermark(ts_col, watermark_delay)
        .groupBy(w.alias("w"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            # exact distinct via set-state (streaming rejects countDistinct):
            # per-(window,lang) state is bounded by the window's URL count;
            # switch to approx_count_distinct when a single window's URL
            # set no longer fits executor state
            F.size(F.collect_set("url")).alias("n_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_urls",
        )
    )
