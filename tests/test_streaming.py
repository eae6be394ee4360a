"""Incremental (Structured Streaming) ingestion test: two micro-batches of
pages flow through foreachBatch; pairs accumulate incrementally and replays
are idempotent."""

import datetime as dt

from pyspark.sql import functions as F

from company_name_matching_spark.sources import fixtures
from company_name_matching_spark.streaming.ingest import IncrementalLinker


def _pages(spark, rows):
    data = [
        (u, dt.datetime(2026, 1, 1), fixtures.render_html(t), t, "vi", "x", "k")
        for u, t in rows
    ]
    return spark.createDataFrame(data, fixtures.PAGES_SCHEMA)


def test_incremental_linker(spark, tmp_path):
    store = str(tmp_path / "store")
    linker = IncrementalLinker(store)

    b1 = _pages(spark, [("u1", "CÔNG TY TNHH SƠN HÀ VN"), ("u2", "cty tnhh son ha vn")])
    p1 = linker.process_batch(b1, 0)
    assert p1.count() == 1  # the two variants pair up

    # batch 2: one more variant of the same entity + one unrelated company
    b2 = _pages(spark, [("u3", "CO.,LTD SON HA VN"), ("u4", "CP HOÀN TOÀN KHÁC")])
    p2 = linker.process_batch(b2, 1)
    # new record u3 pairs with both old records; u4 pairs with nothing
    assert p2.count() == 2
    ids = spark.read.parquet(f"{store}/names")
    assert ids.count() == 4

    # replay batch 2 (at-least-once delivery) → idempotent: no new names,
    # and pair output only involves previously-known records (no dupes added)
    p2b = linker.process_batch(b2, 2)
    assert spark.read.parquet(f"{store}/names").count() == 4
    assert p2b.count() == 0  # nothing new → no new-vs-all pairs


def test_streaming_foreachbatch_end_to_end(spark, tmp_path):
    """Drive the real writeStream path with a file streaming source."""
    from company_name_matching_spark.streaming.ingest import stream_pages

    src = tmp_path / "src"
    pages = _pages(
        spark,
        [("s1", "CÔNG TY TNHH AN PHÁT BẮC"), ("s2", "cong ty tnhh an phat bac"),
         ("s3", "TNHH AN PHÁT BẮC")],
    )
    pages.write.mode("overwrite").parquet(str(src))
    stream_df = spark.readStream.schema(pages.schema).parquet(str(src))
    q = stream_pages(
        spark, stream_df, str(tmp_path / "store2"), str(tmp_path / "pairs")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "pairs"))
    assert out.count() == 3  # 3 mutually-matching variants → 3 pairs
    assert set(out.columns) == {"left_id", "right_id", "batch_id"}
