"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schema, partition-preserving
``mapInPandas``, Arrow batch shapes — is real and tested; the actual media
decoding is STUBBED (``NotImplementedError`` for non-text formats) because
the decode libraries are not available in this container. A production
deployment swaps ``_decode_batch`` for a real decoder; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "content_id long, payload binary, format string, n_bytes int, checksum string"
)

FEATURE_SCHEMA = (
    "content_id long, format string, n_bytes int, feature_dim int, "
    "features array<double>"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", fmt: str = "txt") -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata —
    the shape a real multimodal table has (payload column is format-agnostic)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("content_id"),
        payload.alias("payload"),
        F.lit(fmt).alias("format"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of payloads into fixed-dim features.

    STUB: only ``txt`` payloads are decodable in this container (image/audio
    decoders are not installed). The deterministic fake for txt keeps the
    end-to-end pipeline testable; unknown formats fail loudly.
    """
    feats = []
    for fmt, payload in zip(pdf["format"], pdf["payload"]):
        if fmt != "txt":
            raise NotImplementedError(
                f"decoder for format {fmt!r} not available in this environment"
            )
        raw = bytes(payload or b"")
        text = raw.decode("utf-8", errors="replace")
        toks = text.split()
        feats.append(
            [
                float(len(raw)),
                float(len(toks)),
                float(len(set(toks))),
                float(sum(map(len, toks)) / len(toks)) if toks else 0.0,
            ]
        )
    return pd.DataFrame(
        {
            "content_id": pdf["content_id"],
            "format": pdf["format"],
            "n_bytes": pdf["n_bytes"],
            "feature_dim": [len(f) for f in feats],
            "features": feats,
        }
    )


def extract_features(binary_df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    ``mapInPandas`` (Arrow batch iterator — the pattern a real image
    decoder/resizer/frame-sampler plugs into)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return binary_df.mapInPandas(gen, schema=FEATURE_SCHEMA)
