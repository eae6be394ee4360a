"""Dense-embedding encode seam — the reference's dense channel
(``matcher.py:267-331``: SentenceTransformer / LSA vectors feeding the
tfidf-rerank / union-rerank / adaptive fusion strategies) re-expressed as
Arrow-batched Spark plumbing with a PLUGGABLE encoder.

No embedding model ships in this environment (no torch), so the default
:func:`hash_encoder` is a deterministic bag-of-hashed-tokens stand-in — it
exercises every piece of the distributed plumbing (batching, schema,
partition shape, cosine scoring, rerank integration) and is NOT a semantic
model. Swapping it for a real model is one function: any
``list[str] -> np.ndarray[n, dim]`` callable works, e.g. a
``SentenceTransformer.encode`` closure or a Spark-ML
``predict_batch_udf``-wrapped torch model. The callable is constructed ON
THE EXECUTOR (lazily, once per worker) via the factory argument, the
standard pattern for shipping model state without serializing it through
the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EncoderFactory = Callable[[], Callable[[list[str]], np.ndarray]]


def hash_encoder(dim: int = 64) -> Callable[[list[str]], np.ndarray]:
    """Deterministic stand-in encoder: L2-normalized bag of hashed tokens.

    Properties that make it a faithful plumbing test double: deterministic
    across processes (md5, not Python hash), permutation-invariant over
    tokens (like mean-pooled embeddings), identical texts → cosine 1.0,
    disjoint token sets → cosine ≈ 0.
    """

    def encode(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in str(t or "").lower().split():
                h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                out[i, h % dim] += 1.0 if (h >> 63) & 1 else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    return encode


def encode_texts(
    df: DataFrame,
    encoder_factory: EncoderFactory | None = None,
    id_col: str = "record_id",
    text_col: str = "name",
    out_col: str = "embedding",
    batch_size: int = 1024,
) -> DataFrame:
    """(id, text) → (id, embedding: array<float>) via ``mapInPandas``.

    Arrow-batched; the encoder is instantiated once per python worker (the
    factory runs executor-side), then applied to ``batch_size`` slices —
    the exact shape a GPU model wants. Output partitioning follows the
    input (no shuffle)."""
    factory = encoder_factory or (lambda: hash_encoder())
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {out_col} array<float>"
    src = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = factory()  # once per worker, executor-side
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                vecs = enc(chunk[text_col].tolist())
                yield pd.DataFrame(
                    {id_col: chunk[id_col].values,
                     out_col: [v for v in np.asarray(vecs, dtype=np.float32)]}
                )

    return src.mapInPandas(run, schema=schema)


def dense_pair_scores(
    left: DataFrame,
    right: DataFrame,
    pairs: DataFrame,
    encoder_factory: EncoderFactory | None = None,
    left_id: str = "query_id",
    right_id: str = "candidate_id",
    left_text: str = "query_text",
    right_text: str = "name",
) -> DataFrame:
    """Dense cosine for given (left, right) id pairs → (ids..., score).

    Encode each side ONCE (not per pair), join vectors to the pair list,
    score with the JVM-native cosine — the distributed twin of the
    reference's dense rerank stage. Compose with ``rank.tfidf_rerank`` /
    ``rank.union_rerank`` as the stage-2 input."""
    from company_name_matching_spark.operators.dedup import cosine_col

    lv = encode_texts(left, encoder_factory, left_id, left_text, "l_v")
    rv = encode_texts(right, encoder_factory, right_id, right_text, "r_v")
    return (
        pairs.join(lv, left_id)
        .join(rv, right_id)
        .select(
            left_id, right_id,
            F.round(cosine_col(F.col("l_v"), F.col("r_v")), 6).alias("score"),
        )
    )


def sentence_transformer_factory(
    model_name: str = "sentence-transformers/paraphrase-multilingual-MiniLM-L12-v2",
) -> EncoderFactory:
    """REAL-model EncoderFactory (VERDICT r5 #7): wraps a
    SentenceTransformer behind the same executor-side-construction
    contract as :func:`hash_encoder`, so ``SearchConfig(model=
    "hybrid_dense", dense_encoder_factory=sentence_transformer_factory())``
    is the one-line swap the seam was built for. The import happens INSIDE
    the inner factory — i.e. on the executor, once per python worker — so
    the driver never serializes model weights and environments without
    torch can still import this module. Raises ImportError at encode time
    when sentence-transformers is absent (this sandbox: documented
    env-limit; the marker-gated test in tests/test_real_models.py
    exercises it wherever torch exists)."""

    def factory() -> Callable[[list[str]], np.ndarray]:
        from sentence_transformers import SentenceTransformer  # executor-side

        model = SentenceTransformer(model_name)

        def encode(texts: list[str]) -> np.ndarray:
            return np.asarray(
                model.encode(
                    [str(t or "") for t in texts],
                    normalize_embeddings=True,
                    show_progress_bar=False,
                ),
                dtype=np.float32,
            )

        return encode

    return factory


# ---------------------------------------------------------------------------
# Cross-encoder seam (SURVEY §2 V11)
# ---------------------------------------------------------------------------

PairScorerFactory = Callable[[], Callable[[list[str], list[str]], np.ndarray]]


def overlap_cross_scorer() -> Callable[[list[str], list[str]], np.ndarray]:
    """Deterministic stand-in cross-encoder: logit = 4·J(tokens_a, tokens_b) − 2
    (hashed-token Jaccard, so logits span [−2, 2] and identical texts hit the
    top). Like :func:`hash_encoder`, this is a plumbing test double — no
    torch in this environment — but it preserves the real model's contract:
    a joint (query, candidate) scorer that CANNOT be factored into two
    independent encodings, which is exactly why it needs its own seam
    (pair-batched, not text-batched)."""

    def score(a_texts: list[str], b_texts: list[str]) -> np.ndarray:
        out = np.zeros(len(a_texts), dtype=np.float64)
        for i, (a, b) in enumerate(zip(a_texts, b_texts)):
            ta = {hashlib.md5(t.encode()).digest()[:8]
                  for t in str(a or "").lower().split()}
            tb = {hashlib.md5(t.encode()).digest()[:8]
                  for t in str(b or "").lower().split()}
            union = len(ta | tb)
            j = (len(ta & tb) / union) if union else 0.0
            out[i] = 4.0 * j - 2.0
        return out

    return score


def cross_encoder_model_factory(
    model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
) -> PairScorerFactory:
    """REAL-model PairScorerFactory (VERDICT r5 #7): the
    :func:`overlap_cross_scorer` drop-in backed by a sentence-transformers
    CrossEncoder. Same executor-side import/construction contract as
    :func:`sentence_transformer_factory`; returns raw logits — the
    JVM-side sigmoid in :func:`cross_encoder_scores` calibrates them."""

    def factory() -> Callable[[list[str], list[str]], np.ndarray]:
        from sentence_transformers import CrossEncoder  # executor-side

        model = CrossEncoder(model_name)

        def score(a_texts: list[str], b_texts: list[str]) -> np.ndarray:
            pairs = [(str(a or ""), str(b or ""))
                     for a, b in zip(a_texts, b_texts)]
            return np.asarray(model.predict(pairs), dtype=np.float64)

        return score

    return factory


def cross_encoder_scores(
    pairs: DataFrame,
    scorer_factory: PairScorerFactory | None = None,
    left_id: str = "query_id",
    right_id: str = "candidate_id",
    left_text: str = "query_text",
    right_text: str = "name",
    batch_size: int = 512,
) -> DataFrame:
    """Score (query, candidate) text pairs with a joint cross-encoder →
    (left_id, right_id, score in (0,1)).

    The reference's cross-encoder rerank (``matcher.py`` sigmoid-calibrated
    logits over its top-k shortlist) as Arrow-batched Spark plumbing: the
    scorer is built once per python worker executor-side, consumes
    pair-batches of the size a GPU wants, and the raw logit is calibrated
    JVM-side with :func:`..functions.calibration.sigmoid`. Apply AFTER a
    cheap shortlist (top-k from lexical fusion) — cross-encoders are
    O(pairs), never a first-stage scorer at 100 TB."""
    from company_name_matching_spark.functions.calibration import sigmoid

    factory = scorer_factory or overlap_cross_scorer
    lt = dict(pairs.dtypes)[left_id]
    rt = dict(pairs.dtypes)[right_id]
    schema = f"{left_id} {lt}, {right_id} {rt}, logit double"
    src = pairs.select(left_id, right_id, left_text, right_text)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = factory()  # once per worker, executor-side
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                logits = scorer(
                    chunk[left_text].tolist(), chunk[right_text].tolist()
                )
                yield pd.DataFrame(
                    {left_id: chunk[left_id].values,
                     right_id: chunk[right_id].values,
                     "logit": np.asarray(logits, dtype=np.float64)}
                )

    scored = src.mapInPandas(run, schema=schema)
    return scored.select(
        left_id, right_id,
        F.round(sigmoid(F.col("logit")), 6).alias("score"),
    )
