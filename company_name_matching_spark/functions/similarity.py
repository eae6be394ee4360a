"""Batched string-similarity kernels used inside Arrow pandas UDFs.

rapidfuzz/sklearn are not available in this environment, so the kernels are
implemented directly:

* char-trigram TF-IDF cosine — the distributed analog of the reference's
  sklearn char-ngram TF-IDF (``matcher.py:119-134,282-283``): IDF comes from
  a Spark aggregation over the corpus (``SURVEY.md`` V1/A10), broadcast as a
  plain dict; records carry precomputed L2-normalized sparse vectors so each
  pair scoring is a sparse dot product (computed ONCE per record, not per
  pair).
* Jaro-Winkler — classic definition, short-string loop inside the Arrow
  batch (names are <100 chars; the batch boundary, not the row boundary, is
  the Python-crossing).
* Levenshtein and token-set Jaccard are NOT here: they use Spark-native
  ``F.levenshtein`` / ``array_intersect``+``array_union`` (JVM-side).
"""

from __future__ import annotations

import math

import numpy as np


def char_ngrams(s: str, n: int = 3) -> list[str]:
    """Char n-grams of a cleaned name (sklearn ``analyzer='char'`` behavior:
    no padding; strings shorter than n yield the string itself as one gram)."""
    if not s:
        return []
    if len(s) <= n:
        return [s]
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def smooth_idf(df: int, n_docs: int) -> float:
    """sklearn-style smoothed IDF: ln((1+N)/(1+df)) + 1."""
    return math.log((1.0 + n_docs) / (1.0 + df)) + 1.0


def tfidf_vector(
    s: str, idf: dict[str, tuple[int, float]], n: int = 3
) -> tuple[list[int], list[float]]:
    """Sparse L2-normalized TF-IDF vector of ``s``.

    ``idf`` maps gram → (gram_id, idf_weight); unseen grams are ignored
    (consistent for both sides of a pair since IDF is corpus-global).
    Sublinear TF (1 + ln tf) per the reference's vectorizer config.
    Returns (sorted gram ids, weights).
    """
    grams = char_ngrams(s, n)
    if not grams:
        return [], []
    counts: dict[int, int] = {}
    weights: dict[int, float] = {}
    for g in grams:
        hit = idf.get(g)
        if hit is None:
            continue
        gid, w = hit
        counts[gid] = counts.get(gid, 0) + 1
        weights[gid] = w
    if not counts:
        return [], []
    ids = sorted(counts)
    vals = np.array(
        [(1.0 + math.log(counts[i])) * weights[i] for i in ids], dtype=np.float64
    )
    norm = np.linalg.norm(vals)
    if norm > 0:
        vals = vals / norm
    return ids, vals.tolist()


def sparse_cosine(
    a_idx: np.ndarray, a_val: np.ndarray, b_idx: np.ndarray, b_val: np.ndarray
) -> float:
    """Dot product of two L2-normalized sparse vectors (sorted unique ids)."""
    if len(a_idx) == 0 or len(b_idx) == 0:
        return 0.0
    _, ia, ib = np.intersect1d(a_idx, b_idx, assume_unique=True, return_indices=True)
    if len(ia) == 0:
        return 0.0
    return float(np.dot(a_val[ia], b_val[ib]))


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Classic Jaro-Winkler similarity in [0,1]."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * len2
    matches1: list[str] = []
    # pass 1: greedy matching within window
    match_idx2: list[int] = []
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                matches1.append(c)
                match_idx2.append(j)
                break
    m = len(matches1)
    if m == 0:
        return 0.0
    # transpositions: matched chars of s2 in order
    s2_matches = [s2[j] for j in sorted(match_idx2)]
    t = sum(1 for a, b in zip(matches1, s2_matches) if a != b) / 2.0
    jaro = (m / len1 + m / len2 + (m - t) / m) / 3.0
    # Winkler prefix boost (max 4 chars)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def jaro_winkler_batch(left: "list[str]", right: "list[str]") -> np.ndarray:
    """Jaro-Winkler over a batch of pairs (Arrow-batch granularity)."""
    return np.fromiter(
        (jaro_winkler(a or "", b or "") for a, b in zip(left, right)),
        dtype=np.float64,
        count=len(left),
    )
