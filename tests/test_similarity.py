import math

import numpy as np
import pytest

from company_name_matching_spark.functions import similarity as sim


def test_char_ngrams():
    assert sim.char_ngrams("abcd") == ["abc", "bcd"]
    assert sim.char_ngrams("ab") == ["ab"]
    assert sim.char_ngrams("abc") == ["abc"]
    assert sim.char_ngrams("") == []


def test_jaro_winkler_known_values():
    # canonical textbook values
    assert sim.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert sim.jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert sim.jaro_winkler("abc", "abc") == 1.0
    assert sim.jaro_winkler("", "abc") == 0.0
    assert sim.jaro_winkler("abc", "xyz") == 0.0


def test_jaro_winkler_batch_matches_scalar():
    left = ["tnhh son ha", "cp viet nam", ""]
    right = ["tnhh ha son", "cp viet nam so 1", "x"]
    out = sim.jaro_winkler_batch(left, right)
    for i in range(3):
        assert out[i] == pytest.approx(sim.jaro_winkler(left[i], right[i]))


def test_tfidf_vector_and_cosine():
    corpus = ["tnhh son ha", "tnhh ha son", "cp viet nam"]
    # build idf by hand: df over distinct grams per doc
    from collections import Counter

    df_counts = Counter()
    for doc in corpus:
        df_counts.update(set(sim.char_ngrams(doc)))
    idf = {
        g: (i, sim.smooth_idf(df_counts[g], len(corpus)))
        for i, g in enumerate(sorted(df_counts))
    }
    i0, v0 = sim.tfidf_vector(corpus[0], idf)
    assert np.linalg.norm(v0) == pytest.approx(1.0)
    # identical string → cosine 1
    i1, v1 = sim.tfidf_vector(corpus[0], idf)
    assert sim.sparse_cosine(
        np.array(i0), np.array(v0), np.array(i1), np.array(v1)
    ) == pytest.approx(1.0)
    # disjoint-ish strings → low cosine
    i2, v2 = sim.tfidf_vector(corpus[2], idf)
    c = sim.sparse_cosine(np.array(i0), np.array(v0), np.array(i2), np.array(v2))
    assert 0.0 <= c < 0.2
    # empty / unseen
    assert sim.tfidf_vector("", idf) == ([], [])
    assert sim.sparse_cosine(np.array([]), np.array([]), np.array(i0), np.array(v0)) == 0.0


def test_smooth_idf_monotone():
    assert sim.smooth_idf(1, 100) > sim.smooth_idf(50, 100) > sim.smooth_idf(100, 100)
    assert sim.smooth_idf(100, 100) == pytest.approx(1.0 + math.log(101 / 101))
