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


def test_jaro_winkler_vectorized_bit_identical_to_scalar():
    """The numpy-vectorized batch kernel (VERDICT r5 #4) must be
    BIT-identical (==, not approx) to the scalar reference on edge cases,
    Vietnamese unicode, and a deterministic random corpus of mixed
    lengths — the scalar stays in the file as the executable spec."""
    import random

    cases = [
        ("", ""), (None, None), ("", None),           # empty==empty → 1.0
        ("a", ""), ("", "abc"), ("a", "a"),
        ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
        ("công ty cổ phần", "cong ty co phan"),        # diacritics ≠ ascii
        ("tập đoàn hòa phát", "tập đoàn hoà phát"),
        ("ab", "ba"), ("abcd" * 50, "abdc" * 50),      # long, transposed
        ("x" * 199, "x" * 200),
    ]
    rng = random.Random(5)
    alphabet = "abcdefgh ậđô"
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        cases.append((a, b))
        if rng.random() < 0.2:
            cases.append((a, a))
    left = [c[0] for c in cases]
    right = [c[1] for c in cases]
    got = sim.jaro_winkler_batch(left, right)
    want = np.fromiter(
        (sim.jaro_winkler(a or "", b or "") for a, b in cases),
        dtype=np.float64, count=len(cases),
    )
    mism = [(cases[i], got[i], want[i])
            for i in range(len(cases)) if got[i] != want[i]]
    assert not mism, mism[:5]
    assert sim.jaro_winkler_batch([], []).shape == (0,)


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


# ---------------------------------------------------------------------------
# Monge–Elkan hybrid token similarity (scoring.monge_elkan_col)
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _round_half_up(x: float, nd: int) -> float:
    """Spark/DuckDB ``round`` semantics (HALF_UP on the decimal rendering
    of the double) — python's built-in round is banker's and diverges on
    exact .5 boundaries like 0.9285715."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _me_ref(A, B):
    """Python reference of the directed Monge–Elkan with the engine's exact
    micro-unit arithmetic."""
    if not A or not B:
        return 0.0
    units = 0
    for a in A:
        best = max(1.0 - _lev(a, b) / max(len(a), len(b)) for b in B)
        units += int(_round_half_up(_round_half_up(best, 6) * 1000000.0, 0))
    return _round_half_up(units / 1000000.0 / len(A), 6)


def test_monge_elkan_known_and_random(spark):
    import random

    from pyspark.sql import functions as F

    from company_name_matching_spark.operators.scoring import monge_elkan_col

    vocab = ["cong", "ty", "tnhh", "thuong", "mai", "acme", "corp",
             "global", "glbal", "trading", "tradng", "vn"]
    rng = random.Random(11)
    rows = [
        (["acme", "corp"], ["acme", "corp"]),          # identical -> 1.0
        (["acme", "corp"], ["corp", "acme"]),          # reorder -> 1.0
        (["acme", "trading"], ["acme", "tradng"]),     # per-token typo
        (["a"], ["b"]),                                # disjoint singles
        ([], ["x"]),                                   # empty side -> 0.0
    ] + [
        (rng.sample(vocab, rng.randint(1, 5)),
         rng.sample(vocab, rng.randint(1, 5)))
        for _ in range(30)
    ]
    df = spark.createDataFrame(rows, "l array<string>, r array<string>")
    got = df.select(
        monge_elkan_col(F.col("l"), F.col("r")).alias("me")
    ).collect()
    for (A, B), row in zip(rows, got):
        assert row["me"] == _me_ref(A, B), (A, B)
    # directed asymmetry exists; the symmetrized form is order-free
    me_ab = _me_ref(["acme"], ["acme", "zzz"])
    me_ba = _me_ref(["acme", "zzz"], ["acme"])
    assert me_ab != me_ba


def test_soft_tfidf_known_and_random(spark):
    """scoring.soft_tfidf_pairs vs an exact python reference (IDF, decimal
    L2 norms, nano-unit alignment contributions, symmetrization)."""
    import math
    import random
    from collections import Counter
    from decimal import Decimal

    from company_name_matching_spark.operators.scoring import soft_tfidf_pairs

    def _r(x, nd):
        return _round_half_up(x, nd)

    rng = random.Random(23)
    vocab = ["cong", "ty", "tnhh", "acme", "acmee", "corp", "vn",
             "global", "glbal", "trading", "tradng"]
    names = {1: ["acme", "trading", "co"], 2: ["acme", "tradng", "ltd"],
             3: ["zzz", "co"], 4: ["acme"]}
    nid = 5
    for _ in range(20):
        names[nid] = sorted(set(rng.sample(vocab, rng.randint(1, 4))))
        nid += 1
    pair_ids = [(a, b) for a in names for b in names if a < b][:60]

    N = len(names)
    df_ = Counter(t for toks in names.values() for t in set(toks))
    idf = {t: _r(math.log((1.0 + N) / (1.0 + c)) + 1.0, 9)
           for t, c in df_.items()}

    def weights(toks):
        ssq = sum(Decimal(repr(_r(idf[t] * idf[t], 9))) for t in toks)
        nm = math.sqrt(float(ssq))
        return {t: _r(idf[t] / nm, 9) for t in toks}

    def directed(A, B, theta=0.9):
        wa, wb = weights(A), weights(B)
        units = 0
        for a in A:
            sims = [(_r(1.0 - _lev(a, b) / max(len(a), len(b)), 9), wb[b])
                    for b in B]
            best = max(s for s, _ in sims)
            maxw = max(w for s, w in sims if s == best)
            if best > theta:
                units += int(_r(_r(wa[a] * maxw * best, 9) * 1e9, 0))
        return units

    ndf = spark.createDataFrame(
        [(k, sorted(set(v))) for k, v in names.items()],
        "record_id long, tokens array<string>",
    )
    pdf = spark.createDataFrame(pair_ids, "left_id long, right_id long")
    got = {(r.left_id, r.right_id): r.soft_tfidf
           for r in soft_tfidf_pairs(ndf, pdf).collect()}
    assert len(got) == len(pair_ids)
    for (a, b) in pair_ids:
        A, B = sorted(set(names[a])), sorted(set(names[b]))
        want = _r((directed(A, B) + directed(B, A)) / 1e9 / 2.0, 6)
        assert got[(a, b)] == want, (a, b)
    # rare-token agreement outranks common-token agreement at equal counts
    # (the property TF-IDF weighting exists for): identical rare pair vs
    # identical common pair
    assert idf["zzz"] > idf["acme"]


def test_weighted_jaccard_known_and_random(spark):
    """scoring.weighted_jaccard_pairs vs an exact nano-unit python
    reference; rare-token overlap must outrank common-token overlap."""
    import math
    import random
    from collections import Counter

    from company_name_matching_spark.operators.scoring import (
        weighted_jaccard_pairs,
    )

    rng = random.Random(31)
    vocab = ["tnhh", "co", "acme", "zenit", "corp", "vn", "global",
             "trading", "xyz"]
    names = {1: ["tnhh", "co", "acme"], 2: ["tnhh", "co", "zenit"],
             3: ["acme", "zenit"], 4: ["tnhh", "co"]}
    nid = 5
    for _ in range(15):
        names[nid] = sorted(set(rng.sample(vocab, rng.randint(1, 4))))
        nid += 1
    pair_ids = [(a, b) for a in names for b in names if a < b][:50]

    N = len(names)
    df_ = Counter(t for toks in names.values() for t in set(toks))
    idf = {t: _round_half_up(math.log((1.0 + N) / (1.0 + c)) + 1.0, 9)
           for t, c in df_.items()}
    un = {t: int(_round_half_up(v * 1e9, 0)) for t, v in idf.items()}

    def ref(A, B):
        sa, sb = set(A), set(B)
        iu = sum(un[t] for t in sa & sb)
        au = sum(un[t] for t in sa) + sum(un[t] for t in sb) - iu
        return _round_half_up(iu / au, 6)

    ndf = spark.createDataFrame(
        [(k, sorted(set(v))) for k, v in names.items()],
        "record_id long, tokens array<string>",
    )
    pdf = spark.createDataFrame(pair_ids, "left_id long, right_id long")
    got = {(r.left_id, r.right_id): r.weighted_jaccard
           for r in weighted_jaccard_pairs(ndf, pdf).collect()}
    for ab in pair_ids:
        assert got[ab] == ref(names[ab[0]], names[ab[1]]), ab
    # the weighting property: rarer tokens carry strictly more weight
    rarest = min(df_, key=lambda t: (df_[t], t))
    commonest = max(df_, key=lambda t: (df_[t], t))
    assert df_[rarest] < df_[commonest]
    assert idf[rarest] > idf[commonest]
