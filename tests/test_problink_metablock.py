"""Unit tests: Fellegi–Sunter linkage, B-cubed evaluation, meta-blocking.

The exact-value cross-engine checks live in test_entry_oracles
(fs_match_parts / fs_u_probs_parts / er_bcubed_parts / parts_metablocking);
these cover the hand-computable semantics and the loud-failure contracts.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from company_name_matching_spark.operators import problink
from company_name_matching_spark.operators.blocking import (
    metablock_prune,
    pair_block_weights,
)
from company_name_matching_spark.operators.clustering import bcubed

PAIR_SCHEMA = (
    "l_match_key string, r_match_key string, "
    "l_tokens array<string>, r_tokens array<string>"
)


def _score(spark, rows):
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    return problink.fs_score_pairs(problink.comparison_levels(df))


class TestFellegiSunter:
    def test_full_agreement_weight_is_literal_sum(self, spark):
        row = _score(
            spark,
            [("cong ty abc", "cong ty abc",
              ["cong", "ty", "abc"], ["cong", "ty", "abc"])],
        ).first()
        w = problink.FSConfig().weights()
        expected = sum(
            float(w[f][1 if f != "jaccard_band" else 2])
            for f in problink.FIELDS
        )
        assert row["key_exact"] == 1
        assert row["jaccard_band"] == 2
        assert row["first_token"] == 1
        assert row["len_band"] == 1
        assert row["fs_weight"] == pytest.approx(expected, abs=1e-9)
        assert row["decision"] == "match"

    def test_levels_are_symmetric(self, spark):
        l = ("alpha beta co", ["alpha", "beta", "co"])
        r = ("alpha gamma co ltd", ["alpha", "gamma", "co", "ltd"])
        a = _score(spark, [(l[0], r[0], l[1], r[1])]).first()
        b = _score(spark, [(r[0], l[0], r[1], l[1])]).first()
        for c in (*problink.FIELDS, "fs_weight", "decision"):
            assert a[c] == b[c], c

    def test_jaccard_band_boundaries_exact(self, spark):
        # |∩|=4, |∪|=5 → 5·4 ≥ 4·5 → band 2 (exactly 0.8); |∩|=1, |∪|=2
        # → band 1 (exactly 0.5) — integer rule, no float boundary drift
        rows = [
            ("a b c d", "a b c d e",
             ["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]),
            ("a b", "a", ["a", "b"], ["a"]),
        ]
        got = [r["jaccard_band"] for r in
               _score(spark, rows).orderBy(F.length("l_match_key").desc()).collect()]
        assert got == [2, 1]

    def test_unmapped_level_raises(self, spark):
        df = spark.createDataFrame(
            [(7, 0, 0, 0)],
            "key_exact int, jaccard_band int, first_token int, len_band int",
        )
        with pytest.raises(Exception, match="m/u table"):
            problink.fs_score_pairs(df).collect()

    def test_bad_mu_rejected(self):
        cfg = problink.FSConfig()
        cfg.mu["key_exact"][1] = (0.0, 0.5)
        with pytest.raises(ValueError, match="m/u must be"):
            cfg.weights()

    def test_estimate_u_counts_partition_all_pairs(self, spark):
        names = spark.createDataFrame(
            [(i, f"name {i} co", ["name", str(i), "co"]) for i in range(10)],
            "source_id long, match_key string, tokens array<string>",
        )
        u = problink.estimate_u(names, k=3)
        per_field = {
            r["field"]: r["total"]
            for r in u.groupBy("field")
            .agg(F.sum("n_pairs").alias("total")).collect()
        }
        assert per_field == {f: 30 for f in problink.FIELDS}

    def test_estimate_u_auto_sample_boundary(self, spark, monkeypatch):
        """r6 scale-safe default: at or below AUTO_SAMPLE_THRESHOLD the
        output is bit-identical to the unsampled computation; above it a
        fraction targeting AUTO_SAMPLE_TARGET records kicks in (asserted
        via the shrunken pair total). Threshold is monkeypatched down so
        the boundary is exercised on a 40-row frame."""
        names = spark.createDataFrame(
            [(i, f"name {i} co", ["name", str(i), "co"]) for i in range(40)],
            "source_id long, match_key string, tokens array<string>",
        )
        baseline = sorted(
            (r["field"], r["level"], r["u"], r["n_pairs"])
            for r in problink.estimate_u(names, k=2).collect()
        )
        # at the threshold: no sampling, identical output
        monkeypatch.setattr(problink, "AUTO_SAMPLE_THRESHOLD", 40)
        at = sorted(
            (r["field"], r["level"], r["u"], r["n_pairs"])
            for r in problink.estimate_u(names, k=2).collect()
        )
        assert at == baseline
        # above the threshold: auto-derived fraction samples ~target rows
        monkeypatch.setattr(problink, "AUTO_SAMPLE_THRESHOLD", 39)
        monkeypatch.setattr(problink, "AUTO_SAMPLE_TARGET", 20.0)
        sampled = problink.estimate_u(names, k=2)
        total = sampled.where(F.col("field") == "key_exact").agg(
            F.sum("n_pairs")
        ).collect()[0][0]
        assert total < 40 * 2  # fewer pairs than unsampled n*k
        # explicit fraction still wins over the auto path
        explicit = problink.estimate_u(names, k=2, sample_fraction=1.0)
        assert sorted(
            (r["field"], r["level"], r["u"], r["n_pairs"])
            for r in explicit.collect()
        ) == baseline

    def test_estimate_u_validation(self, spark):
        names = spark.createDataFrame(
            [(1, "a", ["a"])],
            "source_id long, match_key string, tokens array<string>",
        )
        with pytest.raises(ValueError, match="k must be"):
            problink.estimate_u(names, k=0)
        with pytest.raises(ValueError, match="sample_fraction"):
            problink.estimate_u(names, k=1, sample_fraction=1.5)
        with pytest.raises(ValueError, match="need ≥ 2"):
            problink.estimate_u(names, k=1)


class TestBcubed:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "record_id long, cluster_id string, gold_id string"
        )

    def test_perfect_clustering_is_one(self, spark):
        rows = [(i, f"c{i % 3}", f"g{i % 3}") for i in range(9)]
        r = bcubed(self._df(spark, rows)).first()
        assert (r["bcubed_precision"], r["bcubed_recall"], r["bcubed_f1"]) == (
            1.0, 1.0, 1.0,
        )
        assert r["n_records"] == 9

    def test_hand_computed_overmerge(self, spark):
        # one predicted cluster over gold groups of 2 and 3:
        # precision = (2²/5 + 3²/5)/5 = 0.52, recall = 1.0,
        # f1 = 1.04/1.52 = 0.684211 (6dp)
        rows = [(i, "all", "g1" if i < 2 else "g2") for i in range(5)]
        r = bcubed(self._df(spark, rows)).first()
        assert r["bcubed_precision"] == 0.52
        assert r["bcubed_recall"] == 1.0
        assert r["bcubed_f1"] == 0.684211

    def test_null_label_raises(self, spark):
        rows = [(1, "c", "g"), (2, "c", None)]
        with pytest.raises(Exception, match="NULL cluster or gold"):
            bcubed(self._df(spark, rows)).collect()


def _blocks(spark, mapping):
    rows = [(rid, bk) for bk, ids in mapping.items() for rid in ids]
    return spark.createDataFrame(rows, "record_id long, block_key string")


class TestMetablocking:
    def test_cbs_weight_counts_shared_blocks(self, spark):
        w = pair_block_weights(
            _blocks(spark, {"k1": [1, 2], "k2": [1, 2], "k3": [1, 3]})
        )
        got = {(r["left_id"], r["right_id"]): r["weight"] for r in w.collect()}
        assert got == {(1, 2): 2, (1, 3): 1}

    def test_wnp_prunes_weak_pair_between_strong_nodes(self, spark):
        # (1,2) and (3,4) co-occur twice; the single-block bridge (1,3)
        # is below BOTH endpoint means → pruned
        kept = metablock_prune(
            _blocks(spark, {
                "k1": [1, 2], "k2": [1, 2],
                "k3": [3, 4], "k4": [3, 4],
                "k5": [1, 3],
            })
        )
        got = {(r["left_id"], r["right_id"]): r["weight"]
               for r in kept.collect()}
        assert got == {(1, 2): 2, (3, 4): 2}

    def test_singleton_node_keeps_its_only_pair(self, spark):
        # node 4's only pair has weight == its mean → retained (WNP keeps
        # at-mean pairs), even though node 1 has stronger pairs
        kept = metablock_prune(
            _blocks(spark, {
                "k1": [1, 2], "k2": [1, 2], "k5": [1, 4],
            })
        )
        got = {(r["left_id"], r["right_id"]) for r in kept.collect()}
        assert got == {(1, 2), (1, 4)}

    def test_matches_naive_reference(self, spark):
        import random

        rng = random.Random(7)
        mapping = {
            f"b{b}": sorted(rng.sample(range(30), rng.randint(1, 6)))
            for b in range(25)
        }
        got = {
            (r["left_id"], r["right_id"], r["weight"])
            for r in metablock_prune(_blocks(spark, mapping)).collect()
        }
        # naive reference: quadratic per block, python dict math
        w: dict[tuple[int, int], int] = {}
        for ids in mapping.values():
            for a, b in itertools.combinations(sorted(set(ids)), 2):
                w[(a, b)] = w.get((a, b), 0) + 1
        s: dict[int, int] = {}
        c: dict[int, int] = {}
        for (a, b), wt in w.items():
            for n in (a, b):
                s[n] = s.get(n, 0) + wt
                c[n] = c.get(n, 0) + 1
        want = {
            (a, b, wt)
            for (a, b), wt in w.items()
            if wt * c[a] >= s[a] or wt * c[b] >= s[b]
        }
        assert got == want


class TestEMEstimation:
    def test_em_separates_planted_match_structure(self, spark):
        # 60 clear non-matches (all levels 0) + 20 clear matches (all
        # levels max): EM must drive m toward the match levels, u toward
        # the non-match levels, λ toward 0.25
        rows = [(0, 0, 0, 0)] * 60 + [(1, 2, 1, 1)] * 20
        lv = spark.createDataFrame(
            rows,
            "key_exact int, jaccard_band int, first_token int, len_band int",
        )
        out = problink.em_estimate_mu(lv, iterations=2)
        got = {(r["field"], r["level"]): (r["m"], r["u"], r["lam"])
               for r in out.collect()}
        for f in problink.FIELDS:
            hi = 2 if f == "jaccard_band" else 1
            m_hi, u_hi, lam = got[(f, hi)]
            m_lo, u_lo, _ = got[(f, 0)]
            assert m_hi > 0.99 and m_lo < 0.01, (f, m_hi, m_lo)
            assert u_lo > 0.99 and u_hi < 0.01, (f, u_lo, u_hi)
            assert abs(lam - 0.25) < 0.01
            # probabilities: valid and complementary per field
            assert 0.0 <= m_hi <= 1.0 and 0.0 <= u_lo <= 1.0
            assert abs((m_hi + m_lo) - 1.0) < 1e-9
            assert abs((u_hi + u_lo) - 1.0) < 1e-9

    def test_em_is_deterministic_across_partitionings(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (rng.randint(0, 1), rng.randint(0, 2),
             rng.randint(0, 1), rng.randint(0, 1))
            for _ in range(400)
        ]
        schema = ("key_exact int, jaccard_band int, "
                  "first_token int, len_band int")
        a = problink.em_estimate_mu(
            spark.createDataFrame(rows, schema).repartition(1), iterations=2
        ).collect()
        b = problink.em_estimate_mu(
            spark.createDataFrame(rows, schema).repartition(13), iterations=2
        ).collect()
        ka = {(r["field"], r["level"]): (r["m"], r["u"], r["lam"]) for r in a}
        kb = {(r["field"], r["level"]): (r["m"], r["u"], r["lam"]) for r in b}
        assert ka == kb  # bit-identical: decimal sums, in-engine rounding

    def test_em_validates_iterations(self, spark):
        lv = spark.createDataFrame(
            [(0, 0, 0, 0)],
            "key_exact int, jaccard_band int, first_token int, len_band int",
        )
        with pytest.raises(ValueError, match="iterations"):
            problink.em_estimate_mu(lv, iterations=0)


class TestRandScores:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "record_id long, cluster_id string, gold_id string"
        )

    def test_perfect_clustering_is_one(self, spark):
        from company_name_matching_spark.operators.clustering import rand_scores

        rows = [(i, f"c{i % 3}", f"g{i % 3}") for i in range(9)]
        r = rand_scores(self._df(spark, rows)).first()
        assert (r["rand_index"], r["adjusted_rand"]) == (1.0, 1.0)

    def test_hand_computed_small_case(self, spark):
        from company_name_matching_spark.operators.clustering import rand_scores

        # pred {1,2}{3} vs gold {1}{2,3}: s_ij=0, s_a=s_b=1, t=3 →
        # RI = 1 - 2/3 = 0.333333, ARI = (0 - 1/3)/(1 - 1/3) = -0.5
        rows = [(1, "p1", "g1"), (2, "p1", "g2"), (3, "p2", "g2")]
        r = rand_scores(self._df(spark, rows)).first()
        assert r["n_records"] == 3
        assert r["rand_index"] == 0.333333
        assert r["adjusted_rand"] == -0.5

    def test_null_label_raises(self, spark):
        from company_name_matching_spark.operators.clustering import rand_scores

        with pytest.raises(Exception, match="NULL cluster or gold"):
            rand_scores(self._df(spark, [(1, "c", None)])).collect()


class TestBlockingQuality:
    def test_hand_computed(self, spark):
        from company_name_matching_spark.operators.blocking import blocking_quality

        labels = spark.createDataFrame(
            [(1, "g1"), (2, "g1"), (3, "g2"), (4, "g2")],
            "record_id long, gold_id string",
        )
        cand = spark.createDataFrame(
            [(1, 2), (1, 3)], "left_id long, right_id long"
        )
        r = blocking_quality(cand, labels).first()
        assert r["n_candidates"] == 2
        assert r["n_true_pairs"] == 2
        assert r["true_in_candidates"] == 1
        assert r["pair_completeness"] == 0.5
        assert r["pair_quality"] == 0.5
        assert r["reduction_ratio"] == 0.666667

    def test_perfect_blocking(self, spark):
        from company_name_matching_spark.operators.blocking import blocking_quality

        labels = spark.createDataFrame(
            [(i, f"g{i % 2}") for i in range(6)],
            "record_id long, gold_id string",
        )
        # candidates exactly the true pairs
        import itertools
        groups = {}
        for i in range(6):
            groups.setdefault(i % 2, []).append(i)
        cand = spark.createDataFrame(
            [p for g in groups.values()
             for p in itertools.combinations(sorted(g), 2)],
            "left_id long, right_id long",
        )
        r = blocking_quality(cand, labels).first()
        assert r["pair_completeness"] == 1.0
        assert r["pair_quality"] == 1.0


class TestSortedNeighborhood:
    def test_global_rank_matches_single_partition_window(self, spark):
        import random

        from pyspark.sql.window import Window

        from company_name_matching_spark.operators.blocking import global_rank

        rng = random.Random(11)
        rows = [(i, f"k{rng.randint(0, 50):03d}") for i in range(500)]
        df = spark.createDataFrame(rows, "id long, key string").repartition(7)
        got = {
            r["id"]: r["_rank"]
            for r in global_rank(df, ["key", "id"], n_buckets=8).collect()
        }
        want = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy("key", "id"))
            ).collect()
        }
        assert got == want

    def test_snb_pairs_match_naive_window(self, spark):
        import random

        from company_name_matching_spark.operators.blocking import (
            sorted_neighborhood_pairs,
        )

        rng = random.Random(5)
        rows = [(i, f"k{rng.randint(0, 40):03d}") for i in range(300)]
        df = spark.createDataFrame(rows, "record_id long, key string")
        got = {
            (r["left_id"], r["right_id"])
            for r in sorted_neighborhood_pairs(
                df, "key", window=4, n_buckets=6
            ).collect()
        }
        order = sorted(rows, key=lambda r: (r[1], r[0]))
        want = {
            (order[i][0], order[j][0])
            for i in range(len(order))
            for j in range(i + 1, min(i + 4, len(order)))
        }
        assert got == want

    def test_snb_validates_window(self, spark):
        from company_name_matching_spark.operators.blocking import (
            sorted_neighborhood_pairs,
        )

        df = spark.createDataFrame([(1, "a")], "record_id long, key string")
        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(df, "key", window=1)


class TestFSMatchRule:
    def test_fs_match_tier_never_overmerges(self, spark):
        """End-to-end: FS decisions over real blocked candidates on the
        labeled fixture corpus. The 'match' tier must be pure (zero
        cross-entity links) and cover every exact-duplicate pair; the
        clusters built from it must each contain one entity."""
        from company_name_matching_spark.operators import (
            blocking as blk,
            clustering,
            normalize,
            problink,
        )
        from company_name_matching_spark.sources import fixtures

        pages = fixtures.pages_dataframe(spark, n_companies=60, per_company=4)
        names = normalize.normalize_pages(pages)
        cand = blk.candidate_pairs(names)
        scored = problink.fs_match_pairs(names, cand)
        ids = (
            names.select("record_id", "url")
            .join(pages.select("url", "entity_id"), "url")
            .select("record_id", F.split("entity_id", "#")[0].alias("ent"))
        )
        tagged = (
            scored.join(ids.withColumnRenamed("record_id", "left_id")
                        .withColumnRenamed("ent", "l_ent"), "left_id")
            .join(ids.withColumnRenamed("record_id", "right_id")
                  .withColumnRenamed("ent", "r_ent"), "right_id")
        )
        # match tier: high precision — zero cross-entity auto-links
        assert tagged.where(
            (F.col("decision") == "match") & (F.col("l_ent") != F.col("r_ent"))
        ).count() == 0
        # every exact-duplicate candidate pair is auto-linked
        assert tagged.where(
            (F.col("key_exact") == 1) & (F.col("decision") != "match")
        ).count() == 0
        # clustering the match tier: over-splits allowed, over-merges not
        labels, _ = clustering.cluster_matches(scored, names)
        ent_per_cluster = (
            labels.join(ids, "record_id")
            .groupBy("cluster_id")
            .agg(F.countDistinct("ent").alias("n_ent"))
            .where(F.col("n_ent") > 1)
            .count()
        )
        assert ent_per_cluster == 0
