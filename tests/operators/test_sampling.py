"""Deterministic sampling / splitting / capping / mixture tests."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.sampling import (
    cap_per_group,
    hash_sample,
    hash_split,
    hex_threshold,
    split_thresholds,
    weighted_mixture,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(2000).withColumnRenamed("id", "k").cache()


class TestHexThreshold:
    def test_values(self):
        assert hex_threshold(0.0) == "0000"
        assert hex_threshold(0.5) == "8000"
        assert hex_threshold(1.0) == "g"
        assert hex_threshold(2.0) == "g"

    def test_negative_raises(self):
        with pytest.raises(ValueError):
            hex_threshold(-0.1)


class TestHashSample:
    def test_fraction_approximate(self, spark, keys):
        n = hash_sample(keys, "k", 0.5).count()
        assert 900 <= n <= 1100  # md5 buckets are ~uniform

    def test_deterministic(self, spark, keys):
        a = {r["k"] for r in hash_sample(keys, "k", 0.3).collect()}
        b = {r["k"] for r in hash_sample(keys, "k", 0.3).collect()}
        assert a == b

    def test_nested_fractions(self, spark, keys):
        """Smaller fraction is a subset of the larger (same salt)."""
        small = {r["k"] for r in hash_sample(keys, "k", 0.2).collect()}
        big = {r["k"] for r in hash_sample(keys, "k", 0.6).collect()}
        assert small <= big

    def test_salt_decorrelates(self, spark, keys):
        a = {r["k"] for r in hash_sample(keys, "k", 0.5, salt="a").collect()}
        b = {r["k"] for r in hash_sample(keys, "k", 0.5, salt="b").collect()}
        assert a != b

    def test_boundary_fractions(self, spark, keys):
        assert hash_sample(keys, "k", 1.0).count() == 2000
        assert hash_sample(keys, "k", 0.0).count() == 0


class TestHashSplit:
    def test_partition_of_rows(self, spark, keys):
        out = hash_split(keys, "k", {"train": 8, "val": 1, "test": 1})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 2000
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]

    def test_train_equals_sample_of_first_range(self, spark, keys):
        """The first split's rows ARE hash_sample at its cumulative weight."""
        train = {
            r["k"]
            for r in hash_split(keys, "k", {"train": 0.8, "rest": 0.2})
            .where(F.col("split") == "train")
            .collect()
        }
        sampled = {r["k"] for r in hash_sample(keys, "k", 0.8).collect()}
        assert train == sampled

    def test_thresholds_normalized(self):
        assert split_thresholds({"a": 1, "b": 1})[0][1] == hex_threshold(0.5)
        assert split_thresholds({"a": 1})[-1][1] == "g"

    def test_empty_weights_raise(self):
        with pytest.raises(ValueError):
            split_thresholds({})


class TestCapPerGroup:
    def test_keeps_first_n_by_order(self, spark):
        df = spark.createDataFrame(
            [("a", i) for i in range(10)] + [("b", i) for i in range(3)],
            "g string, v int",
        )
        out = cap_per_group(df, "g", "v", 5)
        got = sorted((r["g"], r["v"]) for r in out.collect())
        assert got == [("a", i) for i in range(5)] + [("b", i) for i in range(3)]

    def test_multi_key_groups(self, spark):
        df = spark.createDataFrame(
            [("a", "x", i) for i in range(4)], "g string, h string, v int"
        )
        assert cap_per_group(df, ["g", "h"], "v", 2).count() == 2


class TestWeightedMixture:
    def test_rates_respected(self, spark):
        df = (
            spark.range(3000)
            .select(
                F.col("id").alias("k"),
                F.when(F.col("id") % 3 == 0, "en")
                .when(F.col("id") % 3 == 1, "de")
                .otherwise("fr")
                .alias("lang"),
            )
        )
        out = weighted_mixture(df, "k", "lang", {"en": 0.5, "de": 0.1})
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert counts["fr"] == 1000  # default rate 1.0 keeps all
        assert 400 <= counts["en"] <= 600
        assert 50 <= counts["de"] <= 160

    def test_no_shuffle_plan(self, spark):
        """The mixture is a pure filter — no Exchange in the plan."""
        df = spark.range(100).select(F.col("id").alias("k"), F.lit("en").alias("lang"))
        plan = (
            weighted_mixture(df, "k", "lang", {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestNgramRepetition:
    def test_hand_example(self, spark):
        from ons_utils_spark.operators.text import ngram_repetition

        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "x"), (3, "p q r")],
            "doc_id long, text string",
        )
        rows = {
            r["id"]: r for r in ngram_repetition(df, "doc_id", "text", n=2).collect()
        }
        # doc 1 bigrams: "a b","b a","a b","b a" → total 4, 2 distinct, top 2
        assert rows[1]["total_ngrams"] == 4
        assert rows[1]["distinct_ratio"] == 0.5
        assert rows[1]["top_ngram_ratio"] == 0.5
        # doc 2 has one token → no bigrams → no row
        assert 2 not in rows
        # doc 3: all distinct
        assert rows[3]["distinct_ratio"] == 1.0


class TestTrainingOrder:
    def test_deterministic_across_partitionings(self, spark):
        from ons_utils_spark.operators.sampling import training_order

        df = spark.range(200).select(F.col("id").alias("k"))
        a = training_order(df, "k", n_shards=4).collect()
        b = training_order(df.repartition(7), "k", n_shards=4).collect()
        assert {(r["k"], r["shard"], r["pos"]) for r in a} == {
            (r["k"], r["shard"], r["pos"]) for r in b
        }

    def test_positions_dense_per_shard(self, spark):
        from ons_utils_spark.operators.sampling import training_order

        rows = training_order(
            spark.range(100).select(F.col("id").alias("k")), "k", n_shards=3
        ).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= {0, 1, 2}
        for positions in by_shard.values():
            assert sorted(positions) == list(range(len(positions)))

    def test_salt_changes_permutation(self, spark):
        from ons_utils_spark.operators.sampling import training_order

        df = spark.range(100).select(F.col("id").alias("k"))
        a = {r["k"]: (r["shard"], r["pos"])
             for r in training_order(df, "k", salt="e0", n_shards=4).collect()}
        b = {r["k"]: (r["shard"], r["pos"])
             for r in training_order(df, "k", salt="e1", n_shards=4).collect()}
        assert a != b

    def test_bad_shards_raises(self, spark):
        from ons_utils_spark.operators.sampling import training_order

        df = spark.range(5).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="n_shards"):
            training_order(df, "k", n_shards=0)

    def test_group_sample_exact_k_and_deterministic(self, spark):
        from ons_utils_spark.operators.sampling import group_sample

        df = spark.createDataFrame(
            [(i, "big") for i in range(100)] + [(200 + i, "small") for i in range(3)],
            "k bigint, g string",
        )
        a = group_sample(df, "g", "k", k=5).collect()
        by_g = {}
        for r in a:
            by_g.setdefault(r["g"], set()).add(r["k"])
        assert len(by_g["big"]) == 5
        assert by_g["small"] == {200, 201, 202}  # undersized group kept whole
        # Deterministic across partitionings; salt draws a different set.
        b = group_sample(df.repartition(7), "g", "k", k=5).collect()
        assert {(r["g"], r["k"]) for r in a} == {(r["g"], r["k"]) for r in b}
        c = group_sample(df, "g", "k", k=5, salt="other").collect()
        assert {(r["g"], r["k"]) for r in c} != {(r["g"], r["k"]) for r in a}

    def test_weighted_sample_biases_toward_heavy_rows(self, spark):
        """Across many salts, a row with 50x the weight should win far
        more often than a light row — the statistical contract of
        Efraimidis-Spirakis; determinism checked across partitionings."""
        from ons_utils_spark.operators.sampling import weighted_group_sample

        rows = [(i, "g", 50.0 if i == 0 else 1.0) for i in range(20)]
        df = spark.createDataFrame(rows, "k bigint, g string, w double")
        heavy_wins = 0
        for s in range(12):
            got = {r["k"] for r in weighted_group_sample(
                df, "g", "k", "w", k=1, salt=f"s{s}").collect()}
            heavy_wins += 0 in got
        assert heavy_wins >= 8  # P(win) ~ 50/69 per draw; 8/12 is lenient
        a = weighted_group_sample(df, "g", "k", "w", k=5, salt="x").collect()
        b = weighted_group_sample(
            df.repartition(7), "g", "k", "w", k=5, salt="x"
        ).collect()
        assert {r["k"] for r in a} == {r["k"] for r in b}

    def test_weighted_sample_zero_weight_never_wins(self, spark):
        from ons_utils_spark.operators.sampling import weighted_group_sample

        df = spark.createDataFrame(
            [(1, "g", 0.0), (2, "g", 1.0), (3, "g", -4.0)],
            "k bigint, g string, w double",
        )
        got = {r["k"] for r in weighted_group_sample(df, "g", "k", "w", k=1).collect()}
        assert got == {2}

    def test_group_sample_guards(self, spark):
        from ons_utils_spark.operators.sampling import group_sample

        df = spark.createDataFrame([(1, "g", 0)], "k bigint, g string, __gs_h int")
        with pytest.raises(ValueError, match="__gs_h"):
            group_sample(df, "g", "k", k=2)
        df2 = spark.createDataFrame([(1, "g")], "k bigint, g string")
        with pytest.raises(ValueError, match="k must be"):
            group_sample(df2, "g", "k", k=0)

    def test_temp_column_collision_raises(self, spark):
        """Caller columns named __h/__k must not be silently clobbered."""
        from ons_utils_spark.operators.sampling import training_order

        df = spark.range(5).selectExpr("id AS k", "id AS __h")
        with pytest.raises(ValueError, match="__h"):
            training_order(df, "k", n_shards=2)


class TestKfold:
    def test_partition_invariant_and_balanced(self, spark):
        from ons_utils_spark.operators.sampling import kfold

        df = spark.range(1000).select(F.col("id").alias("k"))
        a = {r["k"]: r["fold"] for r in kfold(df, "k", k=5).collect()}
        b = {r["k"]: r["fold"] for r in kfold(df.repartition(9), "k", k=5).collect()}
        assert a == b
        sizes = [list(a.values()).count(f) for f in range(5)]
        assert sum(sizes) == 1000 and min(sizes) > 100  # roughly balanced

    def test_salt_gives_independent_folding(self, spark):
        from ons_utils_spark.operators.sampling import kfold

        df = spark.range(200).select(F.col("id").alias("k"))
        a = {r["k"]: r["fold"] for r in kfold(df, "k", salt="s0").collect()}
        b = {r["k"]: r["fold"] for r in kfold(df, "k", salt="s1").collect()}
        assert a != b

    def test_bad_k_raises(self, spark):
        from ons_utils_spark.operators.sampling import kfold

        df = spark.range(5).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="k must be"):
            kfold(df, "k", k=1)


class TestNegativePairs:
    def test_k_partners_and_no_self(self, spark):
        from ons_utils_spark.operators.sampling import negative_pairs

        df = spark.range(200).withColumnRenamed("id", "doc_id")
        pairs = negative_pairs(df, "doc_id", k=3, n_shards=8).collect()
        by_id = {}
        for r in pairs:
            assert r["id"] != r["neg_id"]
            by_id.setdefault(r["id"], set()).add(r["neg_id"])
        # every row has partners; with ~25 rows/shard, exactly k each
        assert set(by_id) == set(range(200))
        assert all(len(v) == 3 for v in by_id.values())

    def test_deterministic_across_partitionings(self, spark):
        from ons_utils_spark.operators.sampling import negative_pairs

        df = spark.range(100).withColumnRenamed("id", "doc_id")
        a = {(r["id"], r["neg_id"]) for r in negative_pairs(df.coalesce(1), "doc_id", k=2).collect()}
        b = {(r["id"], r["neg_id"]) for r in negative_pairs(df.repartition(13), "doc_id", k=2).collect()}
        assert a == b

    def test_salt_changes_draw(self, spark):
        from ons_utils_spark.operators.sampling import negative_pairs

        df = spark.range(300).withColumnRenamed("id", "doc_id")
        a = {(r["id"], r["neg_id"]) for r in negative_pairs(df, "doc_id", salt="e1").collect()}
        b = {(r["id"], r["neg_id"]) for r in negative_pairs(df, "doc_id", salt="e2").collect()}
        assert a != b

    def test_rejects_bad_k(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.sampling import negative_pairs

        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with _pytest.raises(ValueError):
            negative_pairs(df, "doc_id", k=0)
