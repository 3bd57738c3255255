"""Deletion-neighborhood edit-distance join tests (operators/fuzzy.py)."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.fuzzy import edit_distance_pairs


def _pairs(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "id long, t string")
    return {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in edit_distance_pairs(df, "id", "t", max_distance=k, **kw).collect()
    }


class TestEditDistancePairs:
    def test_substitution_insertion_deletion_at_k1(self, spark):
        rows = [
            (1, "kitten"),
            (2, "mitten"),   # substitution
            (3, "kitte"),    # deletion
            (4, "kittens"),  # insertion
            (5, "sitting"),  # distance 3 — out
        ]
        got = _pairs(spark, rows, 1)
        # (3,4) "kitte"/"kittens" is distance 2 — must NOT appear at k=1.
        assert got == {(1, 2): 1, (1, 3): 1, (1, 4): 1}

    def test_exact_vs_bruteforce_k1(self, spark):
        # 60 short strings with engineered near-misses; brute-force in the
        # driver is the ground truth.
        strings = [f"item-{i:03d}" for i in range(40)] + [
            "abc", "abd", "ab", "abcd", "xyz", "xzy", "", "a", "b",
            "hello world", "hello worl", "hellp world", "hello  world",
            "same", "same", "sam", "samey", "ame", "same!", "asame",
        ]
        rows = [(i, s) for i, s in enumerate(strings)]

        def lev(a, b):
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        expected = {
            (i, j): lev(si, sj)
            for i, si in rows
            for j, sj in rows
            if i < j and lev(si, sj) <= 1
        }
        assert _pairs(spark, rows, 1) == expected

    def test_k2_superset_of_k1(self, spark):
        rows = [(1, "abcdef"), (2, "abcxef"), (3, "abxxef"), (4, "zzzzzz")]
        k1 = _pairs(spark, rows, 1)
        k2 = _pairs(spark, rows, 2)
        assert set(k1) <= set(k2)
        assert k2[(1, 3)] == 2 and (1, 3) not in k1
        assert all(p not in k2 for p in [(1, 4), (2, 4), (3, 4)])

    def test_identical_strings_distance_zero(self, spark):
        got = _pairs(spark, [(1, "dup"), (2, "dup"), (3, "dup")], 1)
        assert got == {(1, 2): 0, (1, 3): 0, (2, 3): 0}

    def test_empty_and_single_char(self, spark):
        got = _pairs(spark, [(1, ""), (2, "a"), (3, "ab")], 1)
        assert got == {(1, 2): 1, (2, 3): 1}

    def test_max_bucket_guard_drops_popular_variant(self, spark):
        rows = [(i, "same") for i in range(10)] + [(99, "sane")]
        got = _pairs(spark, rows, 1, max_bucket=5)
        # the all-identical bucket (size 10) is dropped; nothing survives
        # it because every shared variant of the dup group is that popular
        assert all(a != b for (a, b) in got) or got == {}

    def test_rejects_bad_k(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, t string")
        with pytest.raises(ValueError, match="max_distance"):
            edit_distance_pairs(df, "id", "t", max_distance=3)

    def test_plan_is_python_free(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, t string")
        plan = (
            edit_distance_pairs(df, "id", "t")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan
