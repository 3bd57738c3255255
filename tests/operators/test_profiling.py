"""Profiling operator tests (operators/profiling.py) + LSH planner."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.dedup import plan_lsh_bands
from ons_utils_spark.operators.profiling import heavy_hitters, profile_columns


class TestHeavyHitters:
    def test_exact_counts_and_shares(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
        )
        rows = heavy_hitters(df, "k", min_share=0.25).collect()
        assert [(r["k"], r["n"], r["share"]) for r in rows] == [
            ("a", 6, 0.6),
            ("b", 3, 0.3),
        ]

    def test_multi_column_keys(self, spark):
        df = spark.createDataFrame(
            [("x", 1)] * 4 + [("x", 2)] * 1, "k string, j int"
        )
        rows = heavy_hitters(df, ["k", "j"], min_share=0.5).collect()
        assert [(r["k"], r["j"], r["n"]) for r in rows] == [("x", 1, 4)]

    def test_single_scan_plan(self, spark):
        df = spark.createDataFrame([("a",)] * 3, "k string")
        plan = (
            heavy_hitters(df, "k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the total must be derived from the aggregated counts, not a
        # second scan of the input
        assert plan.count("LocalTableScan") <= 1


class TestProfileColumns:
    def test_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b")], "i int, s string"
        )
        rows = {r["col_name"]: r for r in profile_columns(df).collect()}
        assert rows["i"]["n"] == 3
        assert rows["i"]["n_null"] == 0
        assert rows["i"]["n_distinct"] == 2
        assert rows["i"]["min_value"] == "1"
        assert rows["i"]["max_value"] == "2"
        assert rows["s"]["n_null"] == 1
        assert rows["s"]["n_distinct"] == 2
        assert rows["s"]["min_value"] == "a"
        assert rows["s"]["max_value"] == "b"

    def test_column_subset(self, spark):
        df = spark.createDataFrame([(1, "a")], "i int, s string")
        out = profile_columns(df, "s")
        assert [r["col_name"] for r in out.collect()] == ["s"]


class TestPlanLshBands:
    def test_divides_and_matches_engine_default(self):
        p = plan_lsh_bands(0.5, num_hashes=64)
        assert p["bands"] * p["rows"] == 64
        # the engine's documented default for threshold 0.5 is 16x4; the
        # planner should land there (or an immediate neighbor)
        assert p["bands"] in (8, 16, 32)

    def test_higher_threshold_fewer_bands(self):
        lo = plan_lsh_bands(0.3, num_hashes=64)["bands"]
        hi = plan_lsh_bands(0.9, num_hashes=64)["bands"]
        assert hi <= lo

    def test_areas_bounded(self):
        p = plan_lsh_bands(0.7, num_hashes=128)
        assert 0 <= p["fp_area"] <= 1 and 0 <= p["fn_area"] <= 1

    def test_rejects_bad_threshold(self):
        with pytest.raises(ValueError):
            plan_lsh_bands(1.5)


class TestConstraintAudit:
    def test_rules_and_unique(self, spark):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.profiling import constraint_audit

        df = spark.createDataFrame(
            [
                (1, "O", 10.0),
                (1, "F", -5.0),   # dup key, negative price
                (2, "X", 3.0),    # bad status
                (None, "O", 1.0), # null key
            ],
            "k int, status string, price double",
        )
        rows = {
            r["rule"]: r["n_violations"]
            for r in constraint_audit(
                df,
                checks={
                    "k_not_null": F.col("k").isNull(),
                    "status_ok": ~F.col("status").isin("O", "F", "P"),
                    "price_positive": F.col("price") <= 0,
                },
                unique=["k"],
            ).collect()
        }
        assert rows == {
            "k_not_null": 1,
            "status_ok": 1,
            "price_positive": 1,
            "unique(k)": 1,  # the NULL-keyed row is NOT booked as a dup
        }

    def test_multi_column_unique(self, spark):
        from ons_utils_spark.operators.profiling import constraint_audit

        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (None, "a")],
            "k int, s string",
        )
        rows = {
            r["rule"]: r["n_violations"]
            for r in constraint_audit(df, unique=[("k", "s")]).collect()
        }
        assert rows == {"unique(k, s)": 1}

    def test_requires_a_check(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.profiling import constraint_audit

        df = spark.createDataFrame([(1,)], "k int")
        with _pytest.raises(ValueError):
            constraint_audit(df)


class TestGroupPercentiles:
    def test_interpolated_values(self, spark):
        from ons_utils_spark.operators.profiling import group_percentiles

        df = spark.createDataFrame(
            [("g", float(v)) for v in [10, 20, 30, 40]], "g string, x double"
        )
        rows = {r["p"]: r["value"] for r in
                group_percentiles(df, "g", "x", ps=(0.5, 1.0)).collect()}
        assert rows == {0.5: 25.0, 1.0: 40.0}

    def test_rejects_bad_ps(self, spark):
        from ons_utils_spark.operators.profiling import group_percentiles

        df = spark.createDataFrame([("g", 1.0)], "g string, x double")
        with pytest.raises(ValueError):
            group_percentiles(df, "g", "x", ps=(1.5,))


class TestEquiDepthHistogram:
    def test_equal_depth_on_uniform_data(self, spark):
        from ons_utils_spark.operators.profiling import equi_depth_histogram

        df = spark.range(1, 101).selectExpr("cast(id as double) AS v")
        rows = equi_depth_histogram(df, "v", bins=4).collect()
        assert [r["bucket"] for r in rows] == [0, 1, 2, 3]
        assert [r["n"] for r in rows] == [25, 25, 25, 25]
        assert rows[0]["lo_edge"] == 1.0
        assert rows[-1]["hi_edge"] == 100.0
        # contiguous edges
        for a, b in zip(rows, rows[1:]):
            assert a["hi_edge"] == b["lo_edge"]

    def test_skewed_data_still_balanced(self, spark):
        """The case equal-width fails: a long tail. Equi-depth buckets
        stay ~n/bins each."""
        from ons_utils_spark.operators.profiling import equi_depth_histogram

        df = spark.range(1000).selectExpr("exp(id / 100.0) AS v")
        rows = equi_depth_histogram(df, "v", bins=5).collect()
        assert all(abs(r["n"] - 200) <= 1 for r in rows)

    def test_single_bin(self, spark):
        from ons_utils_spark.operators.profiling import equi_depth_histogram

        df = spark.range(10).selectExpr("cast(id as double) AS v")
        rows = equi_depth_histogram(df, "v", bins=1).collect()
        assert len(rows) == 1
        assert (rows[0]["lo_edge"], rows[0]["hi_edge"], rows[0]["n"]) == (
            0.0, 9.0, 10,
        )

    def test_nulls_dropped_and_validation(self, spark):
        import pytest as _pytest
        from ons_utils_spark.operators.profiling import equi_depth_histogram

        df = spark.createDataFrame(
            [(1.0,), (None,), (2.0,), (3.0,), (4.0,)], "v double"
        )
        assert sum(
            r["n"] for r in equi_depth_histogram(df, "v", bins=2).collect()
        ) == 4
        with _pytest.raises(ValueError, match="bins"):
            equi_depth_histogram(df, "v", bins=0)

    def test_constant_column(self, spark):
        from ons_utils_spark.operators.profiling import equi_depth_histogram

        df = spark.range(50).selectExpr("7.0 AS v")
        rows = equi_depth_histogram(df, "v", bins=4).collect()
        # All boundaries equal 7.0 -> every row lands in the TOP bucket.
        assert len(rows) == 1 and rows[0]["n"] == 50


class TestPsiDrift:
    def _mk(self, spark, vals):
        return spark.createDataFrame([(float(v),) for v in vals], "v double")

    def test_identical_snapshots_zero_psi(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, range(100))
        rows = psi_drift(ref, ref, "v", bins=5).collect()
        assert len(rows) == 5
        assert all(r["psi_term"] == 0.0 for r in rows)
        assert all(r["n_ref"] == r["n_cur"] == 20 for r in rows)

    def test_out_of_range_current_clamps_to_edge_bins(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, range(0, 100))      # range [0, 99]
        cur = self._mk(spark, [-50, -1, 150, 200, 50])
        rows = {r["bucket"]: r for r in psi_drift(ref, cur, "v", bins=4).collect()}
        # Drift mass is counted, not dropped: 2 below -> bucket 0,
        # 2 above -> bucket 3, 1 in range.
        assert sum(r["n_cur"] for r in rows.values()) == 5
        assert rows[0]["n_cur"] == 2 and rows[3]["n_cur"] == 2

    def test_empty_bins_present_and_eps_floored(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, range(100))
        cur = self._mk(spark, [1.0] * 50)  # everything in bucket 0
        rows = {r["bucket"]: r for r in psi_drift(ref, cur, "v", bins=5).collect()}
        assert set(rows) == {0, 1, 2, 3, 4}
        assert rows[1]["n_cur"] == 0
        assert rows[1]["p_cur"] == 1e-6           # floored, not 0
        assert rows[1]["psi_term"] > 0            # contributes drift
        total = sum(r["psi_term"] for r in rows.values())
        assert total > 0.25                        # a full collapse is "shifted"

    def test_constant_reference_raises(self, spark):
        """A constant reference (min == max) used to fold BOTH snapshots
        into bucket 0, so an arbitrarily large shift scored PSI = 0 —
        the silent failure the gate exists to catch. It now raises."""
        import pytest as _pytest

        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, [7.0] * 20)
        cur = self._mk(spark, [1000.0] * 10)  # fully shifted
        with _pytest.raises(ValueError, match="constant"):
            psi_drift(ref, cur, "v", bins=3).collect()

    def test_reference_nan_does_not_poison_bounds(self, spark):
        """A NaN in the reference is excluded like NULL — it would
        otherwise become the max bound (Spark ranks NaN above every
        double), make every bin width NaN, fold both snapshots into
        bucket 0, and score an arbitrarily large shift PSI = 0."""
        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, [float(x) for x in range(100)] + [float("nan")])
        cur = self._mk(spark, [10_000.0 + x for x in range(100)])
        rows = psi_drift(ref, cur, "v", bins=5).collect()
        total = sum(r["psi_term"] for r in rows)
        assert total > 0.25  # the shift is SEEN
        # all current mass clamps into the top bin; NaN row not counted
        by_b = {r["bucket"]: r for r in rows}
        assert by_b[4]["n_cur"] == 100
        assert sum(r["n_ref"] for r in rows) == 100

    def test_all_nan_reference_raises(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, [float("nan")] * 5)
        cur = self._mk(spark, [1.0, 2.0])
        with _pytest.raises(ValueError, match="no non-null"):
            psi_drift(ref, cur, "v", bins=3)

    def test_nulls_dropped_and_validation(self, spark):
        import pytest as _pytest
        from ons_utils_spark.operators.profiling import psi_drift

        ref = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
        rows = psi_drift(ref, ref, "v", bins=2).collect()
        assert sum(r["n_ref"] for r in rows) == 2
        with _pytest.raises(ValueError, match="bins"):
            psi_drift(ref, ref, "v", bins=0)

    def test_empty_reference_raises(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift

        empty = spark.createDataFrame([], "v double")
        cur = self._mk(spark, range(10))
        import pytest as _pytest
        with _pytest.raises(ValueError, match="reference snapshot"):
            psi_drift(empty, cur, "v", bins=4)

    def test_empty_current_raises(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift

        ref = self._mk(spark, range(10))
        all_null = spark.createDataFrame([(None,)], "v double")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="current snapshot"):
            psi_drift(ref, all_null, "v", bins=4)


class TestPsiDriftCategorical:
    def _mk(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "c string")

    def test_identical_snapshots_zero_psi(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift_categorical

        ref = self._mk(spark, ["a"] * 50 + ["b"] * 30 + ["c"] * 20)
        rows = psi_drift_categorical(ref, ref, "c", top_n=3).collect()
        assert {r["category"] for r in rows} == {"a", "b", "c", "__other__"}
        assert all(r["psi_term"] == 0.0 for r in rows)

    def test_new_category_counted_in_other(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift_categorical

        ref = self._mk(spark, ["a"] * 50 + ["b"] * 50)
        cur = self._mk(spark, ["a"] * 30 + ["zz"] * 70)  # zz unseen in ref
        rows = {r["category"]: r for r in psi_drift_categorical(
            ref, cur, "c", top_n=2).collect()}
        assert rows["__other__"]["n_cur"] == 70   # drift mass counted
        assert rows["__other__"]["n_ref"] == 0
        assert rows["__other__"]["psi_term"] > 0
        assert sum(r["psi_term"] for r in rows.values()) > 0.25

    def test_top_n_anchor_deterministic_tiebreak(self, spark):
        from ons_utils_spark.operators.profiling import psi_drift_categorical

        # b and c tie on count — the anchor set must prefer 'b' by value.
        ref = self._mk(spark, ["a"] * 10 + ["b"] * 5 + ["c"] * 5)
        rows = {r["category"] for r in psi_drift_categorical(
            ref, ref, "c", top_n=2).collect()}
        assert rows == {"a", "b", "__other__"}

    def test_empty_snapshots_raise(self, spark):
        import pytest as _pytest
        from ons_utils_spark.operators.profiling import psi_drift_categorical

        ref = self._mk(spark, ["a", "b"])
        empty = spark.createDataFrame([], "c string")
        with _pytest.raises(ValueError, match="reference snapshot"):
            psi_drift_categorical(empty, ref, "c")
        with _pytest.raises(ValueError, match="current snapshot"):
            psi_drift_categorical(ref, empty, "c")
        with _pytest.raises(ValueError, match="top_n"):
            psi_drift_categorical(ref, ref, "c", top_n=0)

    def test_other_label_collision_raises(self, spark):
        import pytest as _pytest
        from ons_utils_spark.operators.profiling import psi_drift_categorical

        ref = self._mk(spark, ["__other__"] * 60 + ["a"] * 40)
        with _pytest.raises(ValueError, match="collides"):
            psi_drift_categorical(ref, ref, "c", top_n=2)
        # A different fold-in label resolves it.
        rows = psi_drift_categorical(
            ref, ref, "c", top_n=2, other_label="__rest__").collect()
        assert {r["category"] for r in rows} == {"__other__", "a", "__rest__"}
        assert all(r["psi_term"] == 0.0 for r in rows)
