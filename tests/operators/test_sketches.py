"""Count-Min sketch tests: overestimate-only error, mergeability, and
the weighted build's equivalence to the raw-row build."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)

DEPTH, WIDTH = 4, 256


@pytest.fixture()
def events(spark):
    # Zipf-ish: key k appears 100 // (k + 1) times, keys 0..19.
    rows = [(k,) for k in range(20) for _ in range(100 // (k + 1))]
    return spark.createDataFrame(rows, "k bigint")


def _exact(events):
    return {
        r["k"]: r["c"]
        for r in events.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }


class TestCountMin:
    def test_estimate_never_underestimates(self, spark, events):
        sketch = count_min_build(events, "k", DEPTH, WIDTH)
        est = {
            r["key"]: r["est"]
            for r in count_min_estimate(
                sketch, events, "k", DEPTH, WIDTH
            ).collect()
        }
        exact = _exact(events)
        assert set(est) == set(exact)
        assert all(est[k] >= exact[k] for k in exact)

    def test_error_within_classic_bound(self, spark, events):
        import math

        sketch = count_min_build(events, "k", DEPTH, WIDTH)
        est = {
            r["key"]: r["est"]
            for r in count_min_estimate(
                sketch, events, "k", DEPTH, WIDTH
            ).collect()
        }
        exact = _exact(events)
        n = sum(exact.values())
        slack = math.ceil(math.e * n / WIDTH)
        assert all(est[k] <= exact[k] + slack for k in exact)

    def test_merge_equals_concat_build(self, spark, events):
        a = events.where(F.col("k") < 10)
        b = events.where(F.col("k") >= 10)
        merged = count_min_merge(
            count_min_build(a, "k", DEPTH, WIDTH),
            count_min_build(b, "k", DEPTH, WIDTH),
        )
        whole = count_min_build(events, "k", DEPTH, WIDTH)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_weighted_build_equals_raw_build(self, spark, events):
        freq = events.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        weighted = count_min_build(freq, "k", DEPTH, WIDTH, weight_col="c")
        raw = count_min_build(events, "k", DEPTH, WIDTH)
        assert sorted(map(tuple, weighted.collect())) == sorted(
            map(tuple, raw.collect())
        )

    def test_sketch_size_bounded_by_depth_width(self, spark, events):
        sketch = count_min_build(events, "k", DEPTH, WIDTH)
        assert sketch.count() <= DEPTH * WIDTH

    def test_absent_key_estimates_small(self, spark, events):
        sketch = count_min_build(events, "k", DEPTH, WIDTH)
        ghost = spark.createDataFrame([(999_999,)], "k bigint")
        est = count_min_estimate(sketch, ghost, "k", DEPTH, WIDTH).collect()
        import math

        n = sum(_exact(events).values())
        assert est[0]["est"] <= math.ceil(math.e * n / WIDTH)

    def test_validation(self, spark, events):
        with pytest.raises(ValueError, match="width"):
            count_min_build(events, "k", DEPTH, 1000)
        with pytest.raises(ValueError, match="depth"):
            count_min_build(events, "k", 0, WIDTH)
        with pytest.raises(ValueError, match="at least one"):
            count_min_merge()


class TestNullKeys:
    def test_null_keys_dropped_everywhere(self, spark):
        from pyspark.sql import functions as F

        withnull = spark.createDataFrame(
            [(1,), (None,), (1,), (None,), (2,)], "k bigint"
        )
        clean = withnull.where(F.col("k").isNotNull())
        a = count_min_build(withnull, "k", DEPTH, WIDTH)
        b = count_min_build(clean, "k", DEPTH, WIDTH)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )
        est = count_min_estimate(a, withnull, "k", DEPTH, WIDTH).collect()
        assert {r["key"] for r in est} == {1, 2}  # no NULL probe row


class TestDurableStore:
    def test_batch_replay_is_idempotent(self, spark, tmp_path, events):
        """Re-running the same batch_id must REPLACE its deltas, not
        double-count them (the checkpointed-replay case)."""
        from ons_utils_spark.operators.sketches import (
            load_sketch,
            sketch_append_batch,
        )

        path = str(tmp_path / "sk")
        sketch_append_batch(events, "k", path, DEPTH, WIDTH, batch_id=0)
        once = sorted(map(tuple, load_sketch(spark, path).collect()))
        sketch_append_batch(events, "k", path, DEPTH, WIDTH, batch_id=0)
        twice = sorted(map(tuple, load_sketch(spark, path).collect()))
        assert once == twice

    def test_distinct_batches_accumulate(self, spark, tmp_path, events):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.sketches import (
            load_sketch,
            sketch_append_batch,
        )

        path = str(tmp_path / "sk")
        a = events.where(F.col("k") < 10)
        b = events.where(F.col("k") >= 10)
        sketch_append_batch(a, "k", path, DEPTH, WIDTH, batch_id=0)
        sketch_append_batch(b, "k", path, DEPTH, WIDTH, batch_id=1)
        got = sorted(map(tuple, load_sketch(spark, path).collect()))
        want = sorted(
            map(tuple, count_min_build(events, "k", DEPTH, WIDTH).collect())
        )
        assert got == want

    def test_batch_and_streaming_callers_share_one_layout(
        self, spark, tmp_path, events
    ):
        """Batch appends (sentinel batch_id=-1) and replayable streaming
        writes coexist on ONE sketch_path — the pre-r6 hazard was a store
        mixing root-level files with batch_id partitions, which partition
        discovery reads inconsistently."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.sketches import (
            load_sketch,
            sketch_append_batch,
        )

        path = str(tmp_path / "sk")
        a = events.where(F.col("k") < 10)
        b = events.where(F.col("k") >= 10)
        sketch_append_batch(a, "k", path, DEPTH, WIDTH)  # batch caller
        sketch_append_batch(b, "k", path, DEPTH, WIDTH, batch_id=3)
        got = sorted(map(tuple, load_sketch(spark, path).collect()))
        want = sorted(
            map(tuple, count_min_build(events, "k", DEPTH, WIDTH).collect())
        )
        assert got == want

    def test_empty_replay_truncates_stale_deltas(self, spark, tmp_path, events):
        """A replayed batch whose delta set comes out EMPTY must still
        remove the first attempt's deltas (dynamic-partition overwrite
        would write no partitions and leave them in place)."""
        from ons_utils_spark.operators.sketches import (
            load_sketch,
            sketch_append_batch,
        )

        path = str(tmp_path / "sk")
        sketch_append_batch(events, "k", path, DEPTH, WIDTH, batch_id=0)
        empty = events.limit(0)
        sketch_append_batch(empty, "k", path, DEPTH, WIDTH, batch_id=0)
        assert load_sketch(spark, path).count() == 0


class TestBottomKSketch:
    def _df(self, spark, keys):
        return spark.createDataFrame([(k,) for k in keys], "k bigint")

    def test_mergeable(self, spark):
        """bottomk(A ∪ B) == bottomk(sketch(A) ∪ sketch(B)) — the KMV
        merge law that lets shards sketch independently."""
        from ons_utils_spark.operators.sketches import bottomk_sketch

        a = self._df(spark, range(0, 500))
        b = self._df(spark, range(300, 900))
        k = 32
        direct = [r["h"] for r in bottomk_sketch(a.union(b), "k", k).collect()]
        # The merge folds the sketches' RAW hash rows (no re-hashing).
        from pyspark.sql import functions as F

        sk_a = bottomk_sketch(a, "k", k)
        sk_b = bottomk_sketch(b, "k", k)
        folded = (
            sk_a.union(sk_b)
            .distinct()
            .orderBy((F.col("h") < 0).cast("int").asc(), F.col("h").asc())
            .limit(k)
        )
        assert [r["h"] for r in folded.collect()] == direct
        assert len(direct) == k

    def test_below_saturation_exact(self, spark):
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch, kmv_distinct,
        )

        df = self._df(spark, list(range(10)) * 5)  # 10 distinct, dups
        sk = bottomk_sketch(df, "k", k=64)
        row = kmv_distinct(sk, 64).collect()[0]
        assert row["n_sketch"] == 10 and row["est"] == 10.0

    def test_estimate_within_bound(self, spark):
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch, kmv_distinct,
        )

        n, k = 20000, 512
        df = self._df(spark, range(n))
        est = kmv_distinct(bottomk_sketch(df, "k", k), k).collect()[0]["est"]
        # σ ≈ n/√k ≈ 4.4%; 5σ bound keeps the test honest but stable.
        assert abs(est - n) / n < 5 / (k ** 0.5)

    def test_partitioning_invariant(self, spark):
        from ons_utils_spark.operators.sketches import bottomk_sketch

        df = self._df(spark, range(1000))
        one = [r["h"] for r in bottomk_sketch(df.repartition(1), "k", 16).collect()]
        many = [r["h"] for r in bottomk_sketch(df.repartition(13), "k", 16).collect()]
        assert one == many

    def test_validation(self, spark):
        import pytest as _pytest
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch, hash_sample,
        )

        df = self._df(spark, range(10))
        with _pytest.raises(ValueError, match="k must be"):
            bottomk_sketch(df, "k", k=1)
        with _pytest.raises(ValueError, match="n must be"):
            hash_sample(df, "k", n=0)


class TestSampleQuantiles:
    def test_exact_on_full_sample(self, spark):
        """With n >= corpus the 'sample' is the corpus: quantiles are the
        exact disc quantiles of the data."""
        from ons_utils_spark.operators.sketches import sample_quantiles

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(101)], "k bigint, v double"
        )
        rows = {r["prob"]: r["q_est"]
                for r in sample_quantiles(df, "k", "v", n=1000).collect()}
        assert rows[0.5] == 50.0
        assert rows[0.1] == 10.0
        assert rows[0.99] == 99.0

    def test_sampled_close_to_true(self, spark):
        from ons_utils_spark.operators.sketches import sample_quantiles

        n = 20000
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(n)], "k bigint, v double"
        )
        rows = {r["prob"]: r["q_est"]
                for r in sample_quantiles(df, "k", "v", n=1024).collect()}
        for p, q in rows.items():
            # rank error ~ 1/sqrt(1024) ≈ 3%; allow 4 sigma
            assert abs(q / n - p) < 4 / (1024 ** 0.5)

    def test_deterministic_across_partitionings(self, spark):
        from ons_utils_spark.operators.sketches import sample_quantiles

        df = spark.createDataFrame(
            [(i, float(i % 997)) for i in range(5000)], "k bigint, v double"
        )
        a = sample_quantiles(df.repartition(1), "k", "v", n=256).collect()
        b = sample_quantiles(df.repartition(17), "k", "v", n=256).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_empty_input_yields_null_estimates(self, spark):
        from ons_utils_spark.operators.sketches import sample_quantiles

        empty = spark.createDataFrame([], "k bigint, v double")
        rows = sample_quantiles(empty, "k", "v", n=16).collect()
        assert len(rows) == 6
        assert all(r["q_est"] is None for r in rows)


class TestGroupedKmv:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, k bigint")

    def test_matches_global_per_group(self, spark):
        """Each group's sketch equals the global sketch of that group's
        rows — the grouped form is just k global sketches in one pass."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.sketches import (
            bottomk_sketch, bottomk_sketch_grouped,
        )

        rows = [("a", i) for i in range(500)] + [("b", i) for i in range(200, 900)]
        df = self._df(spark, rows)
        k = 16
        grouped = bottomk_sketch_grouped(df, "g", "k", k)
        for g in ("a", "b"):
            got = sorted(
                r["h"] for r in grouped.where(F.col("g") == g).collect()
            )
            want = sorted(
                r["h"]
                for r in bottomk_sketch(
                    df.where(F.col("g") == g), "k", k
                ).collect()
            )
            assert got == want

    def test_subsaturated_groups_exact(self, spark):
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch_grouped, kmv_distinct_grouped,
        )

        rows = [("a", i) for i in range(10)] * 3 + [("b", i) for i in range(5)]
        df = self._df(spark, rows)
        out = {r["g"]: r for r in kmv_distinct_grouped(
            bottomk_sketch_grouped(df, "g", "k", 64), "g", 64).collect()}
        assert out["a"]["n_sketch"] == 10 and out["a"]["est"] == 10.0
        assert out["b"]["n_sketch"] == 5 and out["b"]["est"] == 5.0

    def test_estimates_within_bound(self, spark):
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch_grouped, kmv_distinct_grouped,
        )

        k = 256
        rows = [("a", i) for i in range(8000)] + [("b", i) for i in range(3000)]
        df = self._df(spark, rows)
        out = {r["g"]: r["est"] for r in kmv_distinct_grouped(
            bottomk_sketch_grouped(df, "g", "k", k), "g", k).collect()}
        assert abs(out["a"] - 8000) / 8000 < 5 / (k ** 0.5)
        assert abs(out["b"] - 3000) / 3000 < 5 / (k ** 0.5)


class TestKmvStore:
    def _df(self, spark, keys):
        return spark.createDataFrame([(kk,) for kk in keys], "k bigint")

    def test_batches_fold_to_direct_sketch(self, spark, tmp_path):
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch, kmv_append_batch, load_kmv,
        )

        path = str(tmp_path / "kmv")
        a = self._df(spark, range(0, 600))
        b = self._df(spark, range(400, 1000))
        kmv_append_batch(a, "k", path, k=32, batch_id=0)
        kmv_append_batch(b, "k", path, k=32, batch_id=1)
        got = [r["h"] for r in load_kmv(spark, path, 32).collect()]
        want = [r["h"] for r in bottomk_sketch(a.union(b), "k", 32).collect()]
        assert got == want

    def test_replay_is_idempotent(self, spark, tmp_path):
        from ons_utils_spark.operators.sketches import (
            kmv_append_batch, load_kmv,
        )

        path = str(tmp_path / "kmv")
        a = self._df(spark, range(500))
        kmv_append_batch(a, "k", path, k=16, batch_id=0)
        once = [r["h"] for r in load_kmv(spark, path, 16).collect()]
        kmv_append_batch(a, "k", path, k=16, batch_id=0)  # replay
        twice = [r["h"] for r in load_kmv(spark, path, 16).collect()]
        assert once == twice

    def test_batch_sentinel_and_streaming_share_layout(self, spark, tmp_path):
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch, kmv_append_batch, load_kmv,
        )

        path = str(tmp_path / "kmv")
        a = self._df(spark, range(0, 300))
        b = self._df(spark, range(300, 700))
        kmv_append_batch(a, "k", path, k=16)  # batch caller (sentinel)
        kmv_append_batch(b, "k", path, k=16, batch_id=5)
        got = [r["h"] for r in load_kmv(spark, path, 16).collect()]
        want = [r["h"] for r in bottomk_sketch(a.union(b), "k", 16).collect()]
        assert got == want
