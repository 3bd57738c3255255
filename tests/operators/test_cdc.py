"""CDC apply over the serving stores (``operators/cdc.py``): one
change batch (insert / update / delete) maintains the BM25 index and
the ANN coded tables through the existing append/tombstone primitives,
under the even/odd batch split that lets an update outlive its own
tombstone. Oracle story: ``q_bm25_cdc_upsert`` replays the net corpus
in SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import pq as PQ
from ons_utils_spark.operators import text as T
from ons_utils_spark.operators.cdc import (
    ann_table_apply_cdc,
    bm25_index_apply_cdc,
    cdc_batch_ids,
    split_cdc_batch,
)


def _rows(df, *sort_cols):
    return [tuple(r) for r in df.orderBy(*sort_cols).collect()]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"alpha beta doc{i} gamma" + (" beta" * (i % 3)))
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, body string"
    ).localCheckpoint(eager=True)


def _changes(spark, docs):
    """One batch: insert 100/101, rewrite doc 3, drop doc 7."""
    return (
        spark.createDataFrame(
            [(100, "omega insert alpha"), (101, "omega beta")],
            "doc_id long, body string",
        )
        .select("doc_id", "body", F.lit("I").alias("op"))
        .unionByName(
            docs.where("doc_id = 3").select(
                "doc_id",
                F.concat(F.col("body"), F.lit(" rewritten omega"))
                .alias("body"),
                F.lit("U").alias("op"),
            )
        )
        .unionByName(
            docs.where("doc_id = 7").select(
                "doc_id", "body", F.lit("D").alias("op")
            )
        )
    )


def _net_corpus(spark, docs):
    """The corpus the change batch should leave behind."""
    survivors = docs.where(~F.col("doc_id").isin([3, 7]))
    new_rows = spark.createDataFrame(
        [(100, "omega insert alpha"), (101, "omega beta")],
        "doc_id long, body string",
    )
    updated = docs.where("doc_id = 3").select(
        "doc_id",
        F.concat(F.col("body"), F.lit(" rewritten omega")).alias("body"),
    )
    return survivors.unionByName(new_rows).unionByName(updated)


class TestSplitAndIds:
    def test_even_odd_split(self):
        assert cdc_batch_ids(0) == (0, 1)
        assert cdc_batch_ids(7) == (14, 15)
        for bad in (None, -1):
            with pytest.raises(ValueError, match="non-negative"):
                cdc_batch_ids(bad)

    def test_split_routes_ops(self, spark, docs):
        dels, ins = split_cdc_batch(_changes(spark, docs), "doc_id")
        assert sorted(dels) == [3, 7]
        got = {(r["doc_id"]) for r in ins.select("doc_id").collect()}
        assert got == {100, 101, 3}
        assert "op" not in ins.columns

    def test_split_validation(self, spark):
        bad_op = spark.createDataFrame(
            [(1, "x", "UPSERT")], "doc_id long, body string, op string"
        )
        with pytest.raises(ValueError, match="op outside"):
            split_cdc_batch(bad_op, "doc_id")
        null_id = spark.createDataFrame(
            [(None, "x", "I")], "doc_id long, body string, op string"
        )
        with pytest.raises(ValueError, match="NULL"):
            split_cdc_batch(null_id, "doc_id")
        # a NULL op must count as bad, not vanish through isin()'s
        # three-valued logic
        null_op = spark.createDataFrame(
            [(1, "x", None)], "doc_id long, body string, op string"
        )
        with pytest.raises(ValueError, match="op outside"):
            split_cdc_batch(null_op, "doc_id")
        no_op = spark.createDataFrame([(1, "x")], "doc_id long, body string")
        with pytest.raises(ValueError, match="no 'op' column"):
            split_cdc_batch(no_op, "doc_id")

    def test_oversized_delete_list_refused_with_sized_error(
        self, spark, monkeypatch
    ):
        # r12 advisory: the micro-batch contract on the delete-id
        # collect must be ENFORCED, not documented. Shrink the cap so
        # the refusal (and its actionable message) is cheap to pin;
        # limit(cap+1) also bounds what ever reaches the driver.
        from ons_utils_spark.operators import cdc as cdc_mod

        monkeypatch.setattr(cdc_mod, "CDC_MAX_DELETE_IDS", 5)
        big = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.lit("x").alias("body"),
            F.lit("D").alias("op"),
        )
        with pytest.raises(ValueError, match="more than 5 .*chunk"):
            split_cdc_batch(big, "doc_id")
        # exactly at the cap is fine
        ok = spark.range(5).select(
            F.col("id").alias("doc_id"),
            F.lit("x").alias("body"),
            F.lit("D").alias("op"),
        )
        dels, _ = split_cdc_batch(ok, "doc_id")
        assert sorted(dels) == [0, 1, 2, 3, 4]


class TestBm25ApplyCdc:
    @pytest.fixture()
    def store(self, spark, docs, tmp_path):
        path = str(tmp_path / "bm25")
        T.bm25_index_append(docs, "doc_id", "body", path)
        return path

    def test_serves_the_net_corpus_bit_identically(
        self, spark, docs, store
    ):
        bm25_index_apply_cdc(
            _changes(spark, docs), store, "doc_id", "body", batch_id=0
        )
        p, s = T.load_bm25_index_incremental(spark, store)
        p1, s1 = T.bm25_index_build(
            _net_corpus(spark, docs), "doc_id", "body"
        )
        assert _rows(p, "term", "id") == _rows(p1, "term", "id")
        r, r1 = s.collect()[0], s1.collect()[0]
        assert (r["n"], r["total_dl"]) == (r1["n"], r1["total_dl"])
        got = T.bm25_topk_indexed(p, s, ["omega", "beta"], topk=10)
        want = T.bm25_topk_indexed(p1, s1, ["omega", "beta"], topk=10)
        assert _rows(got, "id") == _rows(want, "id")

    def test_update_outlives_its_own_tombstone(self, spark, docs, store):
        """The even/odd split's whole purpose: a U row's tombstone
        (batch 2B) must not kill its new version (batch 2B+1)."""
        upd = docs.where("doc_id = 3").select(
            "doc_id", F.lit("completely new words").alias("body"),
            F.lit("U").alias("op"),
        )
        bm25_index_apply_cdc(upd, store, "doc_id", "body", batch_id=0)
        p, _ = T.load_bm25_index_incremental(spark, store)
        terms = {
            r["term"] for r in p.where("id = 3").select("term").collect()
        }
        assert terms == {"completely", "new", "words"}

    def test_replay_is_exactly_once(self, spark, docs, store):
        ch = _changes(spark, docs).localCheckpoint(eager=True)
        bm25_index_apply_cdc(ch, store, "doc_id", "body", batch_id=0)
        bm25_index_apply_cdc(ch, store, "doc_id", "body", batch_id=0)
        p, s = T.load_bm25_index_incremental(spark, store)
        p1, s1 = T.bm25_index_build(
            _net_corpus(spark, docs), "doc_id", "body"
        )
        assert _rows(p, "term", "id") == _rows(p1, "term", "id")
        assert s.collect()[0]["n"] == s1.collect()[0]["n"]

    def test_sequential_batches_compose(self, spark, docs, store):
        """Batch 1 may update a doc batch 0 inserted — monotone batch
        ids keep the watermark ordering right across batches."""
        ins = spark.createDataFrame(
            [(200, "fresh words here")], "doc_id long, body string"
        ).select("doc_id", "body", F.lit("I").alias("op"))
        bm25_index_apply_cdc(ins, store, "doc_id", "body", batch_id=0)
        upd = spark.createDataFrame(
            [(200, "updated entirely")], "doc_id long, body string"
        ).select("doc_id", "body", F.lit("U").alias("op"))
        bm25_index_apply_cdc(upd, store, "doc_id", "body", batch_id=1)
        p, _ = T.load_bm25_index_incremental(spark, store)
        terms = {
            r["term"]
            for r in p.where("id = 200").select("term").collect()
        }
        assert terms == {"updated", "entirely"}


@pytest.fixture(scope="module")
def emb(spark):
    import random

    rng = random.Random(11)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    return spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=True)


class TestAnnApplyCdc:
    @pytest.fixture()
    def store(self, spark, emb, tmp_path):
        coded, coarse, cbs = PQ.ivf_pq_build(
            emb, "vec_id", "embedding",
            dim=16, n_lists=4, m=2, k=8, coarse_iter=2, n_iter=1,
        )
        idx = PQ.make_ivf_pq_index(coarse, cbs)
        path = str(tmp_path / "ann")
        PQ.save_ivf_pq_table(coded, idx, path)
        return path

    def test_upsert_batch_serves_the_net_table(self, spark, emb, store):
        """Insert a new vector, rewrite vec 3's embedding (U), drop
        vec 7 — the served live set and a query's results must match a
        stored-index encode of the net corpus."""
        new_vec = [float((i % 5) - 2) / 3.0 for i in range(16)]
        upd_vec = [float((i % 3) - 1) / 2.0 for i in range(16)]
        changes = spark.createDataFrame(
            [
                (100, new_vec, "I"),
                (3, upd_vec, "U"),
                (7, [0.0] * 16, "D"),
            ],
            "vec_id long, embedding array<double>, op string",
        )
        ann_table_apply_cdc(
            changes, store, "vec_id", "embedding", batch_id=0
        )
        coded, idx = PQ.load_ivf_pq_table(spark, store)
        ids = {r["id"] for r in coded.select("id").collect()}
        assert 7 not in ids and 100 in ids and 3 in ids
        assert len(ids) == 40  # 40 - deleted + inserted
        net = (
            emb.where(~F.col("vec_id").isin([3, 7]))
            .unionByName(
                spark.createDataFrame(
                    [(100, new_vec), (3, upd_vec)],
                    "vec_id long, embedding array<double>",
                )
            )
        )
        want_coded = PQ.ivf_pq_encode(
            net, idx, "vec_id", "embedding"
        ).select("id", "codes", "__list")
        got = PQ.ivf_pq_query(coded, idx, upd_vec, n_probe=2, topk=8)
        want = PQ.ivf_pq_query(want_coded, idx, upd_vec, n_probe=2, topk=8)
        assert _rows(got, "id") == _rows(want, "id")
        # the updated vector's NEW embedding serves (it is its own
        # nearest neighbour at distance ~0)
        assert got.collect()[0]["id"] == 3


class TestApplyCdcHistory:
    """apply_cdc_history — the chunk-by-batch path the oversized-batch
    refusal points at: a multi-batch history frame replays in batch
    order through the micro-batch applies."""

    def _serve(self, spark, store):
        lp, ls = T.load_bm25_index_incremental(spark, store)
        return _rows(
            T.bm25_topk_indexed(lp, ls, ["omega", "beta"], topk=40),
            "id",
        )

    def test_history_equals_sequential_applies(
        self, spark, docs, tmp_path
    ):
        from ons_utils_spark.operators.cdc import apply_cdc_history

        b0 = _changes(spark, docs)  # insert 100/101, rewrite 3, drop 7
        # batch 1 edits batch 0's own output: rewrites an inserted doc
        # and drops the updated one — ordering across batches matters
        b1 = (
            spark.createDataFrame(
                [(100, "omega omega rewritten")],
                "doc_id long, body string",
            )
            .select("doc_id", "body", F.lit("U").alias("op"))
            .unionByName(
                spark.createDataFrame(
                    [(3, "x")], "doc_id long, body string"
                ).select("doc_id", "body", F.lit("D").alias("op"))
            )
        )
        history = b0.withColumn("batch_id", F.lit(0)).unionByName(
            b1.withColumn("batch_id", F.lit(1))
        )

        seq_store = str(tmp_path / "seq")
        T.bm25_index_append(docs, "doc_id", "body", seq_store)
        bm25_index_apply_cdc(b0, seq_store, "doc_id", "body", batch_id=0)
        bm25_index_apply_cdc(b1, seq_store, "doc_id", "body", batch_id=1)

        hist_store = str(tmp_path / "hist")
        T.bm25_index_append(docs, "doc_id", "body", hist_store)
        applied = apply_cdc_history(
            history, hist_store, "doc_id", "body", target="bm25"
        )
        assert applied == [0, 1]
        got = self._serve(spark, hist_store)
        assert got == self._serve(spark, seq_store)
        assert got  # not vacuous

    def test_validation(self, spark, docs, tmp_path, monkeypatch):
        from ons_utils_spark.operators import cdc as cdc_mod
        from ons_utils_spark.operators.cdc import apply_cdc_history

        store = str(tmp_path / "s")
        with pytest.raises(ValueError, match="target"):
            apply_cdc_history(
                docs.withColumn("op", F.lit("I"))
                .withColumn("batch_id", F.lit(0)),
                store, "doc_id", "body", target="hive",
            )
        with pytest.raises(ValueError, match="no 'batch_id'"):
            apply_cdc_history(
                docs.withColumn("op", F.lit("I")),
                store, "doc_id", "body", target="bm25",
            )
        null_b = (
            docs.limit(1)
            .withColumn("op", F.lit("I"))
            .withColumn("batch_id", F.lit(None).cast("long"))
        )
        with pytest.raises(ValueError, match="NULL 'batch_id'"):
            apply_cdc_history(
                null_b, store, "doc_id", "body", target="bm25"
            )
        monkeypatch.setattr(cdc_mod, "CDC_MAX_HISTORY_BATCHES", 2)
        wide = (
            docs.limit(3)
            .withColumn("op", F.lit("I"))
            .withColumn("batch_id", F.col("doc_id"))
        )
        with pytest.raises(ValueError, match="more than 2 .*compact"):
            apply_cdc_history(
                wide, store, "doc_id", "body", target="bm25"
            )
