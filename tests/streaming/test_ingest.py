"""Streaming near-dup ingest tests: foreachBatch dedup against a persisted
MinHash index, with the index growing as batches are accepted."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.dedup import minhash_index
from ons_utils_spark.streaming.ingest import (
    dedup_ingest_batch,
    dedup_ingest_writer,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun shines "
    "bright above the quiet green valley and birds sing old songs"
)
NEAR = BASE.replace("quiet green valley", "quiet blue valley")
FRESH = (
    "columnar engines pipeline vectorized batches through operators with "
    "late materialization and dictionary encoded string columns everywhere"
)
FRESH_NEAR = FRESH.replace("dictionary encoded", "dictionary compressed")
OTHER = (
    "a completely unrelated recipe mixes flour butter sugar and eggs into "
    "a smooth batter baked slowly until golden and fragrant in the oven"
)

SCHEMA = "id bigint, text string"


@pytest.fixture()
def corpus_index(spark, tmp_path):
    corpus = spark.createDataFrame([(1, BASE)], SCHEMA)
    path = str(tmp_path / "index")
    minhash_index(corpus, "id", "text").write.parquet(path)
    return path


class TestDedupIngestBatch:
    def test_rejects_corpus_dup_keeps_fresh(self, spark, corpus_index, tmp_path):
        out = str(tmp_path / "out")
        batch = spark.createDataFrame([(10, NEAR), (11, FRESH)], SCHEMA)
        n = dedup_ingest_batch(batch, corpus_index, out)
        assert n == 1
        assert [r["id"] for r in spark.read.parquet(out).collect()] == [11]

    def test_intra_batch_keeps_min_id(self, spark, corpus_index, tmp_path):
        out = str(tmp_path / "out")
        batch = spark.createDataFrame(
            [(20, FRESH), (21, FRESH_NEAR), (22, OTHER)], SCHEMA
        )
        dedup_ingest_batch(batch, corpus_index, out)
        kept = {r["id"] for r in spark.read.parquet(out).collect()}
        assert kept == {20, 22}

    def test_index_grows_so_next_batch_dedups_against_survivors(
        self, spark, corpus_index, tmp_path
    ):
        out = str(tmp_path / "out")
        first = spark.createDataFrame([(30, FRESH)], SCHEMA)
        second = spark.createDataFrame([(40, FRESH_NEAR), (41, OTHER)], SCHEMA)
        dedup_ingest_batch(first, corpus_index, out)
        dedup_ingest_batch(second, corpus_index, out)
        kept = {r["id"] for r in spark.read.parquet(out).collect()}
        assert kept == {30, 41}  # 40 rejected as near-dup of batch-1's 30
        idx_ids = {r["id"] for r in spark.read.parquet(corpus_index).collect()}
        assert idx_ids == {1, 30, 41}

    def test_update_index_off_leaves_index_fixed(
        self, spark, corpus_index, tmp_path
    ):
        out = str(tmp_path / "out")
        batch = spark.createDataFrame([(50, FRESH)], SCHEMA)
        dedup_ingest_batch(batch, corpus_index, out, update_index=False)
        idx_ids = {r["id"] for r in spark.read.parquet(corpus_index).collect()}
        assert idx_ids == {1}


class TestStreamingIngest:
    def test_two_trigger_stream_matches_batch_semantics(
        self, spark, corpus_index, tmp_path
    ):
        """Real stream: two files → maxFilesPerTrigger=1 → two micro-
        batches; later batches must dedup against earlier survivors via
        the growing index."""
        stream_dir = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame([(60, NEAR), (61, FRESH)], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(stream_dir)
        spark.createDataFrame([(70, FRESH_NEAR), (71, OTHER)], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(stream_dir)

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            dedup_ingest_writer(stream, corpus_index, out, checkpoint_dir=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = {r["id"] for r in spark.read.parquet(out).collect()}
        # 60 is a near-dup of the corpus; 70 of whichever FRESH doc landed
        # first. Exactly one of {61, 70} survives (file order within a
        # directory listing is not contractual), plus 71.
        assert 71 in kept and 60 not in kept
        assert len(kept & {61, 70}) == 1
        idx_ids = {r["id"] for r in spark.read.parquet(corpus_index).collect()}
        assert idx_ids == {1} | kept


class TestBootstrapAndReuse:
    def test_first_batch_bootstraps_missing_index(self, spark, tmp_path):
        """A fresh deployment has no index yet: the first batch must not
        crash, must keep its own survivors, and must CREATE the index."""
        idx = str(tmp_path / "fresh_index")
        out = str(tmp_path / "out")
        batch = spark.createDataFrame(
            [(1, FRESH), (2, FRESH_NEAR), (3, OTHER)], SCHEMA
        )
        n = dedup_ingest_batch(batch, idx, out)
        assert n == 2  # intra-batch dedup still applies on batch one
        kept = {r["id"] for r in spark.read.parquet(out).collect()}
        assert kept == {1, 3}
        assert {r["id"] for r in spark.read.parquet(idx).collect()} == {1, 3}
        # Second batch now dedups against the bootstrapped index.
        second = spark.createDataFrame([(9, FRESH)], SCHEMA)
        assert dedup_ingest_batch(second, idx, out) == 0

    def test_short_docs_survive_and_stay_unindexed(self, spark, corpus_index, tmp_path):
        """Docs too short to shingle can never near-dup-match; they pass
        through as survivors without entering the index."""
        out = str(tmp_path / "out")
        batch = spark.createDataFrame([(80, "hi"), (81, FRESH)], SCHEMA)
        assert dedup_ingest_batch(batch, corpus_index, out) == 2
        assert {r["id"] for r in spark.read.parquet(out).collect()} == {80, 81}
        idx_ids = {r["id"] for r in spark.read.parquet(corpus_index).collect()}
        assert 80 not in idx_ids and 81 in idx_ids


class TestIndexReuseEquality:
    def test_pairs_from_index_match_pairs_from_docs(self, spark):
        from ons_utils_spark.operators.dedup import (
            minhash_index,
            minhash_lsh_pairs,
        )

        docs = spark.createDataFrame(
            [(1, BASE), (2, NEAR), (3, OTHER), (4, FRESH)], SCHEMA
        )
        direct = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_lsh_pairs(docs, "id", "text").collect()
        }
        via_index = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_lsh_pairs(
                index=minhash_index(docs, "id", "text")
            ).collect()
        }
        assert direct == via_index

    def test_pairs_requires_exactly_one_input(self, spark):
        from ons_utils_spark.operators.dedup import minhash_lsh_pairs

        with pytest.raises(ValueError, match="exactly one"):
            minhash_lsh_pairs()


class TestStreamingSketchMaintenance:
    def test_streamed_sketch_equals_batch_sketch(self, spark, tmp_path):
        """Two micro-batches append cell deltas; the loaded sketch must
        equal a one-shot batch build over all rows — mergeability is the
        durable-format contract."""
        from ons_utils_spark.operators.sketches import (
            count_min_build,
            count_min_estimate,
            load_sketch,
        )
        from ons_utils_spark.streaming.ingest import sketch_ingest_writer

        stream_dir = str(tmp_path / "in")
        sketch_path = str(tmp_path / "sketch")
        ckpt = str(tmp_path / "ckpt")
        rows1 = [(k,) for k in range(10) for _ in range(5)]
        rows2 = [(k,) for k in range(5, 15) for _ in range(3)]
        spark.createDataFrame(rows1, "k bigint").coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        spark.createDataFrame(rows2, "k bigint").coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)

        stream = (
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            sketch_ingest_writer(
                stream, "k", sketch_path, ckpt, depth=4, width=256
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        streamed = load_sketch(spark, sketch_path)
        whole = count_min_build(
            spark.createDataFrame(rows1 + rows2, "k bigint"),
            "k",
            depth=4,
            width=256,
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, whole.collect())
        )
        # And the streamed sketch answers queries with the usual bound.
        est = {
            r["key"]: r["est"]
            for r in count_min_estimate(
                streamed,
                spark.createDataFrame([(k,) for k in range(15)], "k bigint"),
                "k",
                depth=4,
                width=256,
            ).collect()
        }
        exact = {k: 0 for k in range(15)}
        for (k,) in rows1 + rows2:
            exact[k] += 1
        assert all(est[k] >= exact[k] for k in exact)


class TestStreamingBloomMaintenance:
    def test_streamed_filter_equals_batch_filter(self, spark, tmp_path):
        """Two micro-batches of reference docs append Bloom word deltas;
        the loaded filter must equal a one-shot bloom_build over all docs
        (bit OR is the lossless merge), and decontaminating with it must
        equal decontaminating against the full reference directly."""
        from ons_utils_spark.operators.corpus import (
            bloom_build,
            decontaminate_bloom,
            load_bloom,
        )
        from ons_utils_spark.streaming.ingest import bloom_ingest_writer

        stream_dir = str(tmp_path / "in")
        bloom_path = str(tmp_path / "bloom")
        ckpt = str(tmp_path / "ckpt")
        ref1 = [(1, "alpha beta gamma delta epsilon zeta")]
        ref2 = [(2, "one two three four five six seven")]
        for rows in (ref1, ref2):
            spark.createDataFrame(
                rows, "doc_id bigint, text string"
            ).coalesce(1).write.mode("append").parquet(stream_dir)

        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            bloom_ingest_writer(stream, "text", bloom_path, ckpt, n=3)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        all_ref = spark.createDataFrame(
            ref1 + ref2, "doc_id bigint, text string"
        )
        streamed = sorted(map(tuple, load_bloom(spark, bloom_path).collect()))
        whole = sorted(map(tuple, bloom_build(all_ref, "text", n=3).collect()))
        assert streamed == whole

        corpus = spark.createDataFrame(
            [
                (10, "alpha beta gamma something else entirely"),  # hits ref1
                (11, "totally unrelated text with novel tokens here"),
            ],
            "doc_id bigint, text string",
        )
        via_store = {
            r["doc_id"]
            for r in decontaminate_bloom(
                corpus, None, "doc_id", "text", n=3,
                filter_words=load_bloom(spark, bloom_path),
            ).collect()
        }
        direct = {
            r["doc_id"]
            for r in decontaminate_bloom(
                corpus, all_ref, "doc_id", "text", n=3
            ).collect()
        }
        assert via_store == direct == {11}

    def test_exactly_one_of_benchmark_or_filter(self, spark):
        from ons_utils_spark.operators.corpus import decontaminate_bloom

        corpus = spark.createDataFrame(
            [(1, "a b c")], "doc_id bigint, text string"
        )
        with pytest.raises(ValueError, match="exactly one"):
            decontaminate_bloom(corpus, None, "doc_id", "text")
        with pytest.raises(ValueError, match="exactly one"):
            decontaminate_bloom(
                corpus, corpus, "doc_id", "text",
                filter_words=corpus.limit(0),
            )


class TestStreamingGramIndexMaintenance:
    def test_streamed_index_equals_batch_index_and_dedups(self, spark, tmp_path):
        """Two micro-batches of corpus shards append gram-index deltas;
        the loaded index must equal a one-shot gram_index over all docs
        (min keeper is the lossless merge), and span-deduping a later
        batch against it must equal deduping against the one-shot
        index."""
        from ons_utils_spark.operators.corpus import (
            gram_index,
            load_gram_index,
            self_dedup_spans_incremental,
        )
        from ons_utils_spark.streaming.ingest import gram_index_ingest_writer

        stream_dir = str(tmp_path / "in")
        store = str(tmp_path / "grams")
        ckpt = str(tmp_path / "ckpt")
        shard1 = [(1, "alpha beta gamma delta epsilon zeta")]
        shard2 = [(2, "one two three four five six seven")]
        for rows in (shard1, shard2):
            spark.createDataFrame(
                rows, "doc_id bigint, text string"
            ).coalesce(1).write.mode("append").parquet(stream_dir)

        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            gram_index_ingest_writer(
                stream, "doc_id", "text", store, ckpt, n=3
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        all_docs = spark.createDataFrame(
            shard1 + shard2, "doc_id bigint, text string"
        )
        streamed = sorted(
            map(tuple, load_gram_index(spark, store).collect())
        )
        whole = sorted(
            map(tuple, gram_index(all_docs, "doc_id", "text", n=3).collect())
        )
        assert streamed == whole

        batch = spark.createDataFrame(
            [
                (10, "prefix alpha beta gamma delta suffix"),  # dup vs shard1
                (11, "completely novel never seen tokens here"),
            ],
            "doc_id bigint, text string",
        )
        via_store = sorted(
            map(
                tuple,
                self_dedup_spans_incremental(
                    batch, load_gram_index(spark, store), "doc_id", "text", n=3
                ).collect(),
            )
        )
        via_batch = sorted(
            map(
                tuple,
                self_dedup_spans_incremental(
                    batch,
                    gram_index(all_docs, "doc_id", "text", n=3),
                    "doc_id",
                    "text",
                    n=3,
                ).collect(),
            )
        )
        assert via_store == via_batch
        assert {r[0] for r in via_store} == {10}


class TestStreamingKmvMaintenance:
    def test_streamed_kmv_equals_batch_and_replay_is_idempotent(
        self, spark, tmp_path
    ):
        """Two micro-batches append bottom-k deltas; the loaded sketch
        must equal a one-shot batch build (mergeability), and a REPLAY
        of an already-written batch_id must leave the folded sketch
        unchanged (partition overwrite + idempotent union — the
        at-least-once -> effectively-exactly-once recipe)."""
        from ons_utils_spark.operators.sketches import (
            bottomk_sketch,
            kmv_append_batch,
            kmv_distinct,
            load_kmv,
        )
        from ons_utils_spark.streaming.ingest import kmv_ingest_writer

        stream_dir = str(tmp_path / "in")
        store = str(tmp_path / "kmv")
        ckpt = str(tmp_path / "ckpt")
        rows1 = [(k,) for k in range(40)]
        rows2 = [(k,) for k in range(20, 70)]
        for rows in (rows1, rows2):
            spark.createDataFrame(rows, "k bigint").coalesce(1).write.mode(
                "append"
            ).parquet(stream_dir)

        stream = (
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            kmv_ingest_writer(stream, "k", store, ckpt, k=16)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        streamed = sorted(
            map(tuple, load_kmv(spark, store, 16).collect())
        )
        whole = sorted(
            map(
                tuple,
                bottomk_sketch(
                    spark.createDataFrame(rows1 + rows2, "k bigint"), "k", 16
                ).collect(),
            )
        )
        assert streamed == whole
        est_before = kmv_distinct(load_kmv(spark, store, 16), 16).collect()

        # Replay batch 0 (same batch_id, same rows): the partition is
        # overwritten in place and the folded sketch must not move.
        kmv_append_batch(
            spark.createDataFrame(rows1, "k bigint"), "k", store, k=16,
            batch_id=0,
        )
        assert sorted(
            map(tuple, load_kmv(spark, store, 16).collect())
        ) == streamed
        assert (
            kmv_distinct(load_kmv(spark, store, 16), 16).collect()
            == est_before
        )


class TestStreamingBm25IndexMaintenance:
    def test_streamed_index_equals_batch_build(self, spark, tmp_path):
        """Two document micro-batches append postings + stats deltas;
        retrieval from the folded store must be bit-identical to a
        one-shot index build over the whole corpus (postings union is
        disjoint by the new-docs contract; stats rows SUM)."""
        from ons_utils_spark.operators.text import (
            bm25_index_build,
            bm25_topk_indexed,
            load_bm25_index_incremental,
        )
        from ons_utils_spark.streaming.ingest import bm25_index_ingest_writer

        stream_dir = str(tmp_path / "in")
        store = str(tmp_path / "bm25")
        ckpt = str(tmp_path / "ckpt")
        rows1 = [(1, "spark spark engine"), (2, "rareword here once")]
        rows2 = [(3, "spark and filler words"), (4, "engine spark engine")]
        for rows in (rows1, rows2):
            spark.createDataFrame(
                rows, "doc_id bigint, text string"
            ).coalesce(1).write.mode("append").parquet(stream_dir)

        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            bm25_index_ingest_writer(stream, "doc_id", "text", store, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        postings, stats = load_bm25_index_incremental(spark, store)
        whole_p, whole_s = bm25_index_build(
            spark.createDataFrame(
                rows1 + rows2, "doc_id bigint, text string"
            ),
            "doc_id",
            "text",
        )
        terms = ["spark", "rareword", "engine"]
        streamed = bm25_topk_indexed(postings, stats, terms, topk=4).collect()
        batch = bm25_topk_indexed(whole_p, whole_s, terms, topk=4).collect()
        assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


class TestStreamingIvfPqMaintenance:
    def test_streamed_table_equals_oneshot_build(self, spark, tmp_path):
        """Vector micro-batches encoded with the STORED index and
        appended as batch_id partitions; serving from the grown table
        must be bit-identical to a one-shot build-and-save over the
        whole corpus (per-row encode has no cross-row dependence once
        the index is frozen)."""
        from ons_utils_spark.operators import pq
        from ons_utils_spark.streaming.ingest import ivf_pq_ingest_writer

        vecs = [
            [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)]
            for i in range(40)
        ]
        full = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>",
        )
        coded, coarse, cbs = pq.ivf_pq_build(
            full, dim=8, n_lists=4, m=2, k=2, coarse_iter=1, n_iter=1,
            by_residual=True,
        )
        idx = pq.make_ivf_pq_index(coarse, cbs, by_residual=True)
        store = str(tmp_path / "serve")
        # Base save: the front half; the back half arrives as a stream.
        pq.save_ivf_pq_table(coded.where("id < 20"), idx, store)

        stream_dir = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        for lo, hi in ((20, 30), (30, 40)):
            full.where(
                f"vec_id >= {lo} and vec_id < {hi}"
            ).coalesce(1).write.mode("append").parquet(stream_dir)

        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            ivf_pq_ingest_writer(stream, store, checkpoint_dir=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        lc, li = pq.load_ivf_pq_table(spark, store)
        assert li == idx
        got = sorted(
            (r["id"], tuple(r["codes"]), r["__list"]) for r in lc.collect()
        )
        want = sorted(
            (r["id"], tuple(r["codes"]), r["__list"])
            for r in coded.collect()
        )
        assert got == want
        served = pq.ivf_pq_query(lc, li, vecs[33], n_probe=2, topk=6)
        fresh = pq.ivf_pq_query(coded, li, vecs[33], n_probe=2, topk=6)
        assert [tuple(r) for r in served.collect()] == [
            tuple(r) for r in fresh.collect()
        ]


class TestStreamingIvfSqMaintenance:
    def test_streamed_table_equals_oneshot_build(self, spark, tmp_path):
        """The SQ twin of TestStreamingIvfPqMaintenance: vector
        micro-batches encoded with the STORED SqIndex and appended as
        batch_id partitions; serving from the grown table must be
        bit-identical to a one-shot build over the whole corpus."""
        from ons_utils_spark.operators import similarity as sim
        from ons_utils_spark.streaming.ingest import ivf_sq_ingest_writer

        vecs = [
            [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)]
            for i in range(40)
        ]
        full = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>",
        )
        coded, coarse, vmin, vmax = sim.ivf_sq_build(
            full, dim=8, n_lists=4, coarse_iter=1
        )
        idx = sim.make_sq_index(coarse, vmin, vmax)
        store = str(tmp_path / "serve")
        sim.save_sq_table(coded.where("id < 20"), idx, store)

        stream_dir = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        for lo, hi in ((20, 30), (30, 40)):
            full.where(
                f"vec_id >= {lo} and vec_id < {hi}"
            ).coalesce(1).write.mode("append").parquet(stream_dir)

        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            ivf_sq_ingest_writer(stream, store, checkpoint_dir=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        lc, li = sim.load_sq_table(spark, store)
        assert li == idx
        got = sorted(
            (r["id"], tuple(r["codes"]), r["__list"]) for r in lc.collect()
        )
        want = sorted(
            (r["id"], tuple(r["codes"]), r["__list"])
            for r in coded.collect()
        )
        assert got == want
        served = sim.ivf_sq_query(lc, li, vecs[33], n_probe=2, topk=6)
        fresh = sim.ivf_sq_query(coded, li, vecs[33], n_probe=2, topk=6)
        assert [tuple(r) for r in served.collect()] == [
            tuple(r) for r in fresh.collect()
        ]


class TestHybridIngestWriter:
    def test_streamed_hybrid_equals_oneshot(self, spark, tmp_path):
        """One document stream (text + embedding) maintains BOTH
        retrieval stores; hybrid RRF over the folded stores must be
        bit-identical to in-session one-shot builds over the full
        corpus."""
        from ons_utils_spark.operators import pq, retrieval, text
        from ons_utils_spark.streaming.ingest import hybrid_ingest_writer

        texts = [
            "spark engine merge", "rareword vector stream",
            "spark filler words", "engine spark engine",
            "vector vector merge", "plain text here",
            "stream merge spark", "rareword again",
        ]
        vecs = [
            [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)]
            for i in range(len(texts))
        ]
        rows = [
            (i, texts[i], [float(x) for x in vecs[i]])
            for i in range(len(texts))
        ]
        schema = "doc_id bigint, text string, embedding array<double>"
        full = spark.createDataFrame(rows, schema)

        # Index trained offline on the FIRST half; ANN base save holds
        # that half, the BM25 store starts empty.
        coded, coarse, cbs = pq.ivf_pq_build(
            full, "doc_id", "embedding", dim=8, n_lists=2, m=2, k=2,
            coarse_iter=1, n_iter=1,
        )
        idx = pq.make_ivf_pq_index(coarse, cbs)
        ann_store = str(tmp_path / "ann")
        pq.save_ivf_pq_table(coded.where("id < 0"), idx, ann_store)

        stream_dir = str(tmp_path / "in")
        for lo, hi in ((0, 4), (4, 8)):
            full.where(
                f"doc_id >= {lo} and doc_id < {hi}"
            ).coalesce(1).write.mode("append").parquet(stream_dir)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        bm25_store = str(tmp_path / "bm25")
        q = (
            hybrid_ingest_writer(
                stream, bm25_store, ann_store,
                checkpoint_dir=str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        lp, ls = text.load_bm25_index_incremental(spark, bm25_store)
        lc, li = pq.load_ivf_pq_table(spark, ann_store)
        queries = spark.createDataFrame(
            [(1, ["spark", "rareword"], [float(x) for x in vecs[1]])],
            "query_id bigint, terms array<string>, "
            "embedding array<double>",
        )
        streamed = retrieval.hybrid_batch_topk(
            lp, ls, lc, li, queries, retriever_topk=5, topk=5
        )
        whole_p, whole_s = text.bm25_index_build(full, "doc_id", "text")
        fresh = retrieval.hybrid_batch_topk(
            whole_p, whole_s, coded, idx, queries,
            retriever_topk=5, topk=5,
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, fresh.collect())
        )

    def test_sq_store_auto_detected_and_maintained(self, spark, tmp_path):
        """The hybrid maintainer auto-detects the ANN store's codec
        family from the index meta: the SAME writer maintains an
        IVF×SQ serving table, and hybrid RRF over the folded stores
        (loaded via load_hybrid_stores, which also routes by family)
        equals in-session one-shot builds."""
        from ons_utils_spark.operators import retrieval, text
        from ons_utils_spark.operators import similarity as sim
        from ons_utils_spark.streaming.ingest import hybrid_ingest_writer

        texts = [
            "spark engine merge", "rareword vector stream",
            "spark filler words", "engine spark engine",
            "vector vector merge", "plain text here",
            "stream merge spark", "rareword again",
        ]
        vecs = [
            [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)]
            for i in range(len(texts))
        ]
        rows = [
            (i, texts[i], [float(x) for x in vecs[i]])
            for i in range(len(texts))
        ]
        schema = "doc_id bigint, text string, embedding array<double>"
        full = spark.createDataFrame(rows, schema)

        coded, coarse, vmin, vmax = sim.ivf_sq_build(
            full, "doc_id", "embedding", dim=8, n_lists=2, coarse_iter=1
        )
        idx = sim.make_sq_index(coarse, vmin, vmax)
        ann_store = str(tmp_path / "ann_sq")
        sim.save_sq_table(coded.where("id < 0"), idx, ann_store)
        assert retrieval.ann_store_family(spark, ann_store) == "sq"

        stream_dir = str(tmp_path / "in")
        for lo, hi in ((0, 4), (4, 8)):
            full.where(
                f"doc_id >= {lo} and doc_id < {hi}"
            ).coalesce(1).write.mode("append").parquet(stream_dir)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        bm25_store = str(tmp_path / "bm25")
        q = (
            hybrid_ingest_writer(
                stream, bm25_store, ann_store,
                checkpoint_dir=str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        lp, ls, lc, li = retrieval.load_hybrid_stores(
            spark, bm25_store, ann_store
        )
        assert isinstance(li, sim.SqIndex)
        queries = spark.createDataFrame(
            [(1, ["spark", "rareword"], [float(x) for x in vecs[1]])],
            "query_id bigint, terms array<string>, "
            "embedding array<double>",
        )
        streamed = retrieval.hybrid_batch_topk(
            lp, ls, lc, li, queries, retriever_topk=5, topk=5
        )
        whole_p, whole_s = text.bm25_index_build(full, "doc_id", "text")
        fresh = retrieval.hybrid_batch_topk(
            whole_p, whole_s, coded, idx, queries,
            retriever_topk=5, topk=5,
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, fresh.collect())
        )


class TestHybridCdcIngestWriter:
    def test_streamed_changes_equal_oneshot_net_corpus(
        self, spark, tmp_path
    ):
        """Two CDC micro-batches (inserts, then insert+update+delete)
        through hybrid_cdc_ingest_writer: both stores must serve the
        NET corpus bit-identically to one-shot builds — the update's
        new text/vector lives, the deleted doc is gone, and the
        even/odd split keeps every partition replay-owned."""
        from ons_utils_spark.operators import pq, text
        from ons_utils_spark.streaming.ingest import (
            hybrid_cdc_ingest_writer,
        )

        texts = [
            "spark engine merge", "rareword vector stream",
            "spark filler words", "engine spark engine",
            "vector vector merge", "plain text here",
        ]
        vecs = [
            [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)]
            for i in range(8)
        ]
        schema = (
            "doc_id bigint, text string, embedding array<double>, "
            "op string"
        )
        batch0 = spark.createDataFrame(
            [
                (i, texts[i], [float(x) for x in vecs[i]], "I")
                for i in range(4)
            ],
            schema,
        )
        upd_vec = [float(x) for x in vecs[6]]
        batch1 = spark.createDataFrame(
            [
                (4, texts[4], [float(x) for x in vecs[4]], "I"),
                (5, texts[5], [float(x) for x in vecs[5]], "I"),
                (1, "rewritten rareword body", upd_vec, "U"),
                (2, "", [0.0] * 8, "D"),
            ],
            schema,
        )

        # Index trained offline; ANN base save empty (bootstrap).
        train = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(8)],
            "doc_id bigint, embedding array<double>",
        )
        coded, coarse, cbs = pq.ivf_pq_build(
            train, "doc_id", "embedding", dim=8, n_lists=2, m=2, k=2,
            coarse_iter=1, n_iter=1,
        )
        idx = pq.make_ivf_pq_index(coarse, cbs)
        ann_store = str(tmp_path / "ann")
        pq.save_ivf_pq_table(coded.where("id < 0"), idx, ann_store)

        stream_dir = str(tmp_path / "in")
        batch0.coalesce(1).write.mode("append").parquet(stream_dir)
        batch1.coalesce(1).write.mode("append").parquet(stream_dir)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        bm25_store = str(tmp_path / "bm25")
        q = (
            hybrid_cdc_ingest_writer(
                stream, bm25_store, ann_store,
                checkpoint_dir=str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        # Net corpus: 0, 3, 4, 5 original; 1 rewritten; 2 gone.
        net_rows = [
            (0, texts[0], [float(x) for x in vecs[0]]),
            (3, texts[3], [float(x) for x in vecs[3]]),
            (4, texts[4], [float(x) for x in vecs[4]]),
            (5, texts[5], [float(x) for x in vecs[5]]),
            (1, "rewritten rareword body", upd_vec),
        ]
        net = spark.createDataFrame(
            net_rows, "doc_id bigint, text string, embedding array<double>"
        )

        lp, ls = text.load_bm25_index_incremental(spark, bm25_store)
        p1, s1 = text.bm25_index_build(net, "doc_id", "text")
        got_p = [
            tuple(r)
            for r in lp.select("term", "id", "tf", "dl")
            .orderBy("term", "id").collect()
        ]
        want_p = [
            tuple(r)
            for r in p1.select("term", "id", "tf", "dl")
            .orderBy("term", "id").collect()
        ]
        assert got_p == want_p
        assert ls.collect()[0]["n"] == s1.collect()[0]["n"]

        lc, li = pq.load_ivf_pq_table(spark, ann_store)
        ids = {r["id"] for r in lc.select("id").collect()}
        assert ids == {0, 1, 3, 4, 5}
        want_coded = pq.ivf_pq_encode(
            net, li, "doc_id", "embedding"
        ).select("id", "codes", "__list")
        got_q = pq.ivf_pq_query(lc, li, upd_vec, n_probe=2, topk=5)
        want_q = pq.ivf_pq_query(
            want_coded, li, upd_vec, n_probe=2, topk=5
        )
        assert [tuple(r) for r in got_q.orderBy("id").collect()] == [
            tuple(r) for r in want_q.orderBy("id").collect()
        ]


class TestRagIngestWriter:
    def test_streamed_chunks_equal_oneshot_pipeline(self, spark, tmp_path):
        """RAW documents stream in; the writer chunks, hash-embeds and
        appends both stores at chunk granularity — serving over the
        folded stores equals the one-shot chunk/embed/build (the
        q_rag_ingest_retrieve composition, streamed)."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators import retrieval, text
        from ons_utils_spark.operators import similarity as sim
        from ons_utils_spark.streaming.ingest import rag_ingest_writer

        texts = [
            "spark engine merge vector stream alpha beta gamma",
            "rareword vector stream merge spark engine delta",
            "plain filler words only here nothing shared",
            "stream merge spark vector rareword epsilon zeta eta",
        ]
        schema = "doc_id bigint, text string"
        full = spark.createDataFrame(list(enumerate(texts)), schema)

        chunks_full = text.hash_embed(
            text.chunk_documents(
                full, "doc_id", "text", chunk_tokens=4, overlap=1
            ).select(
                (F.col("id") * 1000 + F.col("chunk_id"))
                .cast("long").alias("__chunk_key"),
                "chunk_text",
            ),
            "chunk_text", dim=8,
        ).localCheckpoint(eager=True)

        # index trained offline on the full chunk corpus, stored EMPTY
        # — every chunk then arrives via the stream
        coded, coarse, vmin, vmax = sim.ivf_sq_build(
            chunks_full, "__chunk_key", "embedding",
            dim=8, n_lists=2, coarse_iter=1,
        )
        idx = sim.make_sq_index(coarse, vmin, vmax)
        ann_store = str(tmp_path / "ann")
        sim.save_sq_table(coded.where("id < 0"), idx, ann_store)

        stream_dir = str(tmp_path / "in")
        for lo, hi in ((0, 2), (2, 4)):
            full.where(
                f"doc_id >= {lo} and doc_id < {hi}"
            ).coalesce(1).write.mode("append").parquet(stream_dir)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        bm25_store = str(tmp_path / "bm25")
        q = (
            rag_ingest_writer(
                stream, bm25_store, ann_store,
                checkpoint_dir=str(tmp_path / "ckpt"),
                chunk_tokens=4, overlap=1, embed_dim=8,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        lp, ls, lc, li = retrieval.load_hybrid_stores(
            spark, bm25_store, ann_store
        )
        qvec = text.hash_embed(
            spark.createDataFrame(
                [("rareword vector",)], "qt string"
            ), "qt", dim=8,
        ).collect()[0]["embedding"]
        queries = spark.createDataFrame(
            [(1, ["rareword", "vector"], [float(x) for x in qvec])],
            "query_id bigint, terms array<string>, "
            "embedding array<double>",
        )
        streamed = retrieval.hybrid_batch_topk(
            lp, ls, lc, li, queries, retriever_topk=5, topk=5
        )
        whole_p, whole_s = text.bm25_index_build(
            chunks_full, "__chunk_key", "chunk_text"
        )
        fresh = retrieval.hybrid_batch_topk(
            whole_p, whole_s, coded, idx, queries,
            retriever_topk=5, topk=5,
        )
        got = sorted(map(tuple, streamed.collect()))
        assert got == sorted(map(tuple, fresh.collect()))
        assert got  # the equality must not be vacuous

    def test_chunk_key_aliasing_refused(self, spark, tmp_path):
        """A document chunking past chunk_id_factor would alias another
        document's keys — the writer must refuse the batch loudly, not
        let the BM25 witness discover a corrupt store later."""
        import pytest as _pytest

        from ons_utils_spark.operators import similarity as sim
        from ons_utils_spark.streaming.ingest import rag_ingest_writer

        long_doc = " ".join(f"tok{i}" for i in range(40))
        schema = "doc_id bigint, text string"
        df = spark.createDataFrame([(7, long_doc)], schema)

        base = sim.sq_train(
            spark.createDataFrame(
                [(0, [0.0] * 8)], "id bigint, embedding array<double>"
            ), dim=8,
        )
        coded, coarse, vmin, vmax = sim.ivf_sq_build(
            spark.createDataFrame(
                [(0, [0.0] * 8), (1, [1.0] * 8)],
                "vec_id bigint, embedding array<double>",
            ), dim=8, n_lists=1, coarse_iter=1,
        )
        idx = sim.make_sq_index(coarse, vmin, vmax)
        ann_store = str(tmp_path / "ann")
        sim.save_sq_table(coded.where("id < 0"), idx, ann_store)

        stream_dir = str(tmp_path / "in")
        df.coalesce(1).write.parquet(stream_dir)
        stream = spark.readStream.schema(schema).parquet(stream_dir)
        q = (
            rag_ingest_writer(
                stream, str(tmp_path / "bm25"), ann_store,
                checkpoint_dir=str(tmp_path / "ckpt"),
                chunk_tokens=4, overlap=1, embed_dim=8,
                chunk_id_factor=4,  # 40 tokens / stride 3 >> 4 chunks
            )
            .trigger(availableNow=True)
            .start()
        )
        with _pytest.raises(Exception, match="chunk_id_factor"):
            q.awaitTermination(120)
