"""Corpus-preparation operator tests: decontamination, sequence packing,
pattern redaction, and the incremental MinHash join."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.corpus import (
    PII_PATTERNS,
    decontaminate,
    pack_sequences,
    redact_patterns,
)
from ons_utils_spark.operators.dedup import minhash_lsh_join

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun shines "
    "bright above the quiet green valley and birds sing old songs"
)
NEAR = BASE.replace("quiet green valley", "quiet blue valley")
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with adaptive partitioning across many worker nodes today"
)


class TestDecontaminate:
    @pytest.fixture()
    def corpus(self, spark):
        return spark.createDataFrame(
            [(1, BASE), (2, NEAR), (3, OTHER)], "doc_id bigint, text string"
        )

    @pytest.fixture()
    def bench_df(self, spark):
        # Shares an 8-gram run with BASE/NEAR, nothing with OTHER.
        return spark.createDataFrame(
            [(100, "essay: " + BASE[:90])], "bench_id bigint, text string"
        )

    def test_drop_removes_overlapping_docs(self, spark, corpus, bench_df):
        clean = decontaminate(corpus, bench_df, "doc_id", "text", n=8)
        assert [r["doc_id"] for r in clean.collect()] == [3]

    def test_flag_mode_keeps_all_rows(self, spark, corpus, bench_df):
        flagged = decontaminate(
            corpus, bench_df, "doc_id", "text", n=8, mode="flag"
        )
        got = {r["doc_id"]: r["contaminated"] for r in flagged.collect()}
        assert got == {1: True, 2: True, 3: False}

    def test_no_overlap_is_identity(self, spark, corpus):
        bench = corpus.sparkSession.createDataFrame(
            [(9, "zz yy xx ww vv uu tt ss rr qq pp oo")],
            "bench_id bigint, text string",
        )
        clean = decontaminate(corpus, bench, "doc_id", "text", n=8)
        assert clean.count() == 3

    def test_bad_mode_raises(self, spark, corpus, bench_df):
        with pytest.raises(ValueError, match="mode"):
            decontaminate(corpus, bench_df, "doc_id", "text", mode="nope")


class TestDecontaminateBloom:
    """decontaminate_bloom — fixed-size Bloom membership instead of a
    broadcast gram list. No false negatives EVER; false positives are a
    sized trade (≈2^-k at m = 1.44·k·n_grams), and at the test sizes
    (m=2^20 bits vs a handful of grams) they are vanishingly unlikely,
    so bloom ≡ exact on these fixtures."""

    @pytest.fixture()
    def corpus(self, spark):
        return spark.createDataFrame(
            [(1, BASE), (2, NEAR), (3, OTHER)], "doc_id bigint, text string"
        )

    @pytest.fixture()
    def bench_df(self, spark):
        return spark.createDataFrame(
            [(100, "essay: " + BASE[:90])], "bench_id bigint, text string"
        )

    def test_matches_exact_on_fixture(self, spark, corpus, bench_df):
        from ons_utils_spark.operators.corpus import decontaminate_bloom

        exact = {
            r["doc_id"]
            for r in decontaminate(
                corpus, bench_df, "doc_id", "text", n=8
            ).collect()
        }
        bloom = {
            r["doc_id"]
            for r in decontaminate_bloom(
                corpus, bench_df, "doc_id", "text", n=8
            ).collect()
        }
        assert bloom == exact == {3}

    def test_no_false_negatives_on_real_corpus(self, spark):
        """The structural Bloom guarantee on the parquet corpus: every
        doc the exact operator drops, the bloom operator drops too."""
        from ons_utils_spark.operators.corpus import decontaminate_bloom
        from ons_utils_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        bench = docs.where(F.col("doc_id") % 50 == 0)
        corp = docs.where(F.col("doc_id") % 50 != 0)
        exact_clean = {
            r["doc_id"]
            for r in decontaminate(
                corp, bench, "doc_id", "text", n=4
            ).select("doc_id").collect()
        }
        bloom_clean = {
            r["doc_id"]
            for r in decontaminate_bloom(
                corp, bench, "doc_id", "text", n=4
            ).select("doc_id").collect()
        }
        assert bloom_clean <= exact_clean  # bloom may only OVER-drop

    def test_flag_mode_and_validation(self, spark, corpus, bench_df):
        from ons_utils_spark.operators.corpus import decontaminate_bloom

        flagged = decontaminate_bloom(
            corpus, bench_df, "doc_id", "text", n=8, mode="flag"
        )
        got = {r["doc_id"]: r["contaminated"] for r in flagged.collect()}
        assert got == {1: True, 2: True, 3: False}
        assert "__bf" not in flagged.columns and "__grams" not in flagged.columns
        with pytest.raises(ValueError, match="m_bits"):
            decontaminate_bloom(
                corpus, bench_df, "doc_id", "text", m_bits=1000
            )
        with pytest.raises(ValueError, match="mode"):
            decontaminate_bloom(
                corpus, bench_df, "doc_id", "text", mode="nope"
            )

    def test_empty_benchmark_keeps_everything(self, spark, corpus, bench_df):
        from ons_utils_spark.operators.corpus import decontaminate_bloom

        empty = bench_df.limit(0)
        assert decontaminate_bloom(
            corpus, empty, "doc_id", "text", n=8
        ).count() == 3

    def test_xxh64_long_matches_spark(self, spark):
        """The vectorized probe's hashLong replay is bit-identical to
        F.xxhash64 — the chained two-arg form the probe positions use."""
        from ons_utils_spark.operators.corpus import _xxh64_long_py

        vals = [0, 1, -1, 42, 2**62, -(2**62), 123456789123456789]
        df = spark.createDataFrame([(v,) for v in vals], "g bigint")
        rows = df.select(
            "g",
            *[
                F.xxhash64(F.lit(j).cast("bigint"), F.col("g")).alias(f"h{j}")
                for j in range(4)
            ],
        ).collect()
        m64 = 1 << 64
        for r in rows:
            for j in range(4):
                seed = _xxh64_long_py(j, 42)
                got = _xxh64_long_py(r["g"] % m64, seed)
                want = r[f"h{j}"] % m64
                assert got == want, (r["g"], j)

    def test_vector_probe_bit_identical_to_exists_path(
        self, spark, monkeypatch
    ):
        """The Arrow vector probe and the broadcast-join `exists` form
        return the SAME flag for every doc — including empty-gram docs
        (too short for an n-gram) and NULL text."""
        import ons_utils_spark.operators.corpus as corpus_mod

        docs = spark.createDataFrame(
            [(1, BASE), (2, NEAR), (3, OTHER), (4, "too short"), (5, None)],
            "doc_id bigint, text string",
        )
        bench = spark.createDataFrame(
            [(100, "essay: " + BASE[:90])], "bench_id bigint, text string"
        )

        def flags():
            return {
                r["doc_id"]: r["contaminated"]
                for r in corpus_mod.decontaminate_bloom(
                    docs, bench, "doc_id", "text", n=8, mode="flag"
                ).collect()
            }

        vec = flags()
        monkeypatch.setattr(corpus_mod, "_BLOOM_VECTOR_MAX_BITS", 0)
        old = flags()
        assert vec == old
        assert vec[1] is True and vec[3] is False


class TestPackSequences:
    def test_packing_layout(self, spark):
        # Tokens: doc1=3, doc2=4, doc3=2 in one group; budget 5.
        df = spark.createDataFrame(
            [(1, "a b c", "g"), (2, "d e f g", "g"), (3, "h i", "g")],
            "doc_id bigint, text string, src string",
        )
        out = {
            r["doc_id"]: (r["n_tokens"], r["seq_no"], r["seq_offset"])
            for r in pack_sequences(df, "doc_id", "text", 5, "src").collect()
        }
        # doc1 starts at 0 -> seq 0; doc2 starts at 3 -> seq 0 (straddles);
        # doc3 starts at 7 -> seq 1, offset 2.
        assert out == {1: (3, 0, 0), 2: (4, 0, 3), 3: (2, 1, 2)}

    def test_groups_pack_independently(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "g1"), (2, "d e", "g2")],
            "doc_id bigint, text string, src string",
        )
        out = {
            r["doc_id"]: r["seq_no"]
            for r in pack_sequences(df, "doc_id", "text", 2, "src").collect()
        }
        assert out == {1: 0, 2: 0}


class TestRedactPatterns:
    def test_default_pii_patterns(self, spark):
        df = spark.createDataFrame(
            [(1, "mail bob@corp.io from 10.0.0.1 call +1 555 0100 now")],
            "id bigint, text string",
        )
        row = redact_patterns(df, "text").collect()[0]
        assert row["email_count"] == 1
        assert row["ipv4_count"] == 1
        assert row["phone_count"] == 1
        assert row["ssn_count"] == 0
        assert row["text"] == "mail [email] from [ipv4] call [phone] now"

    def test_custom_out_col_preserves_original(self, spark):
        df = spark.createDataFrame([(1, "x bob@corp.io")], "id bigint, text string")
        row = redact_patterns(
            df, "text", patterns={"email": PII_PATTERNS["email"]},
            out_col="clean",
        ).collect()[0]
        assert row["text"] == "x bob@corp.io"
        assert row["clean"] == "x [email]"

    def test_counts_off(self, spark):
        df = spark.createDataFrame([(1, "a@b.io")], "id bigint, text string")
        out = redact_patterns(df, "text", counts=False)
        assert out.columns == ["id", "text"]


class TestMinhashLshJoin:
    def test_cross_corpus_pairs_only(self, spark):
        left = spark.createDataFrame(
            [(1, BASE), (3, OTHER)], "doc_id bigint, text string"
        )
        right = spark.createDataFrame(
            [(2, NEAR), (4, OTHER + " extended")], "doc_id bigint, text string"
        )
        got = minhash_lsh_join(left, right, "doc_id", "text", threshold=0.5)
        pairs = {(r["id_left"], r["id_right"]) for r in got.collect()}
        assert (1, 2) in pairs  # BASE ~ NEAR across corpora
        assert (3, 4) in pairs  # OTHER ~ OTHER-extended
        # No left-left / right-right pairs by construction.
        assert all(a in (1, 3) and b in (2, 4) for a, b in pairs)

    def test_jaccard_matches_exact(self, spark):
        left = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
        right = spark.createDataFrame([(2, BASE)], "doc_id bigint, text string")
        row = minhash_lsh_join(left, right, "doc_id", "text").collect()[0]
        assert row["jaccard"] == 1.0

    def test_restrict_verify_equals_carry(self, spark):
        """verify='restrict' (candidate-semi-joined set tables) emits the
        identical (id_left, id_right, jaccard) set as the default carry
        path, and rejects unknown modes."""
        left = spark.createDataFrame(
            [(1, BASE), (3, OTHER), (5, "nothing shared here at all")],
            "doc_id bigint, text string",
        )
        right = spark.createDataFrame(
            [(2, NEAR), (4, OTHER + " extended"), (6, "likewise disjoint")],
            "doc_id bigint, text string",
        )
        carry = {
            (r["id_left"], r["id_right"], r["jaccard"])
            for r in minhash_lsh_join(
                left, right, "doc_id", "text", threshold=0.3
            ).collect()
        }
        restrict = {
            (r["id_left"], r["id_right"], r["jaccard"])
            for r in minhash_lsh_join(
                left, right, "doc_id", "text", threshold=0.3,
                verify="restrict",
            ).collect()
        }
        assert carry == restrict and carry
        with pytest.raises(ValueError, match="verify"):
            minhash_lsh_join(left, right, "doc_id", "text", verify="bogus")


class TestInvariantsOnRandomCorpus:
    """Seeded-random invariant checks (one Spark job each, not
    per-example hypothesis — Spark jobs are too slow for that loop)."""

    @pytest.fixture()
    def rand_docs(self, spark):
        import random

        rng = random.Random(7)
        words = [f"w{i}" for i in range(40)]
        rows = [
            (i, " ".join(rng.choices(words, k=rng.randint(0, 30))),
             f"g{i % 3}")
            for i in range(60)
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string, src string")

    def test_pack_sequences_invariants(self, spark, rand_docs):
        budget = 17
        out = pack_sequences(rand_docs, "doc_id", "text", budget, "src").collect()
        assert len(out) == 60
        by_group = {}
        for r in sorted(out, key=lambda r: (r["src"], r["doc_id"])):
            by_group.setdefault(r["src"], []).append(r)
        for rows in by_group.values():
            running = 0
            prev_seq = 0
            for r in rows:
                # Global position = seq_no * budget + seq_offset == tokens before.
                assert r["seq_no"] * budget + r["seq_offset"] == running
                assert 0 <= r["seq_offset"] < budget
                assert r["seq_no"] >= prev_seq  # nondecreasing in id order
                prev_seq = r["seq_no"]
                running += r["n_tokens"]

    def test_redaction_is_idempotent(self, spark):
        df = spark.createDataFrame(
            [(i, f"msg u{i}@ex{i}.org at 10.1.{i}.9 or +44 20 7946 {1000+i}")
             for i in range(30)],
            "id bigint, text string",
        )
        once = redact_patterns(df, "text", counts=False)
        twice = redact_patterns(once, "text", counts=False)
        assert once.collect() == twice.collect()

    def test_drop_equals_unflagged(self, spark, rand_docs):
        bench = rand_docs.where(F.col("doc_id") % 7 == 0).select(
            F.col("doc_id").alias("bid"), F.col("text")
        )
        corp = rand_docs.where(F.col("doc_id") % 7 != 0)
        dropped = decontaminate(corp, bench, "doc_id", "text", n=3)
        flagged = decontaminate(corp, bench, "doc_id", "text", n=3, mode="flag")
        keep_ids = {r["doc_id"] for r in dropped.collect()}
        unflagged = {
            r["doc_id"] for r in flagged.collect() if not r["contaminated"]
        }
        assert keep_ids == unflagged
        assert keep_ids <= {r["doc_id"] for r in corp.collect()}


class TestMinhashIndexReuse:
    def test_precomputed_index_equals_from_text(self, spark, tmp_path):
        """Joining against a PERSISTED minhash_index gives the same pairs
        as recomputing the right side from text — the incremental-dedup
        contract: index the corpus once, never re-shingle it."""
        from ons_utils_spark.operators.dedup import minhash_index, minhash_lsh_join

        left = spark.createDataFrame(
            [(1, BASE), (3, OTHER)], "doc_id bigint, text string"
        )
        right = spark.createDataFrame(
            [(2, NEAR), (4, OTHER + " extended")], "doc_id bigint, text string"
        )
        from_text = minhash_lsh_join(
            left, right, "doc_id", "text", threshold=0.5
        ).collect()

        idx_path = str(tmp_path / "mh_index")
        minhash_index(right, "doc_id", "text").write.parquet(idx_path)
        stored = spark.read.parquet(idx_path)
        from_index = minhash_lsh_join(
            left, id_col="doc_id", text_col="text", threshold=0.5,
            right_index=stored,
        ).collect()
        key = lambda r: (r["id_left"], r["id_right"])
        assert sorted(from_text, key=key) == sorted(from_index, key=key)

    def test_requires_exactly_one_right(self, spark):
        from ons_utils_spark.operators.dedup import minhash_lsh_join

        df = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="exactly one"):
            minhash_lsh_join(df, df, "doc_id", "text", right_index=df)
        with pytest.raises(ValueError, match="exactly one"):
            minhash_lsh_join(df, id_col="doc_id", text_col="text")


class TestBuildVocab:
    @pytest.fixture()
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "alpha beta alpha gamma"),
                (2, "beta alpha delta"),
                (3, "Alpha BETA beta"),
            ],
            "doc_id bigint, text string",
        )

    def test_counts_rank_and_ids(self, spark, docs):
        from ons_utils_spark.operators.corpus import build_vocab

        rows = {
            r["token"]: (r["n_occurrences"], r["token_id"])
            for r in build_vocab(docs, "text", k=10).collect()
        }
        # alpha 4, beta 4 (case-folded), gamma 1, delta 1 — ties broken
        # lexicographically.
        assert rows == {
            "alpha": (4, 0),
            "beta": (4, 1),
            "delta": (1, 2),
            "gamma": (1, 3),
        }

    def test_k_and_min_count_cut(self, spark, docs):
        from ons_utils_spark.operators.corpus import build_vocab

        top2 = build_vocab(docs, "text", k=2).collect()
        assert [r["token"] for r in top2] == ["alpha", "beta"]
        frequent = build_vocab(docs, "text", k=10, min_count=2).collect()
        assert {r["token"] for r in frequent} == {"alpha", "beta"}

    def test_topk_plan_has_no_full_sort(self, spark, docs):
        from ons_utils_spark.operators.corpus import build_vocab

        plan = (
            build_vocab(docs, "text", k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestOovStats:
    def test_ratio_counts_occurrences_not_types(self, spark):
        from ons_utils_spark.operators.corpus import build_vocab, oov_stats

        docs = spark.createDataFrame(
            [(1, "a a a b"), (2, "c c d e")], "doc_id bigint, text string"
        )
        vocab = build_vocab(docs, "text", k=2)  # 'a' (3) and 'c' (2)
        got = {
            r["doc_id"]: (r["n_tokens"], round(r["oov_ratio"], 6))
            for r in oov_stats(docs, vocab, "doc_id", "text").collect()
        }
        assert got == {1: (4, 0.25), 2: (4, 0.5)}

    def test_external_vocab_column_name(self, spark):
        from ons_utils_spark.operators.corpus import oov_stats

        docs = spark.createDataFrame([(7, "x y z")], "doc_id bigint, text string")
        vocab = spark.createDataFrame([("x",), ("y",)], "term string")
        row = oov_stats(docs, vocab, "doc_id", "text", token_col="term").first()
        assert row["n_tokens"] == 3
        assert round(row["oov_ratio"], 6) == round(1 / 3, 6)


class TestSpanDedup:
    def test_duplicated_span_kept_only_in_smallest_id(self, spark):
        from ons_utils_spark.operators.corpus import span_dedup

        shared = "alpha beta gamma delta"  # 4 tokens = one span
        df = spark.createDataFrame(
            [
                (1, shared + " unique one"),
                (2, shared + " unique two"),
                (3, "totally different text here"),
            ],
            "doc_id bigint, text string",
        )
        out = {
            r["id"]: r
            for r in span_dedup(df, "doc_id", "text", span_tokens=4).collect()
        }
        # Doc 1 (smallest carrier) keeps the shared span; doc 2 loses it.
        assert out[1]["clean_text"] == shared + " unique one"
        assert out[2]["clean_text"] == "unique two"
        assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
        assert out[3]["clean_text"] == "totally different text here"

    def test_unique_docs_pass_through_verbatim(self, spark):
        from ons_utils_spark.operators.corpus import span_dedup

        rows = [(i, " ".join(f"w{i}x{j}" for j in range(10)))
                for i in range(1, 6)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["id"]: r["clean_text"]
               for r in span_dedup(df, "doc_id", "text", span_tokens=4).collect()}
        assert out == {i: t for i, t in rows}

    def test_doc_of_only_boilerplate_vanishes(self, spark):
        from ons_utils_spark.operators.corpus import span_dedup

        df = spark.createDataFrame(
            [(1, "same old span"), (2, "same old span"), (3, "same old span")],
            "doc_id bigint, text string",
        )
        out = {r["id"]: r["clean_text"]
               for r in span_dedup(df, "doc_id", "text", span_tokens=4).collect()}
        # Only the keeper survives; the other docs keep zero spans.
        assert out == {1: "same old span"}

    def test_empty_text_yields_no_rows(self, spark):
        from ons_utils_spark.operators.corpus import span_dedup

        df = spark.createDataFrame(
            [(1, ""), (2, "  "), (3, "real content")],
            "doc_id bigint, text string",
        )
        out = {r["id"] for r in span_dedup(df, "doc_id", "text").collect()}
        assert out == {3}


class TestPercentileLengthCap:
    def test_keeps_at_or_below_group_quantile(self, spark):
        from ons_utils_spark.operators.corpus import percentile_length_cap

        df = spark.createDataFrame(
            [("en", i) for i in range(1, 11)] + [("de", 100), ("de", 200)],
            "lang string, n bigint",
        )
        kept = percentile_length_cap(df, "lang", "n", p=0.5).collect()
        by_lang = {}
        for r in kept:
            by_lang.setdefault(r["lang"], []).append(r["n"])
        # en median (linear interp over 1..10) = 5.5 → keeps 1..5;
        # de median of {100,200} = 150 → keeps 100.
        assert sorted(by_lang["en"]) == [1, 2, 3, 4, 5]
        assert by_lang["de"] == [100]
        caps = {r["lang"]: r["__cap"] for r in kept}
        assert caps["en"] == 5.5 and caps["de"] == 150.0

    def test_bad_p_raises(self, spark):
        from ons_utils_spark.operators.corpus import percentile_length_cap

        df = spark.createDataFrame([("en", 1)], "lang string, n bigint")
        with pytest.raises(ValueError, match="p must be"):
            percentile_length_cap(df, "lang", "n", p=1.5)

    def test_null_group_forms_its_own_group(self, spark):
        """Rows with a NULL group key are capped against each other —
        NOT silently dropped by a null-rejecting equi-join."""
        from ons_utils_spark.operators.corpus import percentile_length_cap

        df = spark.createDataFrame(
            [("en", 1), ("en", 9), (None, 10), (None, 20), (None, 300)],
            "lang string, n bigint",
        )
        kept = percentile_length_cap(df, "lang", "n", p=0.5).collect()
        by_lang = {}
        for r in kept:
            by_lang.setdefault(r["lang"], []).append(r["n"])
        # NULL-group median of {10, 20, 300} = 20 → keeps 10 and 20.
        assert sorted(by_lang[None]) == [10, 20]
        assert sorted(by_lang["en"]) == [1]


class TestVocabCoverage:
    def test_known_distribution(self, spark):
        from ons_utils_spark.operators.corpus import vocab_coverage

        # 10 "a", 5 "b", 3 "c", 2 "d" -> 20 occurrences total
        df = spark.createDataFrame(
            [("a " * 10 + "b " * 5 + "c " * 3 + "d " * 2,)], "text string"
        )
        rows = {r["k"]: r["coverage"] for r in
                vocab_coverage(df, "text", ks=(1, 2, 4)).collect()}
        assert rows == {1: 0.5, 2: 0.75, 4: 1.0}

    def test_ks_beyond_vocab_clamped_to_full_coverage(self, spark):
        """'Does a 100-token vocab cover this 2-token corpus?' answers
        (100, 1.0) — not a silently missing row."""
        from ons_utils_spark.operators.corpus import vocab_coverage

        df = spark.createDataFrame([("x y",)], "text string")
        rows = {r["k"]: r["coverage"] for r in
                vocab_coverage(df, "text", ks=(1, 100)).collect()}
        assert rows == {1: 0.5, 100: 1.0}

    def test_every_requested_k_appears_once(self, spark):
        from ons_utils_spark.operators.corpus import vocab_coverage

        df = spark.createDataFrame([("a a b",)], "text string")
        rows = vocab_coverage(df, "text", ks=(1, 2, 7, 9)).collect()
        assert [r["k"] for r in rows] == [1, 2, 7, 9]
        assert [r["coverage"] for r in rows] == [
            round(2 / 3, 6), 1.0, 1.0, 1.0
        ]

    def test_rejects_bad_ks(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.corpus import vocab_coverage

        df = spark.createDataFrame([("x",)], "text string")
        with _pytest.raises(ValueError):
            vocab_coverage(df, "text", ks=(0,))


class TestDsir:
    def _corpus(self, spark):
        # Three "english-ish" docs, three "code-ish" docs: the target
        # sample is the english side, so english docs must score higher.
        rows = [
            (1, "the cat sat on the mat and the dog sat too", "en"),
            (2, "a cat and a dog sat on the mat all day", "en"),
            (3, "the quick brown fox jumps over the lazy dog", "en"),
            (4, "def foo ( x ) : return x + 1 # code", "code"),
            (5, "import numpy as np ; x = np . zeros ( 3 )", "code"),
            (6, "class Bar : pass # more code tokens here", "code"),
        ]
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string"
        )

    def test_target_like_docs_score_higher(self, spark):
        from ons_utils_spark.operators.corpus import dsir_log_weights
        import pyspark.sql.functions as F

        corpus = self._corpus(spark)
        target = corpus.where(F.col("lang") == "en")
        w = {
            r["id"]: r["log_weight"]
            for r in dsir_log_weights(corpus, target, "doc_id", "text").collect()
        }
        assert len(w) == 6
        assert min(w[1], w[2], w[3]) > max(w[4], w[5], w[6])

    def test_deterministic_across_runs(self, spark):
        from ons_utils_spark.operators.corpus import dsir_log_weights
        import pyspark.sql.functions as F

        corpus = self._corpus(spark)
        target = corpus.where(F.col("lang") == "en")
        a = sorted(map(tuple, dsir_log_weights(corpus, target, "doc_id", "text").collect()))
        b = sorted(map(tuple, dsir_log_weights(corpus, target, "doc_id", "text").collect()))
        assert a == b

    def test_uniform_target_gives_near_zero_weights(self, spark):
        """target == corpus → p̂_t == p̂_r → every weight is exactly 0."""
        from ons_utils_spark.operators.corpus import dsir_log_weights

        corpus = self._corpus(spark)
        w = dsir_log_weights(corpus, corpus, "doc_id", "text").collect()
        assert all(r["log_weight"] == 0.0 for r in w)

    def test_short_docs_produce_no_row(self, spark):
        from ons_utils_spark.operators.corpus import dsir_log_weights

        corpus = self._corpus(spark).unionByName(
            self._corpus(spark).sparkSession.createDataFrame(
                [(7, "single", "en")], "doc_id bigint, text string, lang string"
            )
        )
        ids = {r["id"] for r in dsir_log_weights(corpus, corpus, "doc_id", "text").collect()}
        assert 7 not in ids and len(ids) == 6

    def test_validation(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.corpus import dsir_log_weights

        corpus = self._corpus(spark)
        with _pytest.raises(ValueError, match="power of two"):
            dsir_log_weights(corpus, corpus, "doc_id", "text", buckets=1000)
        with _pytest.raises(ValueError, match="alpha"):
            dsir_log_weights(corpus, corpus, "doc_id", "text", alpha=0.0)

    def test_resample_contract(self, spark):
        from ons_utils_spark.operators.corpus import dsir_resample
        import pyspark.sql.functions as F

        corpus = self._corpus(spark)
        target = corpus.where(F.col("lang") == "en")
        sel = dsir_resample(corpus, target, "doc_id", "text", k=3)
        rows_a = sorted(map(tuple, sel.collect()))
        rows_b = sorted(map(tuple, dsir_resample(corpus, target, "doc_id", "text", k=3).collect()))
        assert rows_a == rows_b  # deterministic
        assert len(rows_a) == 3
        assert {r[0] for r in rows_a} <= {1, 2, 3, 4, 5, 6}

    def test_resample_follows_weights_in_the_limit(self, spark):
        """With an overwhelming weight gap, the target-like docs win
        regardless of the Gumbel noise (|log w| gap >> noise scale)."""
        from ons_utils_spark.operators.corpus import dsir_resample
        import pyspark.sql.functions as F

        # Repeat the english text many times so its bigrams dominate.
        rows = [
            (1, " ".join(["the cat sat on the mat"] * 30), "en"),
            (2, " ".join(["a dog ran in the park"] * 30), "en"),
            (3, " ".join(["import numpy as np ; x = 1"] * 30), "code"),
        ]
        corpus = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string"
        )
        target = corpus.where(F.col("lang") == "en")
        sel = {r["id"] for r in dsir_resample(corpus, target, "doc_id", "text", k=2).collect()}
        assert sel == {1, 2}


class TestContaminatedSpans:
    """Span-level decontamination: merged token intervals of benchmark
    overlap, for surgical redaction instead of doc dropping."""

    def test_single_quote_one_merged_span(self, spark):
        from ons_utils_spark.operators.corpus import contaminated_spans

        quote = "q0 q1 q2 q3 q4 q5 q6 q7"
        doc = "a0 a1 a2 a3 a4 " + quote + " b0 b1 b2 b3 b4 b5 b6"
        corpus = spark.createDataFrame(
            [(1, doc), (2, "c0 c1 c2 c3 c4 c5")], "doc_id bigint, text string"
        )
        bench = spark.createDataFrame(
            [(9, "x0 " + quote + " x1")], "bench_id bigint, text string"
        )
        got = sorted(
            map(
                tuple,
                contaminated_spans(corpus, bench, "doc_id", "text", n=4).collect(),
            )
        )
        # quote occupies tokens 5..12 → 4-gram hits at 5..9 → span [5, 13)
        assert got == [(1, 5, 13)]

    def test_two_separated_quotes_two_spans(self, spark):
        from ons_utils_spark.operators.corpus import contaminated_spans

        q1, q2 = "q0 q1 q2 q3", "r0 r1 r2 r3"
        doc = q1 + " m0 m1 m2 m3 m4 m5 " + q2
        corpus = spark.createDataFrame(
            [(1, doc)], "doc_id bigint, text string"
        )
        bench = spark.createDataFrame(
            [(9, q1 + " zz " + q2)], "bench_id bigint, text string"
        )
        got = sorted(
            map(
                tuple,
                contaminated_spans(corpus, bench, "doc_id", "text", n=4).collect(),
            )
        )
        assert got == [(1, 0, 4), (1, 10, 14)]

    def test_no_overlap_no_rows(self, spark):
        from ons_utils_spark.operators.corpus import contaminated_spans

        corpus = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id bigint, text string"
        )
        bench = spark.createDataFrame(
            [(9, "x y z w v u")], "bench_id bigint, text string"
        )
        assert (
            contaminated_spans(corpus, bench, "doc_id", "text", n=4).count() == 0
        )

    def test_spans_agree_with_doc_level_decontaminate(self, spark):
        """A doc has ≥1 contaminated span iff doc-level decontaminate
        flags it — the two operators define the same overlap predicate."""
        from ons_utils_spark.operators.corpus import contaminated_spans
        from ons_utils_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        bench = docs.where(F.col("doc_id") % 50 == 0)
        corp = docs.where(F.col("doc_id") % 50 != 0)
        span_docs = {
            r["id"]
            for r in contaminated_spans(corp, bench, "doc_id", "text", n=4)
            .select("id")
            .distinct()
            .collect()
        }
        flagged = {
            r["doc_id"]
            for r in decontaminate(
                corp, bench, "doc_id", "text", n=4, mode="flag"
            ).collect()
            if r["contaminated"]
        }
        assert span_docs == flagged


class TestApplySpanRedaction:
    def test_span_collapses_to_one_marker(self, spark):
        from ons_utils_spark.operators.corpus import (
            apply_span_redaction,
            contaminated_spans,
        )

        quote = "q0 q1 q2 q3 q4 q5 q6 q7"
        doc = "a0 a1 a2 a3 a4 " + quote + " b0 b1 b2"
        corpus = spark.createDataFrame(
            [(1, doc), (2, "c0 c1 c2")], "doc_id bigint, text string"
        )
        bench = spark.createDataFrame(
            [(9, "x " + quote + " y")], "bench_id bigint, text string"
        )
        spans = contaminated_spans(corpus, bench, "doc_id", "text", n=4)
        out = {
            r["doc_id"]: r["text"]
            for r in apply_span_redaction(
                corpus, spans, "doc_id", "text"
            ).collect()
        }
        assert out[1] == "a0 a1 a2 a3 a4 [redacted] b0 b1 b2"

    def test_clean_docs_keep_original_bytes(self, spark):
        from ons_utils_spark.operators.corpus import apply_span_redaction

        original = "  MiXeD   Case    spacing  "
        corpus = spark.createDataFrame(
            [(2, original)], "doc_id bigint, text string"
        )
        spans = spark.createDataFrame(
            [], "id bigint, span_start int, span_end int"
        )
        out = apply_span_redaction(corpus, spans, "doc_id", "text").collect()
        assert out[0]["text"] == original  # untouched, not re-tokenized

    def test_custom_replacement_and_multiple_spans(self, spark):
        from ons_utils_spark.operators.corpus import apply_span_redaction

        corpus = spark.createDataFrame(
            [(1, "t0 t1 t2 t3 t4 t5 t6 t7")], "doc_id bigint, text string"
        )
        spans = spark.createDataFrame(
            [(1, 0, 2), (1, 5, 7)], "id bigint, span_start int, span_end int"
        )
        out = apply_span_redaction(
            corpus, spans, "doc_id", "text", replacement="<X>"
        ).collect()
        assert out[0]["text"] == "<X> t2 t3 t4 <X> t7"


class TestSpanRedactionBroadcast:
    """broadcast_spans — the small-side strategy: the aggregated span
    table is a few percent of the corpus, so by default it broadcasts
    and the corpus never shuffles for the join-back."""

    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "e f g h")], "doc_id bigint, text string"
        )
        spans = spark.createDataFrame(
            [(1, 1, 3)], "id bigint, span_start int, span_end int"
        )
        return corpus, spans

    def test_default_plan_broadcasts_the_spans(self, spark):
        from ons_utils_spark.operators.corpus import apply_span_redaction

        corpus, spans = self._frames(spark)
        plan = (
            apply_span_redaction(corpus, spans, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_opt_out_falls_back_to_shuffle_join(self, spark):
        from ons_utils_spark.operators.corpus import apply_span_redaction

        corpus, spans = self._frames(spark)
        out = apply_span_redaction(
            corpus, spans, "doc_id", "text", broadcast_spans=False
        )
        # Same result either way — the flag is a physical-plan choice.
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got == {1: "a [redacted] d", 2: "e f g h"}


class TestBloomFprCalibration:
    """Pin the measured false-positive rate against the standard Bloom
    bound fpr = (1 - e^(-k*n/m))^k. The filter's determinism is covered
    elsewhere; this test proves the SIZING RULE is trustworthy — an
    operator whose real FPR drifted from theory (biased hashing, probe
    position reuse) would over-drop clean documents silently."""

    def test_measured_fpr_within_3x_of_theory(self, spark):
        import math

        from pyspark.sql import functions as F

        from ons_utils_spark.operators.corpus import decontaminate_bloom

        n_inserted, n_probes, m_bits, k = 1000, 5000, 8192, 4
        # one distinct bigram per benchmark doc / per probe doc, token
        # vocabularies disjoint → every flagged probe is a FALSE positive
        bench = spark.createDataFrame(
            [(i, f"b{i} c{i}") for i in range(n_inserted)],
            "bench_id bigint, text string",
        )
        clean = spark.createDataFrame(
            [(j, f"x{j} y{j}") for j in range(n_probes)],
            "id bigint, text string",
        )
        flagged = (
            decontaminate_bloom(
                clean, bench, "id", "text",
                n=2, m_bits=m_bits, k=k, mode="flag",
            )
            .where(F.col("contaminated"))
            .count()
        )
        measured = flagged / n_probes
        theory = (1 - math.exp(-k * n_inserted / m_bits)) ** k
        # theory ≈ 0.022 → ~110 expected FPs; 3x both ways is >10 sigma
        assert theory / 3 <= measured <= 3 * theory, (
            f"measured fpr {measured:.4f} vs theory {theory:.4f}"
        )


class TestSelfDedupSpans:
    """self_dedup_spans — arbitrary-alignment cross-doc exact-substring
    dedup (the suffix-array semantics span_dedup's fixed windows miss):
    every token run of >= n tokens appearing verbatim in another doc is
    covered in all NON-keeper docs, whatever the alignment."""

    def _corpus(self, spark):
        shared = "alpha bravo charlie delta echo foxtrot"  # 6 tokens
        docs = [
            # keeper (min id among carriers of the shared run)
            (1, "zero one " + shared + " two three"),
            # duplicate at a DIFFERENT alignment (offset 3, not 2)
            (2, "aaa bbb ccc " + shared + " ddd"),
            # unrelated doc
            (3, "unique tokens only here nothing shared at all"),
        ]
        return spark.createDataFrame(docs, "doc_id bigint, text string")

    def test_non_keeper_occurrence_is_covered_exactly(self, spark):
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = self._corpus(spark)
        spans = self_dedup_spans(df, "doc_id", "text", n=4).collect()
        assert [(r["id"], r["span_start"], r["span_end"]) for r in spans] == [
            (2, 3, 9)
        ]

    def test_straddles_fixed_window_boundary(self, spark):
        """The case span_dedup (fixed non-overlapping windows) cannot
        catch: the duplicate sits at different offsets in each doc, so
        no fixed window alignment matches — positional grams do."""
        from ons_utils_spark.operators.corpus import (
            self_dedup_spans,
            span_dedup,
        )

        df = self._corpus(spark)
        fixed = span_dedup(df, "doc_id", "text", span_tokens=4).collect()
        # fixed windows: doc1's shared run covers tokens 2-7, doc2's 3-8 —
        # different window phases, no window repeats, nothing dropped
        assert all(r["n_kept"] == r["n_spans"] for r in fixed)
        spans = self_dedup_spans(df, "doc_id", "text", n=4).collect()
        assert spans  # the arbitrary-alignment operator catches it

    def test_within_doc_repetition_is_not_cross_doc(self, spark):
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = spark.createDataFrame(
            [(1, "rep one two three rep one two three"),
             (2, "totally different words in this doc")],
            "doc_id bigint, text string",
        )
        assert self_dedup_spans(df, "doc_id", "text", n=4).count() == 0

    def test_min_docs_threshold(self, spark):
        from ons_utils_spark.operators.corpus import self_dedup_spans

        shared = "w x y z q"
        df = spark.createDataFrame(
            [(i, f"doc{i} padding " + shared) for i in (1, 2, 3)],
            "doc_id bigint, text string",
        )
        # at min_docs=4 the 3-carrier passage is below threshold
        assert (
            self_dedup_spans(df, "doc_id", "text", n=4, min_docs=4).count()
            == 0
        )
        # at min_docs=3 both non-keepers get spans
        got = self_dedup_spans(df, "doc_id", "text", n=4, min_docs=3)
        assert sorted(r["id"] for r in got.collect()) == [2, 3]

    def test_composes_with_drop_redaction(self, spark):
        from ons_utils_spark.operators.corpus import (
            apply_span_redaction,
            self_dedup_spans,
        )

        df = self._corpus(spark)
        spans = self_dedup_spans(df, "doc_id", "text", n=4)
        out = {
            r["doc_id"]: r["text"]
            for r in apply_span_redaction(
                df, spans, "doc_id", "text", replacement=None
            ).collect()
        }
        assert out[2] == "aaa bbb ccc ddd"  # duplicate passage GONE
        assert out[1] == "zero one alpha bravo charlie delta echo foxtrot two three"
        assert out[3] == "unique tokens only here nothing shared at all"


class TestHotGramGuard:
    """The max_df hot-gram skew guard in self_dedup_spans /
    self_dedup_spans_incremental: grams with >= max_df occurrences take
    a bounded aggregate verdict (no window partition ever buffers a
    boilerplate gram's rows); cold grams take the row-wise window. The
    split must be invisible in the result — pinned against the
    unguarded single-window path."""

    def _boilerplate_corpus(self, spark, n_docs=8):
        # every doc carries the same license-header-style passage (the
        # pathological single-hot-gram shape) plus unique content, and
        # docs 5/6 additionally share a COLD duplicate passage so both
        # paths contribute hits
        header = "licensed under the apache license version two"
        cold_dup = "cold duplicated passage of tokens"
        rows = []
        for i in range(1, n_docs + 1):
            extra = f" {cold_dup}" if i in (5, 6) else ""
            rows.append((i, header + extra + f" unique{i} body{i} tail{i}"))
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    @staticmethod
    def _collect_spans(df):
        return sorted(
            (r["id"], r["span_start"], r["span_end"]) for r in df.collect()
        )

    def test_guarded_spans_identical_to_unguarded(self, spark):
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = self._boilerplate_corpus(spark)
        unguarded = self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=None)
        )
        guarded = self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=3)
        )
        assert guarded == unguarded
        # the header is duplicated in all non-keeper docs (2..8) and the
        # cold passage only in doc 6 (keeper 5)
        assert {i for (i, _, _) in guarded} == {2, 3, 4, 5, 6, 7, 8}

    def test_guarded_spans_identical_min_docs_gt_2(self, spark):
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = self._boilerplate_corpus(spark)
        unguarded = self._collect_spans(
            self_dedup_spans(
                df, "doc_id", "text", n=4, min_docs=3, max_df=None
            )
        )
        guarded = self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, min_docs=3, max_df=3)
        )
        assert guarded == unguarded
        # the 2-carrier cold passage is below min_docs=3; the 8-carrier
        # header survives the threshold
        assert {i for (i, _, _) in guarded} == {2, 3, 4, 5, 6, 7, 8}

    def test_hot_grams_never_reach_the_window(self, spark):
        """The pathological fixture the r8 scale probes could not see:
        every doc is the SAME text, so every gram is hot. The cold side
        (the window's entire input) must be EMPTY — no task sorts or
        buffers the gram table."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.corpus import (
            _split_hot_verdict,
            self_dedup_spans,
            shingle_hash64,
        )

        df = spark.createDataFrame(
            [(i, "same exact boilerplate text in every single document")
             for i in range(1, 9)],
            "doc_id bigint, text string",
        )
        grams = df.select(
            F.col("doc_id").alias("id"),
            F.posexplode(
                shingle_hash64("text", n=4, distinct=False)
            ).alias("pos", "g"),
        )
        hot_flags, cold = _split_hot_verdict(grams, 2, 3)
        assert cold.count() == 0  # nothing left for the window
        assert hot_flags.count() == grams.count()
        # and the end-to-end result still marks docs 2..8 fully covered
        spans = self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=3)
        )
        assert spans == [(i, 0, 8) for i in range(2, 9)]

    def test_window_sits_above_the_cold_filter(self, spark):
        """Plan-shape pin: the guarded plan's per-gram window reads only
        the isnull(__hotdup) side of the broadcast split."""
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = self._boilerplate_corpus(spark)
        plan = (
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=3)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "isnull(__hotdup" in plan
        assert "Window" in plan

    def test_sampled_detection_regime_identical(self, spark):
        """max_df >= 128 engages the 1/S row-sample detection path
        (S > 1); results must still match the unguarded window exactly,
        and a 400-carrier boilerplate gram must be detected hot."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.corpus import (
            _split_hot_verdict,
            self_dedup_spans,
            shingle_hash64,
        )

        header = "licensed under the apache license version two"
        df = spark.createDataFrame(
            [(i, header + f" unique{i} body{i}") for i in range(1, 401)],
            "doc_id bigint, text string",
        )
        unguarded = self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=None)
        )
        guarded = self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=128)
        )
        assert guarded == unguarded
        grams = df.select(
            F.col("doc_id").alias("id"),
            F.posexplode(
                shingle_hash64("text", n=4, distinct=False)
            ).alias("pos", "g"),
        )
        hot_flags, cold = _split_hot_verdict(grams, 2, 128)
        assert hot_flags is not None
        # the header's grams (400 occurrences >> max_df) route hot; the
        # unique{i} body{i} tail grams stay cold
        assert hot_flags.where(F.col("__hotdup")).count() > 0

    def test_clean_corpus_early_exits_to_plain_window(self, spark):
        """No gram near max_df -> detection finds no candidate and the
        split returns (None, grams): the caller runs the plain window,
        paying only the checkpoint + sampled-detection probe."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.corpus import (
            _split_hot_verdict,
            self_dedup_spans,
            shingle_hash64,
        )

        df = self._boilerplate_corpus(spark)
        grams = df.select(
            F.col("doc_id").alias("id"),
            F.posexplode(
                shingle_hash64("text", n=4, distinct=False)
            ).alias("pos", "g"),
        )
        hot_flags, cold = _split_hot_verdict(grams, 2, 10_000)
        assert hot_flags is None
        assert cold.count() == grams.count()
        assert self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=10_000)
        ) == self._collect_spans(
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=None)
        )

    def test_single_doc_hot_repetition_is_not_a_duplicate(self, spark):
        """A gram repeated >= max_df times within ONE document is hot by
        occurrence count but has one carrier — no spans."""
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = spark.createDataFrame(
            [(1, " ".join(["loop of four tokens"] * 10)),
             (2, "entirely different second document content")],
            "doc_id bigint, text string",
        )
        assert (
            self_dedup_spans(df, "doc_id", "text", n=4, max_df=3).count()
            == 0
        )

    def test_incremental_guarded_identical_to_unguarded(self, spark):
        from ons_utils_spark.operators.corpus import (
            gram_index,
            self_dedup_spans_incremental,
        )

        prior = spark.createDataFrame(
            [(1, "indexed corpus passage alpha beta gamma delta"),
             (2, "another indexed document with other words")],
            "doc_id bigint, text string",
        )
        index = gram_index(prior, "doc_id", "text", n=4)
        batch = self._boilerplate_corpus(spark).withColumn(
            "doc_id", F.col("doc_id") + 100
        ).withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(" indexed corpus passage alpha beta gamma delta"),
            ),
        )
        unguarded = self._collect_spans(
            self_dedup_spans_incremental(
                batch, index, "doc_id", "text", n=4, max_df=None
            )
        )
        guarded = self._collect_spans(
            self_dedup_spans_incremental(
                batch, index, "doc_id", "text", n=4, max_df=3
            )
        )
        assert guarded == unguarded
        # every batch doc ends with an indexed passage -> all 8 hit
        assert {i for (i, _, _) in guarded} == set(range(101, 109))

    def test_mixed_n_index_raises_naming_both(self, spark):
        from ons_utils_spark.operators.corpus import (
            gram_index,
            load_gram_index,
            self_dedup_spans_incremental,
        )

        docs = spark.createDataFrame(
            [(1, "one two three four five six seven")],
            "doc_id bigint, text string",
        )
        mixed = gram_index(docs, "doc_id", "text", n=4).unionByName(
            gram_index(docs, "doc_id", "text", n=5)
        )
        with pytest.raises(ValueError, match=r"n=\[4, 5\]"):
            self_dedup_spans_incremental(docs, mixed, "doc_id", "text", n=4)
        # and the store read path validates too
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            mixed.write.parquet(d + "/idx")
            with pytest.raises(ValueError, match=r"n=\[4, 5\]"):
                load_gram_index(spark, d + "/idx")

    def test_partly_unstamped_index_raises_naming_null(self, spark):
        """NULL stamps mixed with a value (a legacy writer's partition)
        raise the clear mixed-sizes error, not a sort TypeError."""
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.corpus import (
            gram_index,
            self_dedup_spans_incremental,
        )

        docs = spark.createDataFrame(
            [(1, "one two three four five six seven")],
            "doc_id bigint, text string",
        )
        stamped = gram_index(docs, "doc_id", "text", n=4)
        unstamped = stamped.withColumn("n", F.lit(None).cast("int"))
        mixed = stamped.unionByName(unstamped)
        with pytest.raises(ValueError, match=r"NULL"):
            self_dedup_spans_incremental(docs, mixed, "doc_id", "text", n=4)

    def test_constructor_frames_skip_revalidation(self, spark):
        """gram_index / load_gram_index tag their frames with the known
        n, so per-ingest validation is an attribute read, not a full
        aggregate over the index."""
        import tempfile

        from ons_utils_spark.operators.corpus import (
            gram_index,
            gram_index_append_batch,
            load_gram_index,
        )

        docs = spark.createDataFrame(
            [(1, "one two three four five six seven")],
            "doc_id bigint, text string",
        )
        idx = gram_index(docs, "doc_id", "text", n=4)
        assert idx._ons_gram_index_n == 4
        with tempfile.TemporaryDirectory() as d:
            gram_index_append_batch(docs, "doc_id", "text", d + "/s", n=4)
            loaded = load_gram_index(spark, d + "/s")
            assert loaded._ons_gram_index_n == 4


class TestRedactionDropSemantics:
    def test_replacement_with_quotes_and_backslashes(self, spark):
        """The marker is a BOUND literal, not text spliced into an
        expression string — a replacement mixing both quote styles and
        backslashes must land verbatim under any parser mode."""
        from ons_utils_spark.operators.corpus import apply_span_redaction

        corpus = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id bigint, text string"
        )
        spans = spark.createDataFrame(
            [(1, 1, 4)], "id bigint, span_start int, span_end int"
        )
        nasty = "[\"it's\\redacted\"]"
        out = apply_span_redaction(
            corpus, spans, "doc_id", "text", replacement=nasty
        ).collect()[0]["text"]
        assert out == f"a {nasty} e"

    def test_replacement_none_drops_tokens(self, spark):
        from ons_utils_spark.operators.corpus import apply_span_redaction

        corpus = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id bigint, text string"
        )
        spans = spark.createDataFrame(
            [(1, 1, 4)], "id bigint, span_start int, span_end int"
        )
        out = apply_span_redaction(
            corpus, spans, "doc_id", "text", replacement=None
        ).collect()[0]["text"]
        assert out == "a e"


class TestSelfDedupIncremental:
    """self_dedup_spans_incremental + the durable gram index — the
    ingest form of exact-substring dedup: batch passages already present
    in the indexed corpus (any alignment) or duplicated within the batch
    are covered; the index is a (g, keeper) table whose durable store
    shares the partitioned delta layout."""

    def _docs(self, spark):
        shared = "alpha bravo charlie delta echo"
        prior = [
            (1, "one two " + shared + " three"),
            (2, "completely unrelated prior content here"),
        ]
        batch = [
            (10, "xx yy zz " + shared),          # dup vs indexed corpus
            (11, "fresh batch words " + "p q r s t"),   # keeper of p..t
            (12, "other stuff p q r s t end"),   # dup within batch
        ]
        mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
        return mk(prior), mk(batch), mk(prior + batch)

    def test_matches_one_shot_on_the_union(self, spark):
        from ons_utils_spark.operators.corpus import (
            gram_index,
            self_dedup_spans,
            self_dedup_spans_incremental,
        )

        prior, batch, union = self._docs(spark)
        idx = gram_index(prior, "doc_id", "text", n=4)
        inc = sorted(
            map(
                tuple,
                self_dedup_spans_incremental(
                    batch, idx, "doc_id", "text", n=4
                ).collect(),
            )
        )
        one_shot = sorted(
            map(
                tuple,
                self_dedup_spans(union, "doc_id", "text", n=4)
                .where(F.col("id") >= 10)
                .collect(),
            )
        )
        assert inc == one_shot and inc  # non-trivial: both dup kinds hit
        assert {r[0] for r in inc} == {10, 12}

    def test_durable_store_roundtrip_and_replay(self, spark, tmp_path):
        from ons_utils_spark.operators.corpus import (
            gram_index,
            gram_index_append_batch,
            load_gram_index,
        )

        prior, batch, union = self._docs(spark)
        path = str(tmp_path / "grams")
        gram_index_append_batch(prior, "doc_id", "text", path, n=4, batch_id=0)
        gram_index_append_batch(batch, "doc_id", "text", path, n=4, batch_id=1)
        # replay batch 1: min-merge makes it a no-op
        gram_index_append_batch(batch, "doc_id", "text", path, n=4, batch_id=1)
        got = sorted(map(tuple, load_gram_index(spark, path).collect()))
        want = sorted(
            map(tuple, gram_index(union, "doc_id", "text", n=4).collect())
        )
        assert got == want

    def test_batch_against_loaded_store(self, spark, tmp_path):
        from ons_utils_spark.operators.corpus import (
            gram_index,
            gram_index_append_batch,
            load_gram_index,
            self_dedup_spans_incremental,
        )

        prior, batch, _ = self._docs(spark)
        path = str(tmp_path / "grams")
        gram_index_append_batch(prior, "doc_id", "text", path, n=4)
        via_store = sorted(
            map(
                tuple,
                self_dedup_spans_incremental(
                    batch, load_gram_index(spark, path), "doc_id", "text", n=4
                ).collect(),
            )
        )
        via_df = sorted(
            map(
                tuple,
                self_dedup_spans_incremental(
                    batch,
                    gram_index(prior, "doc_id", "text", n=4),
                    "doc_id",
                    "text",
                    n=4,
                ).collect(),
            )
        )
        assert via_store == via_df


class TestSelfDedupRandomizedBruteForce:
    """Seeded random corpora from a tiny token alphabet (dense gram
    collisions across docs) checked against a 20-line pure-Python brute
    force of the operator's contract — the randomized-coverage layer the
    hand-picked fixtures can't provide."""

    @staticmethod
    def _brute(docs, n):
        toks = {d: t.split() for d, t in docs}
        carriers = {}
        for d, ts in toks.items():
            for p in range(len(ts) - n + 1):
                carriers.setdefault(tuple(ts[p: p + n]), set()).add(d)
        spans = []
        for d, ts in toks.items():
            hits = [
                p
                for p in range(len(ts) - n + 1)
                if len(carriers[tuple(ts[p: p + n])]) >= 2
                and d != min(carriers[tuple(ts[p: p + n])])
            ]
            start = prev = None
            for p in hits:
                if start is None:
                    start = prev = p
                elif p > prev + n:
                    spans.append((d, start, prev + n))
                    start = prev = p
                else:
                    prev = p
            if start is not None:
                spans.append((d, start, prev + n))
        return sorted(spans)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_brute_force_on_random_corpora(self, spark, seed):
        import random

        from ons_utils_spark.operators.corpus import self_dedup_spans

        rng = random.Random(seed)
        alphabet = ["aa", "bb", "cc", "dd", "ee", "ff"]
        docs = [
            (d, " ".join(rng.choice(alphabet) for _ in range(rng.randint(8, 30))))
            for d in range(1, 7)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = sorted(
            map(tuple, self_dedup_spans(df, "doc_id", "text", n=3).collect())
        )
        assert got == self._brute(docs, 3)

    @pytest.mark.parametrize("seed", [7, 8])
    def test_incremental_matches_brute_force_restriction(self, spark, seed):
        """Random split into prior/batch with batch ids above prior ids:
        the incremental operator must equal the brute force of the union
        restricted to batch docs."""
        import random

        from ons_utils_spark.operators.corpus import (
            gram_index,
            self_dedup_spans_incremental,
        )

        rng = random.Random(seed)
        alphabet = ["aa", "bb", "cc", "dd", "ee"]
        docs = [
            (d, " ".join(rng.choice(alphabet) for _ in range(rng.randint(8, 25))))
            for d in range(1, 9)
        ]
        prior, batch = docs[:4], docs[4:]
        mk = lambda rows: spark.createDataFrame(
            rows, "doc_id bigint, text string"
        )
        idx = gram_index(mk(prior), "doc_id", "text", n=3)
        got = sorted(
            map(
                tuple,
                self_dedup_spans_incremental(
                    mk(batch), idx, "doc_id", "text", n=3
                ).collect(),
            )
        )
        batch_ids = {d for d, _ in batch}
        want = [s for s in self._brute(docs, 3) if s[0] in batch_ids]
        assert got == want


class TestSelfDedupGuards:
    def test_min_docs_below_two_raises(self, spark):
        from ons_utils_spark.operators.corpus import self_dedup_spans

        df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="min_docs"):
            self_dedup_spans(df, "doc_id", "text", min_docs=1)

    def test_gram_index_n_mismatch_raises(self, spark):
        """An index chained at one shingle size probed at another would
        silently match nothing — must raise instead."""
        from ons_utils_spark.operators.corpus import (
            gram_index,
            self_dedup_spans_incremental,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id bigint, text string"
        )
        idx = gram_index(docs, "doc_id", "text", n=8)
        with pytest.raises(ValueError, match="n=8"):
            self_dedup_spans_incremental(docs, idx, "doc_id", "text", n=4)
