"""BPE tokenizer (``operators/bpe.py``): distributed training over the
word-frequency table + the merge loop's exact discrete semantics, and
the two bit-identical encode forms (pure-expression vs Arrow-batched).
No reference twin — the reference has no tokenization; the oracle story
lives in ``q_bpe_tokenize`` (the whole training loop SQL-replayed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import bpe as B


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "low lower lowest low low"),
            (1, "new newer newest new"),
            (2, "wide wider widest new low"),
        ],
        "doc_id long, body string",
    ).localCheckpoint(eager=True)


def _py_train(rows, n_merges):
    """Plain-Python reference: the classic Sennrich merge loop."""
    from collections import Counter

    words = Counter()
    for text in rows:
        for w in text.lower().strip().split():
            words[w] += 1
    freqs = {B.SEP.join(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        cnt = Counter()
        for st, fq in freqs.items():
            syms = st.split(B.SEP)
            for p in zip(syms, syms[1:]):
                cnt[p] += fq
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat, rep = best[0] + B.SEP + best[1], best[0] + best[1]
        freqs = {st.replace(pat, rep): fq for st, fq in freqs.items()}
    return merges


def _py_encode(text, merges):
    out = []
    for w in (text or "").lower().strip().split():
        st = B.SEP.join(w)
        for a, b in merges:
            st = st.replace(a + B.SEP + b, a + b)
        out += st.split(B.SEP)
    return out


def _recount_loop(word_freqs, n_merges):
    """The pre-r13 full-recount merge loop, verbatim — the equality
    reference for the incremental loop (r12 verdict #4: same merges,
    bit-for-bit, including the string-replace cross-boundary rule)."""
    freqs = {B.SEP.join(w): f for w, f in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for state, freq in freqs.items():
            syms = state.split(B.SEP)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat, rep = best[0] + B.SEP + best[1], best[0] + best[1]
        freqs = {st.replace(pat, rep): fq for st, fq in freqs.items()}
    return merges


class TestIncrementalMergeLoop:
    """`_merge_loop` (heap + delta counts + char-pair candidate index)
    must be bit-identical to the full recount it replaced."""

    def test_cross_boundary_replace_still_fires(self):
        # After round 1 merges (x,a), the word "xab" holds adjacency
        # (xa, b) — NOT the exact pair (a, b). Round 2 picks (a, b)
        # (count 6 from "ab" beats (xa,b)'s 5), and the recount loop's
        # string replace ALSO rewrites "xa␟b" → "xab" because xa ends
        # with a. An exact-pair index would miss that word, leave
        # (xa, b) alive, and emit a third merge; the char-pair index +
        # substring check must reproduce the recount exactly: two
        # merges, then silence.
        wf = [("ab", 6), ("xab", 5), ("xa", 9)]
        expected = _recount_loop(wf, 5)
        assert expected == [("x", "a"), ("a", "b")]  # the trap is live
        assert B._merge_loop(wf, 5) == expected

    def test_fuzz_equality_with_recount_loop(self):
        import random

        rnd = random.Random(13)
        for trial in range(30):
            alpha = "ab" if trial % 3 == 0 else "abc"
            words = {
                "".join(
                    rnd.choice(alpha)
                    for _ in range(rnd.randint(1, 8))
                ): rnd.randint(1, 9)
                for _ in range(rnd.randint(2, 50))
            }
            wf = sorted(words.items())
            n = rnd.randint(1, 25)
            assert B._merge_loop(wf, n) == _recount_loop(wf, n), (
                f"trial {trial}: incremental loop diverged"
            )

    def test_index_cap_is_a_sized_refusal(self):
        wf = [("abcdefghij", 3), ("klmnop", 2)]
        with pytest.raises(ValueError, match="max_index_entries"):
            B._merge_loop(wf, 3, max_index_entries=10)
        # at the exact slot total (9 + 5) it runs
        assert B._merge_loop(wf, 1, max_index_entries=14)


class TestBpeTrain:
    def test_matches_the_reference_merge_loop(self, spark, docs):
        got = B.bpe_train(docs, "body", n_merges=6)
        want = _py_train([r["body"] for r in docs.collect()], 6)
        assert got == want
        # and the first merges are the hand-checkable ones: 'lo' (5
        # 'low's) then 'low'
        assert got[:2] == [("l", "o"), ("lo", "w")]

    def test_tie_breaks_by_pair_ascending(self, spark):
        df = spark.createDataFrame(
            [(0, "ab xy ab xy")], "doc_id long, body string"
        )
        # (a,b) and (x,y) both count 2 — the lexicographically smaller
        # pair must win round 1.
        assert B.bpe_train(df, "body", n_merges=1) == [("a", "b")]

    def test_stops_when_no_pair_remains(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c a")], "doc_id long, body string"
        )
        assert B.bpe_train(df, "body", n_merges=5) == []

    def test_max_words_cap_is_deterministic(self, spark, docs):
        # cap=1 keeps only the most frequent word ('low', freq 5) —
        # training degenerates to merging 'low' into one symbol.
        got = B.bpe_train(docs, "body", n_merges=2, max_words=1)
        assert got == [("l", "o"), ("lo", "w")]

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError, match="n_merges"):
            B.bpe_train(docs, "body", n_merges=0)
        with pytest.raises(ValueError, match="max_words"):
            B.bpe_train(docs, "body", n_merges=1, max_words=0)
        bad = spark.createDataFrame(
            [(0, "ok bad\x1fword")], "doc_id long, body string"
        )
        with pytest.raises(ValueError, match="separator"):
            B.bpe_train(bad, "body", n_merges=1)


class TestBpeEncode:
    def test_expression_and_udf_forms_are_bit_identical(self, spark, docs):
        merges = B.bpe_train(docs, "body", n_merges=6)
        a = {
            r["doc_id"]: r["bpe_tokens"]
            for r in B.bpe_encode(docs, "body", merges).collect()
        }
        b = {
            r["doc_id"]: r["bpe_tokens"]
            for r in B.bpe_encode_udf(docs, "body", merges).collect()
        }
        assert a == b
        want = {
            r["doc_id"]: _py_encode(r["body"], merges)
            for r in docs.collect()
        }
        assert a == want

    def test_merge_application_is_left_to_right_non_overlapping(
        self, spark
    ):
        df = spark.createDataFrame(
            [(0, "aaaa aaa")], "doc_id long, body string"
        )
        got = B.bpe_encode(df, "body", [("a", "a")]).collect()[0][
            "bpe_tokens"
        ]
        assert got == ["aa", "aa", "aa", "a"]

    def test_merges_apply_in_training_order(self, spark):
        # ('a','b') then ('ab','c'): "abc" collapses fully; reversing
        # the order must NOT (the ('ab','c') pattern never matches raw
        # chars) — order is semantics, not presentation.
        df = spark.createDataFrame([(0, "abc")], "doc_id long, body string")
        full = [("a", "b"), ("ab", "c")]
        assert B.bpe_encode(df, "body", full).collect()[0][
            "bpe_tokens"
        ] == ["abc"]
        assert B.bpe_encode(df, "body", full[::-1]).collect()[0][
            "bpe_tokens"
        ] == ["ab", "c"]

    def test_unseen_words_fall_back_to_characters(self, spark, docs):
        merges = B.bpe_train(docs, "body", n_merges=6)
        df = spark.createDataFrame([(9, "zzq")], "doc_id long, body string")
        got = B.bpe_encode(df, "body", merges).collect()[0]["bpe_tokens"]
        assert got == ["z", "z", "q"]

    def test_null_and_empty_text_encode_to_empty(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, ""), (2, "  ")], "doc_id long, body string"
        )
        rows = {
            r["doc_id"]: r["bpe_tokens"]
            for r in B.bpe_encode(df, "body", [("a", "b")]).collect()
        }
        assert rows == {0: [], 1: [], 2: []}

    def test_plan_is_pure_expressions(self, spark, docs):
        """The encode must stay JVM-side: no Python eval nodes in the
        plan (the whole point of compiling merges into replaces)."""
        merges = [("l", "o"), ("lo", "w")]
        plan = (
            B.bpe_encode(docs, "body", merges)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Arrow" not in plan
