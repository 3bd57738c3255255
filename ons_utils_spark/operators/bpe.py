"""Byte-pair-encoding tokenizer: distributed training, codegen encode.

The missing piece between the heuristic token counters
(``text.token_count``'s whitespace / BPE-ish regex modes) and a real
subword vocabulary: TRAIN a merge table on the corpus, then ENCODE with
it — the tokenizer-construction half of an LLM data pipeline
(Sennrich et al. 2016; the GPT-2 tokenizer is this algorithm over
bytes). No reference twin — the reference (ONSdigital/ons_utils) has no
tokenization at all; its text surface stops at column utilities.

Scale shape (the part that matters at 100 TB):

- **Training** aggregates the corpus down to a WORD-FREQUENCY table —
  one explode + one groupBy count, the only corpus-sized work — and
  runs the merge loop on the driver over that table. This is how
  production tokenizer trainers work (HuggingFace ``tokenizers`` does
  exactly this): the merge loop's cost depends on UNIQUE words (≈10⁶–
  10⁷ for natural language, Heaps' law), not corpus tokens (10¹²), so
  driver-side is the CORRECT placement, not a shortcut. A deterministic
  ``max_words`` cap (freq desc, word asc) bounds the collect; the cap
  drops only the frequency tail, which by Zipf contributes negligible
  pair mass.
- **Encoding** compiles the learned merges into a PURE-EXPRESSION
  column transform: chars are interspersed with a separator, each merge
  is one literal ``replace`` (string replace is left-to-right
  non-overlapping in the JVM, in Python, and in ANSI SQL — exactly
  BPE's application rule, which is what makes the operator
  SQL-replayable end to end), and the result splits back to tokens.
  Zero Python in the plan, whole-stage codegen, row-local — encoding a
  100 TB corpus is a map-only scan.

Determinism: pair counts are exact integers; ties break by
(count desc, pair asc) — no floats anywhere, so Spark, the driver loop,
and a DuckDB replay agree bit-for-bit by construction.
"""

from __future__ import annotations

import heapq
from typing import Sequence, Union

from pyspark.sql import Column as SparkCol, DataFrame as SparkDF
from pyspark.sql import functions as F

from ons_utils_spark.operators.text import tokenize

#: Symbol separator inside a word's working state. U+001F (unit
#: separator) — a control char the tokenizer's input words can never
#: contain (``tokenize`` splits on whitespace; real text has no C0
#: separators, and a word that DID contain one is rejected in training).
SEP = "\x1f"


def _word_state(word: Union[str, SparkCol]) -> SparkCol:
    """A word's initial BPE state: its characters joined by :data:`SEP`
    (``regexp_replace`` intersperses, ``rtrim`` drops the trailing one
    — RE2-compatible, no lookarounds, so the SQL twin is the same two
    calls)."""
    col = F.col(word) if isinstance(word, str) else word
    return F.rtrim(
        F.regexp_replace(col, "(.)", "$1" + SEP), F.lit(SEP)
    )


def _py_word_state(word: str) -> str:
    return SEP.join(word)


#: Cap on the total adjacency slots (Σ per-word symbol gaps) the
#: incremental trainer will index driver-side. ``max_words`` bounds the
#: word COUNT but not word LENGTH; a pathological corpus of 1M
#: thousand-char words would otherwise build a 10⁹-entry index. 32M
#: slots ≈ a 1M-word natural-language vocabulary at ~32 chars/word —
#: several GiB of index, comfortable on a driver, loudly not unbounded.
BPE_MAX_INDEX_ENTRIES = 32_000_000


def bpe_train(
    df: SparkDF,
    text_col: str,
    n_merges: int,
    max_words: int = 1_000_000,
    max_index_entries: int = BPE_MAX_INDEX_ENTRIES,
) -> "list[tuple[str, str]]":
    """Learn ``n_merges`` BPE merges from a corpus → ordered list of
    ``(left, right)`` symbol pairs.

    One corpus-sized aggregation (tokenize → explode → word counts),
    then the merge loop over the word-frequency table on the driver
    (see the module docstring for why that placement is the production
    shape). Pairs count with overlap (``zip(syms, syms[1:])`` — "aaa"
    holds (a,a) twice), each round merges the single best pair
    everywhere left-to-right non-overlapping ("aaa" → "(aa)a"), merged
    symbols are plain concatenations. Ties break by (count desc, pair
    asc); the loop stops early only when NO pair remains (every
    surviving word is one symbol), so given the same corpus the merges
    are bit-reproducible anywhere — including the DuckDB oracle, which
    unrolls the rounds as CTE stages.

    The loop is INCREMENTAL (r12 verdict #4): pair counts live in one
    dict maintained by per-merge deltas, the best pair comes from a
    lazy max-heap, and each merge rewrites only the words it touches —
    O(affected words) per round instead of a full recount, which is
    what makes a 32k-merge production train over a 1M-word vocabulary
    tractable (the old recount was ~10¹⁰ Python operations there).
    Semantics are bit-identical to the naive recount loop by
    construction, including its one subtlety: the state update is a
    plain string ``replace`` of ``a+SEP+b``, which also fires across a
    symbol boundary where the LEFT symbol merely ends with ``a`` and
    the RIGHT merely starts with ``b`` (the encoder and the SQL oracle
    replay exactly this rule, so training must too). Candidate words
    per merge therefore come from a (last-char-of-left,
    first-char-of-right) adjacency index — a complete superset of every
    string-level match, since ``u.endswith(a)`` forces
    ``u[-1] == a[-1]`` — and the final ``pat in state`` membership
    check keeps exact string semantics. Equality against the recount
    loop is pinned in tests over randomized corpora.

    ``max_words`` bounds the driver collect deterministically (freq
    desc, word asc — the Zipf head carries the pair mass);
    ``max_index_entries`` bounds the adjacency index the same sized way
    (Σ word lengths, checked before any index is built). Words
    containing :data:`SEP` raise — the separator is the one reserved
    code point.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1 (got {max_words})")
    words = (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rows = (
        words.orderBy(F.col("freq").desc(), F.col("word"))
        .limit(int(max_words))
        .collect()
    )
    bad = [r["word"] for r in rows if SEP in r["word"]]
    if bad:
        raise ValueError(
            f"{len(bad)} word(s) contain the reserved separator "
            f"U+001F (first: {bad[0]!r}) — strip C0 control characters "
            "upstream"
        )
    return _merge_loop(
        [(r["word"], int(r["freq"])) for r in rows],
        int(n_merges),
        int(max_index_entries),
    )


def _merge_loop(
    word_freqs: "list[tuple[str, int]]",
    n_merges: int,
    max_index_entries: int = BPE_MAX_INDEX_ENTRIES,
) -> "list[tuple[str, str]]":
    """The incremental driver-side merge loop over a word-frequency
    table (split out of :func:`bpe_train` so the equality pin and the
    scale probe can run it without a SparkSession)."""
    total_slots = sum(max(len(w) - 1, 0) for w, _ in word_freqs)
    if total_slots > max_index_entries:
        raise ValueError(
            f"word table carries {total_slots} adjacency slots, over "
            f"the max_index_entries cap ({max_index_entries}) — lower "
            "max_words (the frequency tail contributes negligible pair "
            "mass) or raise the cap if the driver has the memory"
        )
    states = [_py_word_state(w) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]

    pair_counts: "dict[tuple[str, str], int]" = {}
    # (last char of left symbol, first char of right symbol) → word ids.
    # Complete for string-replace matching: pat = a+SEP+b occurring in a
    # state means some adjacency (u, v) has u.endswith(a) and
    # v.startswith(b), hence u[-1] == a[-1] and v[0] == b[0].
    char_index: "dict[tuple[str, str], set[int]]" = {}
    for i, st in enumerate(states):
        f = freqs[i]
        syms = st.split(SEP)
        for u, v in zip(syms, syms[1:]):
            pair_counts[(u, v)] = pair_counts.get((u, v), 0) + f
            char_index.setdefault((u[-1], v[0]), set()).add(i)

    # Lazy max-heap of (-count, pair): every count change pushes a new
    # entry; stale tops (count no longer current) are discarded on pop.
    # Tuple order reproduces the recount loop's (count desc, pair asc)
    # tie-break exactly.
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: "list[tuple[str, str]]" = []
    for _ in range(n_merges):
        while heap and pair_counts.get(heap[0][1], 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break  # every word is a single symbol — nothing to merge
        best = heapq.heappop(heap)[1]
        merges.append(best)
        a, b = best
        pat, rep = a + SEP + b, a + b
        cand = char_index.get((a[-1], b[0]), ())
        # C-level substring check over the candidate bucket only; the
        # check is what keeps string semantics exact (the bucket may
        # hold words whose adjacency merely shares boundary chars).
        affected = [i for i in cand if pat in states[i]]
        touched: "set[tuple[str, str]]" = set()
        for i in affected:
            f = freqs[i]
            old_syms = states[i].split(SEP)
            new_state = states[i].replace(pat, rep)
            new_syms = new_state.split(SEP)
            states[i] = new_state
            old_adj = list(zip(old_syms, old_syms[1:]))
            new_adj = list(zip(new_syms, new_syms[1:]))
            for p in old_adj:
                left = pair_counts[p] - f
                if left:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
                touched.add(p)
            for p in new_adj:
                pair_counts[p] = pair_counts.get(p, 0) + f
                touched.add(p)
            old_keys = {(u[-1], v[0]) for u, v in old_adj}
            new_keys = {(u[-1], v[0]) for u, v in new_adj}
            for k in old_keys - new_keys:
                char_index[k].discard(i)
            for k in new_keys - old_keys:
                char_index.setdefault(k, set()).add(i)
        for p in touched:
            c = pair_counts.get(p)
            if c:
                heapq.heappush(heap, (-c, p))
    return merges


def bpe_encode_word(word: Union[str, SparkCol],
                    merges: Sequence) -> SparkCol:
    """One word → its BPE token array, as a pure column expression: the
    interspersed char state through one literal ``replace`` per merge
    (in training order), split back on the separator. JVM-side,
    codegen-friendly, row-local."""
    state = _word_state(word)
    for a, b in merges:
        state = F.replace(
            state, F.lit(a + SEP + b), F.lit(a + b)
        )
    return F.split(state, SEP)


def bpe_encode(
    df: SparkDF,
    text_col: str,
    merges: Sequence,
    out_col: str = "bpe_tokens",
) -> SparkDF:
    """Tokenize a corpus with a trained merge table → ``df`` plus an
    ``out_col`` array of subword tokens (whitespace words expanded
    in order). The whole transform is string expressions over one scan
    — encoding is map-only at any corpus size; merges ride the plan as
    literals (a 32k-merge vocabulary is ~32k nested replaces, so for
    production-sized vocabularies batch by :func:`bpe_encode_udf`
    below, which trades plan size for one Arrow pass)."""
    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(
                F.coalesce(tokenize(text_col), F.array()),
                lambda w: bpe_encode_word(w, merges),
            )
        ),
    )


def bpe_encode_udf(
    df: SparkDF,
    text_col: str,
    merges: Sequence,
    out_col: str = "bpe_tokens",
) -> SparkDF:
    """Arrow-batched twin of :func:`bpe_encode` for PRODUCTION-sized
    merge tables: the expression form nests one ``replace`` per merge
    into the plan, which is the right call for tens of merges but not
    for a 32k-entry vocabulary (codegen blowup). This form ships the
    merge list once per executor and applies it per word with a
    memoized dict — bit-identical output (both sides are the same
    left-to-right ``replace`` semantics; pinned in tests), still
    row-local and shuffle-free."""
    import pandas as pd

    merge_list = [(a, b) for a, b in merges]
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} array<string>"

    def run(batches):
        cache: "dict[str, list[str]]" = {}

        def enc_word(w: str) -> "list[str]":
            got = cache.get(w)
            if got is None:
                state = _py_word_state(w)
                for a, b in merge_list:
                    state = state.replace(a + SEP + b, a + b)
                got = cache[w] = state.split(SEP)
            return got

        for pdf in batches:
            toks = [
                [t for w in (s or "").lower().strip().split()
                 for t in enc_word(w)]
                for s in pdf[text_col]
            ]
            yield pdf.assign(**{out_col: pd.Series(toks, index=pdf.index)})

    return df.mapInPandas(run, schema)
