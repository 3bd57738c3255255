"""Measure the r13 incremental BPE merge loop against the r12 full
recount at production merge counts (r12 verdict #4's "Done" bar:
>=10x at 8k merges over the sf0.1 corpus vocabulary).

The recount loop's per-round cost is ~constant (it re-walks the whole
word table every round), so it is timed over a bounded prefix of
rounds and extrapolated linearly to the full merge count — running it
for all 8k rounds is exactly the pathology being replaced. The
incremental loop runs the full merge count for real. Both loops are
first checked for bit-identical merges over the shared prefix.

The sf0.1 documents table has a ~31-word synthetic vocabulary — far
too degenerate to exercise an 8k-merge train (the loop runs dry after
~90 merges). ``zipf:<n_words>`` as the sf_dir therefore generates a
deterministic Zipf-distributed vocabulary (seeded PRNG, 3-14 char
words over a 26-letter alphabet with digraph structure so merges have
something to learn) at a stated word count — the honest stand-in for
a natural-language 10^5-10^6-word vocab.

Usage: python tools/bpe_scale_probe.py [sf_dir|zipf:N] [n_merges] [recount_rounds]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark.operators import bpe as B  # noqa: E402
from ons_utils_spark.operators.text import tokenize  # noqa: E402
from ons_utils_spark.session import get_session  # noqa: E402
from ons_utils_spark.sources.tables import load_table  # noqa: E402


def recount_loop(word_freqs, n_merges):
    """The pre-r13 loop, verbatim (also pinned in tests/operators/
    test_bpe.py::_recount_loop)."""
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


def zipf_vocab(n_words: int, seed: int = 13) -> "list[tuple[str, int]]":
    """Deterministic Zipfian word-frequency table: digraph-chained
    letters (so common bigrams exist for BPE to find), rank-r frequency
    ~ N/r."""
    import random

    rnd = random.Random(seed)
    # a fixed digraph preference: each letter gets 4 likely successors
    nxt = {
        c: [rnd.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(4)]
        for c in "abcdefghijklmnopqrstuvwxyz"
    }
    words = set()
    while len(words) < n_words:
        ln = rnd.randint(3, 14)
        w = [rnd.choice("abcdefghijklmnopqrstuvwxyz")]
        for _ in range(ln - 1):
            w.append(
                rnd.choice(nxt[w[-1]])
                if rnd.random() < 0.7
                else rnd.choice("abcdefghijklmnopqrstuvwxyz")
            )
        words.add("".join(w))
    out = sorted(words)
    rnd.shuffle(out)
    return [(w, max(n_words // (r + 1), 1)) for r, w in enumerate(out)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    recount_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    if sf_dir.startswith("zipf:"):
        wf = zipf_vocab(int(sf_dir.split(":", 1)[1]))
    else:
        spark = get_session(app_name="bpe_scale_probe")
        docs = load_table(spark, sf_dir, "documents")
        rows = (
            docs.select(F.explode(tokenize("text")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("word"))
            .limit(1_000_000)
            .collect()
        )
        wf = [(r["word"], int(r["freq"])) for r in rows]
    n_slots = sum(max(len(w) - 1, 0) for w, _ in wf)

    t0 = time.perf_counter()
    old_prefix = recount_loop(wf, recount_rounds)
    t_old_prefix = time.perf_counter() - t0

    t0 = time.perf_counter()
    new_full = B._merge_loop(wf, n_merges)
    t_new_full = time.perf_counter() - t0

    k = min(recount_rounds, len(old_prefix), len(new_full))
    assert new_full[:k] == old_prefix[:k], "loops diverged on the prefix"

    effective = min(n_merges, len(new_full))
    t_old_extrapolated = t_old_prefix / max(recount_rounds, 1) * effective
    print(json.dumps({
        "sf_dir": sf_dir,
        "vocab_words": len(wf),
        "adjacency_slots": n_slots,
        "n_merges_requested": n_merges,
        "n_merges_emitted": len(new_full),
        "recount_rounds_timed": recount_rounds,
        "recount_prefix_sec": round(t_old_prefix, 2),
        "recount_extrapolated_sec": round(t_old_extrapolated, 1),
        "incremental_full_sec": round(t_new_full, 2),
        "speedup_at_n_merges": round(
            t_old_extrapolated / max(t_new_full, 1e-9), 1
        ),
        "prefix_bit_identical": True,
    }))


if __name__ == "__main__":
    main()
