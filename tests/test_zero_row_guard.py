"""The correctness gate must refuse zero-row greens.

r12 verdict #1: ``q_hybrid_mmr_pipeline`` filtered ``query_id == 0`` while
its workload only issues qids 1 and 2 — both Spark and the oracle returned
0 rows, so the value hash "matched" on empty for two rounds while checking
nothing.  ``tools/check_correctness.compare_frames`` now fails any query
whose Spark AND oracle results are both empty; these tests pin that the
guard trips on a seeded zero-row pair and stays quiet on real results.
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_correctness import compare_frames  # noqa: E402


def _empty() -> pd.DataFrame:
    return pd.DataFrame({"id": pd.Series(dtype="int64"),
                         "score": pd.Series(dtype="float64")})


class TestZeroRowGuard:
    def test_seeded_zero_row_green_fails(self):
        # Both sides empty, identical schema: the hash would trivially
        # match — the guard must turn that into a loud failure.
        rows, schema, _hash, problems = compare_frames(_empty(), _empty())
        assert rows and schema  # counts/columns DO agree...
        assert any("zero-row green" in p for p in problems)  # ...but FAIL

    def test_nonempty_match_is_clean(self):
        df = pd.DataFrame({"id": [1, 2], "score": [0.5, 1.5]})
        rows, schema, hashes, problems = compare_frames(df, df.copy())
        assert rows and schema and hashes and problems == []

    def test_empty_spark_vs_nonempty_oracle_still_rowcount_fails(self):
        df = pd.DataFrame({"id": [1], "score": [0.5]})
        rows, _schema, _hash, problems = compare_frames(_empty(), df)
        assert not rows
        assert any("rowcount" in p for p in problems)
        # one-sided empties are a rowcount failure, not a zero-row green
        assert not any("zero-row green" in p for p in problems)

    def test_value_mismatch_detected(self):
        a = pd.DataFrame({"id": [1], "score": [0.5]})
        b = pd.DataFrame({"id": [1], "score": [0.6]})
        _rows, _schema, hashes, problems = compare_frames(a, b)
        assert not hashes
        assert any("values differ" in p for p in problems)
