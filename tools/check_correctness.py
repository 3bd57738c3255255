"""Local emulation of the driver's t2 duckdb-oracle correctness gate.

Runs every query in ``__spark_entry__.queries()`` at the given sf dir, runs
its ``oracle_sql()`` twin in DuckDB on the same parquet files, and compares:
row count, sorted column names, and an order-insensitive canonical value
comparison (exact string equality after canonicalization — a stand-in for
the driver's value hash).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonical(v) -> str:
    # Dtype-faithful: an int-valued float stays "99111.0", NOT "99111".
    # The driver's value hash distinguishes bigint from float64 (DuckDB
    # HUGEINT -> pandas float64 broke q_json_props in r1 while the old
    # int-collapsing canonicalizer here said "ok") — so we must too.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def dtype_drift(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Columns where one side is integer-typed and the other float-typed.

    This is exactly the drift the driver's hash catches (int64 ``99111``
    vs float64 ``99111.0``) even when every value is numerically equal.
    """
    drift = []
    for c in spark_df.columns:
        if c not in oracle_df.columns:
            continue
        s_kind = spark_df[c].dtype.kind
        o_kind = oracle_df[c].dtype.kind
        if {s_kind, o_kind} == {"i", "f"} or {s_kind, o_kind} == {"u", "f"}:
            drift.append(f"{c}: spark {spark_df[c].dtype} vs oracle {oracle_df[c].dtype}")
    return drift


def frame_to_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(canonical(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main() -> int:
    import __spark_entry__ as mod
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="check_correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_df)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            continue

        problems = []
        if len(spark_df) != len(oracle_df):
            problems.append(f"rowcount {len(spark_df)} vs {len(oracle_df)}")
        s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
        if s_cols != o_cols:
            problems.append(f"columns {s_cols} vs {o_cols}")
        else:
            drift = dtype_drift(spark_df, oracle_df)
            if drift:
                problems.append(f"int/float dtype drift: {drift}")
            s_rows, o_rows = frame_to_rows(spark_df), frame_to_rows(oracle_df)
            if s_rows != o_rows:
                diff = [
                    (a, b) for a, b in zip(s_rows, o_rows) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: rows={len(spark_df)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
