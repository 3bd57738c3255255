"""Local emulation of the driver's t2 duckdb-oracle correctness gate.

Runs every query in ``__spark_entry__.queries()`` at the given sf dir, runs
its ``oracle_sql()`` twin in DuckDB on the same parquet files, and compares:
row count, sorted column names, and an order-insensitive canonical value
comparison (exact string equality after canonicalization — a stand-in for
the driver's value hash).

Usage: python tools/check_correctness.py [--json OUT.json] [sf_dir] [query ...]

``--json`` writes a full record in the driver's CORRECTNESS shape (one
object per query: rows/schema/hash match booleans + row counts) so each
round can commit a WHOLE-registry check, including the tail queries past
the driver's 50-slot graded window (ADVICE r2: the tail otherwise has no
recorded check).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_argv = sys.argv[1:]
JSON_OUT = None
if "--json" in _argv:
    i = _argv.index("--json")
    JSON_OUT = _argv[i + 1]
    _argv = _argv[:i] + _argv[i + 2:]

SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"
ONLY = set(_argv[1:])

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


def compare_frames(
    spark_df: pd.DataFrame, oracle_df: pd.DataFrame
) -> tuple[bool, bool, bool, list[str]]:
    """Compare a Spark result against its oracle twin.

    Returns ``(rows_match, schema_match, hash_match, problems)``.  A pair
    of EMPTY frames is a failure even though the hashes trivially agree:
    a 0-row green verifies nothing (VERDICT r12 — q_hybrid_mmr_pipeline
    filtered a query_id its workload never issues and read green for two
    rounds), so every registry query must yield >=1 row at sf0.01.
    """
    problems = []
    if len(spark_df) == 0 and len(oracle_df) == 0:
        problems.append("zero-row green: both sides empty — the "
                        "oracle verifies nothing")
    rows_match = len(spark_df) == len(oracle_df)
    if not rows_match:
        problems.append(f"rowcount {len(spark_df)} vs {len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    schema_match = s_cols == o_cols
    hash_match = False
    if not schema_match:
        problems.append(f"columns {s_cols} vs {o_cols}")
    else:
        drift = dtype_drift(spark_df, oracle_df)
        if drift:
            problems.append(f"int/float dtype drift: {drift}")
        s_rows, o_rows = frame_to_rows(spark_df), frame_to_rows(oracle_df)
        hash_match = not drift and s_rows == o_rows
        if s_rows != o_rows:
            diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            problems.append(f"values differ; first diffs: {diff}")
    return rows_match, schema_match, hash_match, problems


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
    record: dict[str, dict] = {}
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark {type(e).__name__}: {e}"[:200]}
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(spark_df),
                            "oracle_rows": None, "err": "no_oracle"}
            print(f"weak  {name}: rows={len(spark_df)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(spark_df),
                            "oracle_rows": None,
                            "err": f"duckdb {type(e).__name__}: {e}"[:200]}
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            continue

        rows_match, schema_match, hash_match, problems = compare_frames(
            spark_df, oracle_df
        )
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": len(spark_df),
                        "oracle_rows": len(oracle_df),
                        "err": "; ".join(problems)[:200] or None}
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: rows={len(spark_df)} [{time.time()-t0:.1f}s]")

    if JSON_OUT:
        Path(JSON_OUT).write_text(json.dumps(record, indent=1))
    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
