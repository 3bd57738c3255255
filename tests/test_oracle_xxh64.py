"""Bit-for-bit parity of the DuckDB-SQL XXH64 (plans/oracle_xxh64.py)
against Spark's ``F.xxhash64`` — the foundation of the q_dedup_simhash
oracle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.plans.oracle_xxh64 import (
    chain,
    long_hash_steps,
    str_hash_steps,
)

M64 = 1 << 64

TOKENS = [
    "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg", "abcdefgh",
    "abcdefghi", "abcdefghijklmno", "abcdefghijklmnop",
    "abcdefghijklmnopqrstuvwxyz01234",   # 31 bytes: longest no-stripe input
    "abcdefghijklmnopqrstuvwxyz012345",  # 32: exactly one stripe, no tail
    "abcdefghijklmnopqrstuvwxyz0123456",  # 33: stripe + 1 tail byte
    "abcdefghijklmnopqrstuvwxyz0123456789ABC",   # 39: stripe + 7 bytes
    "abcdefghijklmnopqrstuvwxyz0123456789ABCD",  # 40: stripe + 1 word
    "the quick brown fox jumps over the lazy dog near the old riverbank",  # 67: 2 stripes + tail
    "x" * 64, "y" * 96, "z" * 100,  # multi-stripe, various tails
    "key", "agg3", "shuffle0", "x", "Z9", "mixedCASE", "0", "  ",
]

LONG_PAIRS = [
    (0, 0),
    (1, 2),
    (-1, -2),
    (-5, 7),
    (42, -42),
    (123456789012345, -987654321098765),
    (2**62, -(2**62)),
    (-(2**63), 2**63 - 1),
]


@pytest.fixture(scope="module")
def spark_hashes(spark):
    tok_df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    tok_ref = {
        r["tok"]: r["h"] % M64
        for r in tok_df.select("tok", F.xxhash64("tok").alias("h")).collect()
    }
    long_df = spark.createDataFrame(LONG_PAIRS, "a long, b long")
    long_ref = {
        (r["a"], r["b"]): (r["ha"] % M64, r["hab"] % M64)
        for r in long_df.select(
            "a", "b",
            F.xxhash64("a").alias("ha"),
            F.xxhash64("a", "b").alias("hab"),
        ).collect()
    }
    return tok_ref, long_ref


def test_string_hash_matches_spark(spark_hashes):
    tok_ref, _ = spark_hashes
    con = duckdb.connect()
    vals = ", ".join(f"('{t}')" for t in TOKENS)
    sql = f"WITH strs AS (SELECT tok FROM (VALUES {vals}) v(tok))"
    sql += chain("strs", str_hash_steps("th", "tok", "42"), "c", "hashed")
    sql += " SELECT tok, th FROM hashed"
    got = {tok: int(h) for tok, h in con.execute(sql).fetchall()}
    assert got == tok_ref


def test_long_chain_matches_spark(spark_hashes):
    _, long_ref = spark_hashes
    con = duckdb.connect()
    def lit(x):
        # -2^63 can't be written as a plain literal (the positive half
        # overflows INT64 before negation).
        return f"(-9223372036854775807 - 1)" if x == -(2**63) else str(x)

    vals = ", ".join(f"({lit(a)}::BIGINT, {lit(b)}::BIGINT)" for a, b in LONG_PAIRS)
    sql = (
        "WITH longs AS (SELECT a, b, "
        "CASE WHEN a < 0 THEN a::HUGEINT + 18446744073709551616 "
        "ELSE a::HUGEINT END AS au, "
        "CASE WHEN b < 0 THEN b::HUGEINT + 18446744073709551616 "
        "ELSE b::HUGEINT END AS bu "
        f"FROM (VALUES {vals}) v(a, b))"
    )
    sql += chain("longs", long_hash_steps("ha", "au", "42"), "c1", "seeded")
    sql += chain("seeded", long_hash_steps("hab", "bu", "ha"), "c2", "chained")
    sql += " SELECT a, b, ha, hab FROM chained"
    got = {
        (a, b): (int(ha), int(hab))
        for a, b, ha, hab in con.execute(sql).fetchall()
    }
    assert got == long_ref


def test_non_ascii_errors_not_mishashes():
    """strlen is bytes, ord() is code points — non-ASCII would silently
    diverge from Spark's UTF-8-byte hashing, so the oracle aborts."""
    con = duckdb.connect()
    sql = "WITH strs AS (SELECT 'héllo' AS tok)"
    sql += chain("strs", str_hash_steps("th", "tok", "42"), "c", "hashed")
    sql += " SELECT th FROM hashed"
    with pytest.raises(Exception, match="non-ASCII"):
        con.execute(sql).fetchone()




def test_simhash_oracle_pairs_match_spark(spark):
    """End-to-end: the generated simhash oracle SQL reproduces Spark's
    simhash_pairs exactly on the sf0.001 documents table."""
    from ons_utils_spark.operators.dedup import simhash_pairs
    from ons_utils_spark.plans.oracle_xxh64 import simhash_pairs_oracle
    from ons_utils_spark.plans.queries import _TOKS_CTE
    from ons_utils_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    spark_pairs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(docs, "doc_id", "text", n=2, max_hamming=3).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    oracle_pairs = {
        (a, b, h)
        for a, b, h in con.execute(
            simhash_pairs_oracle(_TOKS_CTE, max_hamming=3)
        ).fetchall()
    }
    assert spark_pairs == oracle_pairs and spark_pairs
