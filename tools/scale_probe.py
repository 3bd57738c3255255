"""Scale probe: replicate the fact tables N× in-plan and measure how query
time scales — evidence that the plans survive a data-size step-up.

Replication is a union of N shifted copies (keys offset so join/group
cardinalities scale too, not just row counts). Healthy plans scale
near-linearly in rows; a quadratic stage or a collapsing single partition
shows up immediately as super-linear time.

Usage: python tools/scale_probe.py [factor] [sf_dir]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import DataFrame, functions as F

    from ons_utils_spark.session import get_session
    from ons_utils_spark.sources.tables import load_table

    # local-mode JVMs default to a 1 GB heap shared by every task thread —
    # fine for the bench corpus, not for 10x-replicated postings stages.
    # A real cluster sizes executor memory explicitly; do the same here.
    spark = get_session(
        app_name="scale_probe",
        extra_configs={"spark.driver.memory": "24g"},
    )
    spark.range(1000).count()

    def replicate(df: DataFrame, key_cols: list[str], factor: int) -> DataFrame:
        copies = []
        for i in range(factor):
            copy = df
            for k in key_cols:
                copy = copy.withColumn(k, F.col(k) + F.lit(i * 1_000_000_000))
            copies.append(copy)
        return functools.reduce(DataFrame.unionByName, copies)

    lineitem = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    documents = load_table(spark, SF_DIR, "documents")

    def replicate_docs(df: DataFrame, factor: int) -> DataFrame:
        """Replicate documents with DISJOINT shingle spaces per copy.

        Every token gets a copy-specific prefix, so shingle sets never
        overlap across copies — the near-dup pair structure replicates
        exactly factor×, making the probe a fair linear scale-up (plain
        id-shifted copies of IDENTICAL text would manufacture
        C(factor,2)·docs cross-copy duplicate pairs: a quadratic workload
        no real corpus has).
        """
        copies = []
        for i in range(factor):
            copies.append(
                df.select(
                    (F.col("doc_id") + F.lit(i * 1_000_000_000)).alias("doc_id"),
                    F.regexp_replace("text", r"(\S+)", f"c{i}$1").alias("text"),
                )
            )
        return functools.reduce(DataFrame.unionByName, copies)

    def q1(li: DataFrame) -> DataFrame:
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(disc).alias("rev"), F.count(F.lit(1)).alias("n"))
        )

    def q_join(li: DataFrame, o: DataFrame) -> DataFrame:
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )

    results = {}
    for name, build in {
        "q1_agg": lambda f: q1(replicate(lineitem, ["l_orderkey"], f)),
        "fact_fact_join": lambda f: q_join(
            replicate(lineitem, ["l_orderkey"], f),
            replicate(orders, ["o_orderkey"], f),
        ),
        "minhash_dedup": lambda f: __import__(
            "ons_utils_spark.operators.dedup", fromlist=["minhash_lsh_pairs"]
        ).minhash_lsh_pairs(replicate_docs(documents, f), "doc_id", "text"),
        "containment_pairs": lambda f: __import__(
            "ons_utils_spark.operators.dedup", fromlist=["containment_pairs"]
        ).containment_pairs(
            replicate_docs(documents, f), "doc_id", "text", threshold=0.25
        ),
        # Disjoint token spaces per copy also scale the DISTINCT-token
        # cardinality, the dimension that actually stresses vocab build.
        "build_vocab": lambda f: __import__(
            "ons_utils_spark.operators.corpus", fromlist=["build_vocab"]
        ).build_vocab(replicate_docs(documents, f), "text", k=100),
        "training_order": lambda f: __import__(
            "ons_utils_spark.operators.sampling", fromlist=["training_order"]
        ).training_order(
            replicate(documents.select("doc_id"), ["doc_id"], f),
            "doc_id",
            n_shards=32,
        ),
        "batch_inference": lambda f: __import__(
            "ons_utils_spark.operators.inference", fromlist=["batch_score"]
        ).batch_score(replicate_docs(documents, f), "text"),
    }.items():
        times = {}
        # Untimed warmup so the 1x measurement doesn't carry codegen cost.
        build(1).write.format("noop").mode("overwrite").save()
        for factor in (1, FACTOR):
            t0 = time.perf_counter()
            build(factor).write.format("noop").mode("overwrite").save()
            times[factor] = round(time.perf_counter() - t0, 2)
        ratio = round(times[FACTOR] / times[1], 2) if times[1] else None
        results[name] = {"t_1x": times[1], f"t_{FACTOR}x": times[FACTOR], "ratio": ratio}

    print(json.dumps({"factor": FACTOR, "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
