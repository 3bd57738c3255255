"""Measure ADC LUT plan/compile cost at FAISS-standard geometry.

The ADC lookup tables are plan literals: ``m × k`` doubles on the raw
path (``pq_adc_scores``), ``n_probe × m × k`` on the residual path
(``ivf_pq_topk(by_residual=True)``). At the tested k=16 geometries that
is ≤ 512 literals; FAISS-standard 8-bit codes mean k=256 — at m=16,
n_probe=8 the residual LUT is 32,768 literals in one projection. This
codebase has hit literal-heavy codegen walls before (semantic.py's
k≈16 BLAS switch), so: measure, don't guess.

Each timing is min-of-N over interleaved trials (host noise dwarfs
single-trial differences — see SCALING.md §measurement).

Usage: python tools/pq_lut_probe.py [n_rows] [n_trials]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def synth_codebooks(m, k, sub_d):
    """Deterministic synthetic codebooks — geometry probe only (timing
    is insensitive to centroid values, only to literal COUNT)."""
    return [
        [
            [((i * 31 + j * 17 + d * 7) % 97) / 96.0 for d in range(sub_d)]
            for j in range(k)
        ]
        for i in range(m)
    ]


def synth_coded(spark, n_rows, m, k, n_lists):
    return spark.range(n_rows).select(
        F.col("id"),
        F.array(*[
            (F.xxhash64(F.col("id"), F.lit(i)) % k + k) % k
            for i in range(m)
        ]).cast("array<int>").alias("codes"),
        ((F.xxhash64("id") % n_lists + n_lists) % n_lists)
        .cast("int").alias("__list"),
    ).localCheckpoint(eager=True)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.range(1000).count()  # warm

    from ons_utils_spark.operators import pq

    # Total literal counts: m*k raw, n_probe*m*k residual. The 512- and
    # 1024-literal geometries bracket _ADC_LITERAL_MAX from both sides —
    # the threshold must sit on MEASURED points, not extrapolation.
    geoms = [
        ("raw m=4 k=16 (64 lits)", 4, 16, 16, None),
        ("raw m=8 k=64 (512 lits)", 8, 64, 8, None),
        ("raw m=8 k=128 (1024 lits)", 8, 128, 8, None),
        ("raw m=16 k=256 (4096 lits)", 16, 256, 4, None),
        ("res m=4 k=16 np=2 (128 lits)", 4, 16, 16, 2),
        ("res m=4 k=64 np=4 (1024 lits)", 4, 64, 16, 4),
        ("res m=16 k=256 np=8 (32768 lits)", 16, 256, 4, 8),
    ]
    n_lists = 16
    results = {}
    for label, m, k, sub_d, n_probe in geoms:
        cbs = synth_codebooks(m, k, sub_d)
        coded = synth_coded(spark, n_rows, m, k, n_lists)
        dim = m * sub_d
        q = [(d * 13 % 29) / 29.0 for d in range(dim)]
        for meth in ("literal", "arrow"):
            times = []
            for t in range(trials):
                t0 = time.monotonic()
                if n_probe is None:
                    out = pq.pq_adc_topk(coded, cbs, q, topk=10, method=meth)
                else:
                    coarse = [
                        [((l * 11 + d) % 23) / 22.0 for d in range(dim)]
                        for l in range(n_lists)
                    ]
                    out = pq.ivf_pq_topk(
                        coded, coarse, cbs, q, n_probe=n_probe, topk=10,
                        by_residual=True, method=meth,
                    )
                n = len(out.collect())
                times.append(time.monotonic() - t0)
                assert n == 10
            results[f"{label} [{meth}]"] = min(times)
            print(
                f"{label:36s} {meth:7s} min={min(times):7.3f}s  "
                f"all={['%.2f' % x for x in times]}",
                flush=True,
            )
    print(results)


if __name__ == "__main__":
    main()
