"""The plan-audit detector must catch the r2 scale bugs' plan shapes.

r2 verdict #7: the audit gained a check for Python map stages fed by an
AQE-coalescible exchange (the ``grouped_apply`` bug — byte-based coalescing
serialized a Python-CPU-heavy stage onto one core). These tests prove the
detector fires on the broken form and stays quiet on the fixed form, so the
audit in CI actually guards the regression.
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import coalescible_python_stages  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ident(batches):
    for pdf in batches:
        yield pdf[["g", "v"]]


def _base(spark):
    return spark.createDataFrame(
        [(f"g{i % 10}", float(i)) for i in range(100)], "g string, v double"
    )


class TestCoalesciblePythonStageDetector:
    def test_flags_countless_repartition_mapinpandas(self, spark):
        # The r2 grouped_apply form: repartition by column WITHOUT a count
        # -> ENSURE_REQUIREMENTS/REPARTITION_BY_COL exchange, coalescible.
        df = (
            _base(spark)
            .repartition("g")
            .mapInPandas(_ident, "g string, v double")
        )
        assert coalescible_python_stages(_plan(df))

    def test_flags_plain_groupby_applyinpandas(self, spark):
        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return pdf[["g", "v"]]

        df = _base(spark).groupBy("g").applyInPandas(
            per_group, "g string, v double"
        )
        assert coalescible_python_stages(_plan(df))

    def test_accepts_explicit_count_repartition(self, spark):
        # The r3 fixed form: explicit-count repartition is AQE-exempt.
        df = (
            _base(spark)
            .repartition(4, "g")
            .mapInPandas(_ident, "g string, v double")
        )
        assert coalescible_python_stages(_plan(df)) == []

    def test_accepts_narrow_python_map(self, spark):
        # No exchange feeding the Python node: inherits scan parallelism.
        df = _base(spark).mapInPandas(_ident, "g string, v double")
        assert coalescible_python_stages(_plan(df)) == []

    def test_registry_python_stages_clean(self, spark):
        """Every registered query with a Python map stage uses an
        AQE-exempt exchange (the two r2 offenders are fixed)."""
        from ons_utils_spark.plans.queries import QUERIES

        offenders = {}
        for name in [
            "q_grouped_apply_spend_share",
            "q_embedding_near_dup",
            "q_year_span_ffill",
            "q_multimodal_features",
        ]:
            df = QUERIES[name].spark(spark, "/root/testdata/sf0.001")
            flags = coalescible_python_stages(_plan(df))
            if flags:
                offenders[name] = flags
        assert offenders == {}
