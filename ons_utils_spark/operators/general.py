"""Column helpers, window specs, and the grouped pandas-apply runner.

Spark-3-first re-implementation of reference ``ons_utils/pyspark/general.py``
(SURVEY.md §2.2/§2.4/§2.5/§2.8). Key upgrades over the reference:

- grouped pandas apply uses ``DataFrame.groupBy(...).applyInPandas`` (the
  Spark-3 spelling of the 2.4-era GROUPED_MAP ``pandas_udf`` at reference
  ``general.py:84-89``);
- ``get_first_group`` builds ``Column`` predicates instead of interpolating
  an SQL string (reference ``general.py:224-228`` — injection/quoting hazard
  flagged in SURVEY.md §2.2);
- ``diff`` is a JVM-side higher-order array expression, not a Python UDF
  (reference ``udfs.py:7-10``) — stays inside whole-stage codegen;
- Hive helpers use the public ``spark.catalog`` API.
"""

from __future__ import annotations

from typing import Any, Callable, List, Mapping, Optional, Sequence, Tuple, Union

import pandas as pd
from pyspark.sql import (
    Column as SparkCol,
    DataFrame as SparkDF,
    SparkSession,
    Window,
    WindowSpec,
    functions as F,
)
from pyspark.sql.types import StructType

from ons_utils_spark.generic import is_non_string_sequence, list_convert


def convert_to_spark_col(s: Union[str, SparkCol]) -> SparkCol:
    """Strings → ``F.col``; Columns pass through; anything else raises.

    Parity: reference ``general.py:29-39`` (``ValueError`` on non-str/Column,
    including NaN — pinned by ``tests/pyspark/test_general.py:8-35``).
    """
    if isinstance(s, str):
        return F.col(s)
    if isinstance(s, SparkCol):
        return s
    raise ValueError(
        "expecting a string or pyspark column but received obj"
        f" of type {type(s)}"
    )


def grouped_apply(
    df: SparkDF,
    func: Callable[..., pd.DataFrame],
    schema: Union[StructType, str],
    groups: Union[str, Sequence[str]],
    keep_index: bool = False,
    args: Optional[Sequence[Any]] = None,
    kwargs: Optional[Mapping[str, Any]] = None,
    batched: bool = True,
    num_partitions: Optional[int] = None,
) -> SparkDF:
    """Run a pandas ``DataFrame → DataFrame`` function per group on Spark.

    Shuffles by ``groups``, applies ``func(group_df, *args, **kwargs)`` to
    each complete group, and re-attaches the group-key values to every
    output row (so ``func`` need not preserve them). ``schema`` (StructType
    or DDL string) must describe the output INCLUDING the group columns
    first. ``batched=True`` (default) streams many groups per Arrow batch
    through one ``mapInPandas`` pass — same semantics, ~100× less per-group
    dispatch overhead when groups are small; ``batched=False`` is the
    classic one-Arrow-batch-per-group ``applyInPandas`` plan (better when
    single groups are huge and per-group memory dominates).

    Parity: reference ``convert_to_pandas_udf`` + ``df.groupby().apply()``
    (``general.py:42-106``), with the ``keep_index`` reset (``:93-95``) and
    key re-broadcast (``:97-104``) semantics kept; index access is defensive
    (``iloc[0]``, not ``loc[0]`` — SURVEY.md §7 risk register).

    At scale: one shuffle on the group keys; each group must fit in one
    Python worker's memory — for heavy skew, pre-salt or pre-aggregate.

    ``num_partitions`` (default ``sparkContext.defaultParallelism``) is
    passed to the shuffle EXPLICITLY. This matters: a count-less
    ``repartition(*groups)`` / plain ``groupBy`` exchange is eligible for
    AQE partition coalescing, which is byte-based — a Python-CPU-heavy
    stage whose shuffle bytes are small gets collapsed to ONE partition
    and every group runs serially on one core (measured 3.4× slowdown on
    15k small groups). Explicit-count repartitions are never coalesced.
    """
    groups = list_convert(groups)
    args = list(args) if args else []
    kwargs = dict(kwargs) if kwargs else {}
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism

    def apply_one(pdf: pd.DataFrame) -> pd.DataFrame:
        key_values = pdf[groups].iloc[0]
        result = func(pdf, *args, **kwargs)
        if keep_index:
            result = result.reset_index()
        # Insert key columns in place instead of pd.concat of two frames —
        # with many small groups the per-group concat overhead dominates
        # (measured ~35% of wall time on 15k ~10-row groups).
        for position, g in enumerate(groups):
            if g in result.columns:
                result = result.drop(columns=[g])
            result.insert(position, g, key_values[g])
        return result

    if not batched:
        # The explicit-count repartition already hash-clusters rows by the
        # group keys, so Catalyst elides the groupBy's own exchange — we get
        # the AQE-proof partitioning for free, not a second shuffle.
        return (
            df.repartition(num_partitions, *groups)
            .groupBy(*groups)
            .applyInPandas(apply_one, schema)
        )

    # Batched form: one shuffle on the keys + in-partition sort makes every
    # group a contiguous run, then ONE mapInPandas pass walks Arrow batches
    # of many groups at a time. Spark's per-group applyInPandas dispatch
    # costs ~13 ms/group (measured: 1500 ten-row groups → 20 s); the batched
    # walk pays only a pandas-level groupby, ~100× cheaper, while func still
    # sees each COMPLETE group: a group split across Arrow batches is
    # carried forward until its last row arrives (carry grows only as large
    # as one group, so memory stays O(group), same as applyInPandas).
    def mapper(batches):
        import numpy as np

        carry: Optional[pd.DataFrame] = None

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            # dropna=False: NULL group keys are real groups (applyInPandas
            # delivers them too); pandas' default dropna=True would silently
            # drop every null-keyed row from the batched path only.
            #
            # Key columns attach ONCE per run via np.repeat over the group
            # sizes instead of a drop+insert pair per group (r13): at ~10k
            # small groups the per-group frame surgery was ~2× the whole
            # runner's cost (measured 9.8 → 4.6 s single-process for 150k
            # rows / 10k groups; output value-equal). Same semantics as
            # apply_one: func-returned group columns are dropped, the
            # group's own key values land at the same positions, and key
            # dtype inference goes through a pd.Series of the per-group
            # keys — exactly what per-group scalar inserts concat to.
            outs, key_rows, sizes = [], [], []
            for key, g in pdf.groupby(groups, sort=False, dropna=False):
                result = func(g.reset_index(drop=True), *args, **kwargs)
                if keep_index:
                    result = result.reset_index()
                drop = [c for c in groups if c in result.columns]
                if drop:
                    result = result.drop(columns=drop)
                outs.append(result)
                key_rows.append(key if isinstance(key, tuple) else (key,))
                sizes.append(len(result))
            big = pd.concat(outs, ignore_index=True)
            sizes_arr = np.asarray(sizes, dtype=np.int64)
            for position, gcol in enumerate(groups):
                col = (
                    pd.Series([kt[position] for kt in key_rows])
                    .repeat(sizes_arr)
                    .to_numpy()
                )
                big.insert(position, gcol, col)
            return big

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            # Rows of the last (possibly incomplete) group form a
            # contiguous tail after the sort — hold them for the next batch.
            # dropna=False also keeps gid an int series — with the default,
            # null-keyed rows get gid NaN, the series turns float, and the
            # searchsorted tail-carry logic below breaks.
            gid = pdf.groupby(groups, sort=False, dropna=False).ngroup()
            tail = int(gid.searchsorted(gid.iat[-1]))
            if tail > 0:
                yield run(pdf.iloc[:tail])
            carry = pdf.iloc[tail:]
        if carry is not None and not carry.empty:
            yield run(carry)

    return (
        df.repartition(num_partitions, *groups)
        .sortWithinPartitions(*groups)
        .mapInPandas(mapper, schema)
    )


# Back-compat name mirroring the reference API: returns a callable suitable
# for ``df.groupBy(groups).applyInPandas(fn, schema)``.
def convert_to_pandas_udf(
    func: Callable[..., pd.DataFrame],
    schema: Union[StructType, str],
    groups: Sequence[str],
    keep_index: bool = False,
    args: Optional[Sequence[Any]] = None,
    kwargs: Optional[Mapping[str, Any]] = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Reference-shaped factory (``general.py:42-106``): wrap ``func`` for
    ``applyInPandas``. Prefer :func:`grouped_apply`, which also runs it."""
    groups = list_convert(list(groups))
    args_ = list(args) if args else []
    kwargs_ = dict(kwargs) if kwargs else {}

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        key_values = pdf[groups].iloc[0]
        result = func(pdf, *args_, **kwargs_)
        if keep_index:
            result = result.reset_index()
        for position, g in enumerate(groups):
            if g in result.columns:
                result = result.drop(columns=[g])
            result.insert(position, g, key_values[g])
        return result

    return wrapped


def get_ddl_schema(fields: Sequence[Tuple[str, str]]) -> str:
    """``(name, dtype)`` pairs → DDL schema string (reference ``general.py:109-125``)."""
    return ",\n".join(f"{name} {dtype}" for name, dtype in fields)


def get_fields(
    df: SparkDF,
    selection: Optional[Sequence[str]] = None,
) -> List[Tuple[str, str]]:
    """The ``(name, dtype)`` fields of ``df``, optionally subset + ordered.

    Always returns pairs — the reference returns a *dict* when ``selection``
    is None (``general.py:144-149``), a bug SURVEY.md §2.10 says to fix.
    """
    fields = dict(df.dtypes)
    if selection:
        return [(col, fields.get(col)) for col in selection]
    return list(fields.items())


def map_col(col_name: Union[str, SparkCol], mapping: Mapping[Any, Any]) -> SparkCol:
    """Dict-lookup projection: ``mapping[col]``; unmatched keys → NULL.

    List/tuple values become array columns. The mapping is baked into the
    plan as a ``MapType`` literal (reference ``general.py:152-162``) — fine
    for small dicts; Catalyst constant-folds it. For large lookups use
    :func:`lookup_join` instead (broadcast hash join, no giant literal).
    """
    entries: list[SparkCol] = []
    for key, value in mapping.items():
        entries.append(F.lit(key))
        if is_non_string_sequence(value):
            entries.append(F.array([F.lit(v) for v in value]))
        else:
            entries.append(F.lit(value))
    return F.create_map(entries)[convert_to_spark_col(col_name)]


def lookup_join(
    df: SparkDF,
    col_name: str,
    mapping: Mapping[Any, Any],
    out_col: str,
) -> SparkDF:
    """Scale-path alternative to :func:`map_col`: broadcast-join a lookup df.

    A ``create_map`` literal with 10⁵+ entries bloats the plan and every task
    closure; a broadcast hash join keeps the lookup as data. Semantics match
    ``map_col`` (unmatched → NULL) via a left join.
    """
    spark = df.sparkSession
    lookup = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=[col_name, out_col]
    )
    return df.join(F.broadcast(lookup), on=col_name, how="left")


def map_column_names(df: SparkDF, mapper: Mapping[str, str]) -> SparkDF:
    """Rename many columns at once; unmapped names pass through.

    Parity: reference ``general.py:202-211``. Implemented as one projection
    (zero-cost at the physical level — pure metadata).
    """
    return df.select(
        *[F.col(c).alias(mapper.get(c, c)) for c in df.columns]
    )


def get_window_spec(
    groups: Union[str, Sequence[str], None] = None,
    order_by: Union[str, Sequence[str], None] = None,
) -> WindowSpec:
    """WindowSpec partitioned by ``groups`` (default: whole DataFrame).

    Parity: reference ``general.py:170-183``; extended with ``order_by``.

    .. warning:: With ``groups=None`` the window is a single partition — every
       row lands on one task. Only suitable for small DataFrames (reference
       docstring, ``general.py:173-179``); at scale compute global aggregates
       with ``agg`` + ``crossJoin(broadcast(...))`` instead.
    """
    spec = Window.partitionBy(list_convert(groups)) if groups else Window.partitionBy()
    if order_by:
        spec = spec.orderBy(list_convert(order_by))
    return spec


def to_list(df: SparkDF) -> List[Any]:
    """Collect: 1-column df → flat list; multi-column → list of row-lists.

    Parity: reference ``general.py:186-199``. This is an action (Arrow
    collect) — driver-side, test/small data only.
    """
    pdf = df.toPandas()
    if len(df.columns) == 1:
        return pdf[df.columns[0]].tolist()
    return pdf.values.tolist()


def map_column_values_to_list(df: SparkDF, *cols: str) -> List[Any]:
    """Convenience: project then :func:`to_list`."""
    return to_list(df.select(*cols))


def get_hive_table_columns(spark: SparkSession, table_path: str) -> List[str]:
    """Column names of a catalog table via the public catalog API.

    Parity: reference ``general.py:214-216`` (which shells out to
    ``SHOW columns``); this uses ``spark.catalog.listColumns``.
    """
    return [c.name for c in spark.catalog.listColumns(table_path)]


def hive_table_exists(spark: SparkSession, database: str, table: str) -> bool:
    """Catalog probe via the public API (reference ``validation.py:318-320``
    used the private ``_jsparkSession``)."""
    return spark.catalog.tableExists(f"{database}.{table}" if database else table)


def transform(df: SparkDF, f: Callable[..., SparkDF], *args: Any, **kwargs: Any) -> SparkDF:
    """Functional chaining helper (reference ``general.py:219-221``).

    Spark 3's built-in ``DataFrame.transform`` covers this; kept for parity.
    """
    return f(df, *args, **kwargs)


def get_first_group(df: SparkDF, groups: Union[str, Sequence[str]]) -> SparkDF:
    """Filter ``df`` to the group of its first row.

    Parity: reference ``general.py:224-228``, rewritten with ``Column``
    equality predicates (null-safe ``eqNullSafe``) instead of f-string SQL —
    the reference breaks on quotes/non-string group values.

    Note: ``head(1)`` is an action; the returned filter is lazy.
    """
    groups = list_convert(groups)
    row = df.select(*groups).head(1)[0]
    predicate = None
    for group in groups:
        clause = F.col(group).eqNullSafe(F.lit(row[group]))
        predicate = clause if predicate is None else predicate & clause
    return df.filter(predicate)


def diff(col: Union[str, SparkCol]) -> SparkCol:
    """Consecutive differences of an array column → ``array<float>``.

    JVM-side higher-order expression replacing the reference's row-at-a-time
    ``np.diff`` UDF (``udfs.py:7-10``) — same result, no Python worker, stays
    in whole-stage codegen. Empty/singleton arrays → empty array; NULL → NULL.
    """
    c = convert_to_spark_col(col)
    n = F.size(c)
    shifted_pairs = F.zip_with(
        F.slice(c, F.lit(2), n - F.lit(1)),   # a[1:]
        F.slice(c, F.lit(1), n - F.lit(1)),   # a[:-1]
        lambda cur, prev: (cur - prev).cast("float"),
    )
    empty = F.array().cast("array<float>")
    return (
        F.when(n >= 2, shifted_pairs)
        .when(c.isNotNull(), empty)
        .otherwise(F.lit(None).cast("array<float>"))
    )


def robust_outliers(
    df: SparkDF,
    group_col: str,
    value_col: str,
    n_mads: float = 3.0,
) -> SparkDF:
    """Flag outliers per group by MEDIAN / MAD — the robust z-score.

    Adds ``__median``, ``__mad`` (median absolute deviation, both exact
    percentiles), ``robust_z`` (``0.6745 * |x - median| / MAD``, the
    consistency-scaled form comparable to a normal z-score), and
    ``is_outlier`` (``robust_z > n_mads``; never true when MAD is 0 —
    a constant group has no outliers by this test). Unlike mean/stddev
    z-scores, a single wild value cannot mask itself by inflating the
    spread estimate.

    Two aggregate passes over the groups (median, then MAD of the
    residuals) broadcast back — the data itself never shuffles, matching
    the ``percentile_length_cap`` pattern. Null-safe on the group key.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__median")
    )
    mad = (
        df.join(
            F.broadcast(med.withColumnRenamed(group_col, "__og")),
            F.col(group_col).eqNullSafe(F.col("__og")),
        )
        .withColumn("__absdev", F.abs(F.col(value_col) - F.col("__median")))
        .groupBy("__og")
        .agg(F.expr("percentile(__absdev, 0.5)").alias("__mad"))
    )
    # One combined per-group stats table broadcast into ONE final join —
    # joining median and MAD separately would reference the med-joined
    # frame twice and re-scan the data a fourth time. Three passes total
    # (median, MAD, score) — the exact two-pass statistic plus output.
    stats = med.join(
        mad, F.col(group_col).eqNullSafe(F.col("__og"))
    ).drop("__og").withColumnRenamed(group_col, "__og")
    out = df.join(
        F.broadcast(stats), F.col(group_col).eqNullSafe(F.col("__og"))
    ).drop("__og")
    z = F.when(
        F.col("__mad") > 0,
        0.6745 * F.abs(F.col(value_col) - F.col("__median")) / F.col("__mad"),
    ).otherwise(F.lit(0.0))
    return out.withColumn("robust_z", z).withColumn(
        "is_outlier", F.col("robust_z") > n_mads
    )


def fk_violations(
    child: SparkDF,
    parent: SparkDF,
    child_keys: Sequence[str],
    parent_keys: Optional[Sequence[str]] = None,
) -> SparkDF:
    """Referential-integrity check: child rows whose foreign key has no
    parent — the anti-join data-quality audit.

    Returns the violating CHILD rows unchanged (empty result = integrity
    holds). NULL foreign keys are violations too (they match no parent
    under SQL join semantics, and an FK of NULLs referencing nothing is
    exactly what this audit should surface); filter them out first if
    NULLs are legitimate in your schema. One shuffle keyed by the FK —
    or none when the parent key set broadcasts.
    """
    parent_keys = list(parent_keys or child_keys)
    child_keys = list(child_keys)
    if len(child_keys) != len(parent_keys):
        raise ValueError("child_keys and parent_keys must align")
    pk = parent.select(
        *[F.col(p).alias(f"__pk_{i}") for i, p in enumerate(parent_keys)]
    ).distinct()
    cond = None
    for i, c in enumerate(child_keys):
        clause = F.col(c) == F.col(f"__pk_{i}")
        cond = clause if cond is None else cond & clause
    return child.join(pk, cond, "left_anti")
