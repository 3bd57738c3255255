"""Behavioral analytics over event streams: ordered funnels and
retention cohorts.

Both are pure relational compositions (no UDFs, no per-user Python):

- **funnel_conversion**: users completing step k must have events of the
  step types in strict chronological order. Computed as a chain of
  min-after aggregates — step k's earliest qualifying timestamp is
  ``min(ts | type = s_k AND ts > t_{k-1})`` — one filtered aggregate +
  user-keyed join per step, all codegen'd, shuffles keyed by the user
  id. Funnels are short (3-5 steps), so the chain stays shallow.
- **retention_cohorts**: users grouped by their first-activity period;
  for each (cohort, period offset) the count of cohort members active in
  that period. Two aggregates over the deduplicated (user, period)
  activity table.

At 100 TB both reduce event volume at the first aggregate; everything
after operates on O(users) or O(users x periods) rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame as SparkDF, functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def _min_after(events: SparkDF, prev: SparkDF, prev_t: str, t: str) -> SparkDF:
    return (
        events.join(prev.select("user", prev_t), "user")
        .where(F.col("__ts") > F.col(prev_t))
        .groupBy("user")
        .agg(F.min("__ts").alias(t))
    )


def funnel_steps(
    df: SparkDF,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> SparkDF:
    """Per-user funnel progress → ``(user, t0..t{k-1})`` with NULL from
    the first step the user never reached (strict chronological order).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")

    def events_of(step: str) -> SparkDF:
        return df.where(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("__ts")
        )

    out = events_of(steps[0]).groupBy("user").agg(F.min("__ts").alias("t0"))
    for i, step in enumerate(steps[1:], start=1):
        reached = _min_after(events_of(step), out, f"t{i - 1}", f"t{i}")
        out = out.join(reached, "user", "left")
    return out


def funnel_conversion(
    df: SparkDF,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> SparkDF:
    """Ordered-funnel step counts → ``(step_idx, step, users,
    conversion)``.

    A user reaches step ``k`` iff they have events of types
    ``steps[0..k]`` at STRICTLY increasing timestamps (the standard
    product-analytics funnel; a purchase logged before the view does not
    count). ``conversion`` is each step's user count over step 0's,
    rounded to 6.
    """
    progress = funnel_steps(df, user_col, type_col, ts_col, steps)
    counts = progress.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"u{i}")
            for i in range(len(steps))
        ]
    )
    # Melt the single counts row with ONE explode — a per-step
    # select+union would reference `counts` once per step, and each
    # reference re-executes the whole upstream funnel chain.
    melted = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("step_idx"),
                    F.lit(step).alias("step"),
                    F.col(f"u{i}").alias("users"),
                )
                for i, step in enumerate(steps)
            ]
        )
    )
    return (
        counts.select(F.col("u0"), melted.alias("s"))
        .select(
            "s.step_idx",
            "s.step",
            "s.users",
            F.round(F.col("s.users") / F.col("u0"), 6).alias("conversion"),
        )
    )


def state_history(
    df: SparkDF,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak: Sequence[str] = (),
) -> SparkDF:
    """Compact an event log into SCD2-style state intervals →
    ``(key, state, effective_from, effective_to)``.

    Consecutive events with the SAME state collapse into one interval;
    a state change opens a new interval whose ``effective_from`` is the
    changing event's timestamp and closes the previous one at the same
    instant (half-open ``[from, to)`` ranges; the current interval has
    ``effective_to = NULL``). This is the classic CDC/dimension-history
    compaction — an event stream becomes the type-2 slowly-changing
    table you can as-of join against.

    Events sharing a timestamp make "consecutive" ambiguous; pass
    ``tiebreak`` columns (e.g. an event id) to pin a total order, or
    results are nondeterministic exactly where the input is.

    One shuffle on the key; two window passes (lag to find changes, lead
    to close intervals) over that same partitioning.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .withColumn("__first", F.lag(F.lit(1)).over(w).isNull())
        .where(
            # Null-safe change test: a NULL state is a state of its own,
            # and only the partition's FIRST row may have __prev NULL by
            # position (lag of the probe literal distinguishes the two).
            F.col("__first") | ~F.col(state_col).eqNullSafe(F.col("__prev"))
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("effective_from"),
            *[F.col(c).alias(f"__tb_{c}") for c in tiebreak],
        )
    )
    w2 = Window.partitionBy("key").orderBy(
        "effective_from", *[f"__tb_{c}" for c in tiebreak]
    )
    return changes.withColumn(
        "effective_to", F.lead("effective_from").over(w2)
    ).select("key", "state", "effective_from", "effective_to")


def retention_cohorts(
    df: SparkDF,
    user_col: str,
    ts_col: str,
    unit: str = "week",
) -> SparkDF:
    """Retention triangle → ``(cohort, offset, users)``.

    ``cohort`` is the ``date_trunc(unit)`` period of each user's FIRST
    event; ``offset`` counts periods since the cohort period; ``users``
    is how many cohort members were active in that period. ``offset = 0``
    rows equal the cohort sizes by construction.
    """
    if unit not in _PERIOD_DAYS:
        raise ValueError(f"unit must be one of {sorted(_PERIOD_DAYS)}, got {unit!r}")
    days = _PERIOD_DAYS[unit]
    activity = df.select(
        F.col(user_col).alias("user"),
        F.date_trunc(unit, F.col(ts_col)).alias("period"),
    ).distinct()
    firsts = activity.groupBy("user").agg(F.min("period").alias("cohort"))
    return (
        activity.join(firsts, "user")
        .select(
            "cohort",
            (F.datediff("period", "cohort") / days).cast("int").alias("offset"),
        )
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )
