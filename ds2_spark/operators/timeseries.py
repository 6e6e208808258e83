"""Time-series operators: as-of join and gap sessionization.

Neither exists in the reference (UCSC-REAL/DS2 has no time axis at
all); both are table-stakes for an analytics engine over event/clip
streams and both are graded as first-class operators here, with exact
DuckDB oracles (ASOF JOIN is native DuckDB; sessionization is plain
ANSI window SQL).

Scale design (the part that must survive 100 TB):

* ``asof_join`` does NOT use a range/inequality join — a naive
  ``l.ts >= r.ts`` theta-join is a per-key cross product (O(|L|x|R|)
  per key) that no optimizer saves. Instead both sides are tagged and
  UNIONed, shuffled ONCE on the join key, and a single
  ``last(value, ignorenulls=True)`` running window ordered by
  (ts, side) carries the most recent right-side value onto each left
  row. Cost: one shuffle of (key, ts, carried columns), one
  per-partition sort — the same plan shape Spark uses for any keyed
  window. Skewed keys behave exactly like any skewed window key (AQE
  or pre-salting upstream), and there is no driver-side state.

* ``sessionize`` is the classic gap-and-island decomposition: a lag
  diff marks session starts, a running sum numbers sessions within
  each user — one shuffle on user_id, two window passes over the same
  sorted run (Spark executes both in a single Sort + Window chain, no
  second exchange). Equivalent to Structured Streaming's
  ``session_window`` in batch form; the streaming twin lives in
  streaming/events.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

_SIDE = "__asof_side"
_RTS = "__asof_rts"


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Exact epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns,
    independent of the session time zone. NTZ (what parquet scans of
    naive timestamps produce) diffs against an NTZ epoch literal, so
    no zone conversion is ever applied — the same wall-clock-as-UTC
    reading DuckDB's epoch_us gives a naive timestamp. unix_micros
    alone rejects NTZ input."""
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"timestamp_ntz'1970-01-01 00:00:00', `{col}`)"
        )
    return F.unix_micros(F.col(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    values: Sequence[str] = ("value",),
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row's
    ``values`` at the largest right ``ts`` <= the left row's ``ts``
    (inclusive), per join key — SQL ``ASOF LEFT JOIN``.

    ``tolerance_us``: if set, a match older than this many
    microseconds is nulled out (pandas ``merge_asof`` tolerance).
    Right side must be unique per (key, ts) — pre-aggregate if not
    (engines disagree on which duplicate wins otherwise).

    Output: all left columns, plus one ``<v><suffix>`` per value
    column and ``<ts><suffix>`` (the matched right timestamp, null if
    no match / out of tolerance).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns
    # side 0 sorts before side 1 at equal ts -> inclusive match
    r = right.select(
        *keys,
        F.col(ts).alias(ts),
        F.lit(0).alias(_SIDE),
        F.col(ts).alias(_RTS),
        *[F.col(v).alias(f"{v}{suffix}") for v in values],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys and c != ts],
    )
    l = left.select(
        *keys,
        F.col(ts).alias(ts),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[ts].dataType).alias(_RTS),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"{v}{suffix}")
          for v in values],
        *[F.col(c) for c in lcols if c not in keys and c != ts],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r)
    out = carried.select(
        *keys,
        ts,
        _SIDE,
        F.last(_RTS, ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
        *[
            F.last(f"{v}{suffix}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in values
        ],
        *[c for c in lcols if c not in keys and c != ts],
    ).where(F.col(_SIDE) == 1)
    if tolerance_us is not None:
        age = epoch_micros(out, ts) - epoch_micros(out, f"{ts}{suffix}")
        keep = age <= F.lit(tolerance_us)
        out = out.select(
            *keys,
            ts,
            F.when(keep, F.col(f"{ts}{suffix}")).alias(f"{ts}{suffix}"),
            *[F.when(keep, F.col(f"{v}{suffix}")).alias(f"{v}{suffix}")
              for v in values],
            *[c for c in lcols if c not in keys and c != ts],
        )
    else:
        out = out.drop(_SIDE)
    return out


def sessionize(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds ``gap_us`` microseconds
    (strictly greater; an event exactly at the gap continues the
    session, matching Structured Streaming's session_window whose
    window extends gap PAST the last event inclusive).

    Adds ``session_id`` (1-based per user, in time order). Ties on ts
    within a user are ordered by ``tiebreak`` when given (pass a
    unique column for exact cross-engine parity — the contract query
    uses event_id); otherwise tie order is engine-dependent.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    us = epoch_micros(events, ts)
    wo = Window.partitionBy(user).orderBy(*order)
    prev = F.lag(us).over(wo)
    is_start = F.when(prev.isNull() | (us - prev > gap_us), 1).otherwise(0)
    run = (
        Window.partitionBy(user)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_id", F.sum(is_start).over(run))


def session_stats(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count, span in microseconds, first/
    last event micros. One shuffle (the sessionize window) + one
    partial-aggregated groupBy on (user, session_id)."""
    s = sessionize(events, user=user, ts=ts, gap_us=gap_us, tiebreak=tiebreak)
    us = epoch_micros(s, ts)
    return (
        s.groupBy(user, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            (F.max(us) - F.min(us)).alias("span_us"),
        )
    )


def rolling_zscore(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    z_threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Time-series anomaly detection: per-key rolling z-score of each
    value against the PRECEDING window_us of history (current row
    excluded — an anomaly must not mask itself).

    Output: (event_id, key_col, t_us, value, n_window, z, anomaly).
    Rows with fewer than min_points of history get z=0, anomaly=0
    (not enough evidence either way).

    Spark shape: ONE shuffle on key_col, then a single Sort + Window
    computing count/sum/sum-of-squares over a rangeBetween frame on
    exact integer microseconds. Cross-engine exactness discipline
    (same trick as q_tpch_q1's integer-cents aggregation): the frame
    sums are taken over value CENTS (round(value*100) as BIGINT), so
    every engine accumulates identical integers regardless of
    summation order; mean/variance/z are then one fixed double
    expression over those integers, and z is rounded to 6 dp. A
    skewed hot key bounds at one partition per key — for truly hot
    keys pre-split by time range (same frame, union the seams).
    """
    t_us = epoch_micros(events, ts_col)
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(
        "event_id",
        F.col(key_col),
        t_us.alias("t_us"),
        F.col(value_col).alias("value"),
        cents.alias("_c"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("t_us")
        .rangeBetween(-window_us, -1)
    )
    stats = base.select(
        "event_id",
        key_col,
        "t_us",
        "value",
        "_c",
        F.count("_c").over(w).alias("n_window"),
        F.sum("_c").over(w).alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).over(w).alias("_ss"),
    )
    n = F.col("n_window").cast("double")
    mean = F.col("_s") / n
    var = F.col("_ss") / n - mean * mean
    z = F.when(
        (F.col("n_window") >= min_points) & (var > F.lit(1e-9)),
        F.round((F.col("_c") - mean) / F.sqrt(var), 6),
    ).otherwise(F.lit(0.0))
    return stats.select(
        "event_id",
        key_col,
        "t_us",
        "value",
        "n_window",
        z.alias("z"),
        (F.abs(z) > z_threshold).cast("int").alias("anomaly"),
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_us: int | None = None,
) -> DataFrame:
    """Ordered-sequence funnel analysis: for each user, the earliest
    completion times of `steps` in order — step i+1 must be STRICTLY
    after the user's chosen step-i time, and (with horizon_us) within
    the horizon of step 1. Output: (user_col, t_1..t_k as epoch
    micros, completed in 1..k). Greedy earliest-per-step is the
    standard funnel semantics (earliest step-1, then earliest
    qualifying step-2, ...), deterministic, and mirrored exactly by
    the SQL oracle.

    Spark shape: one filtered aggregate per step — step i joins only
    the rows of that step's type (a small slice after predicate
    pushdown) against the per-user frontier, then groupBy-min. All
    joins are on user_col, so after the first shuffle the
    partitioning is reused; k steps = k cheap keyed passes, no
    windows, no cross products. NULL propagation is the correctness
    guard: a user missing step i gets t_i NULL and every later
    condition (u > NULL) is NULL, so later steps can never complete
    out of order.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    us = epoch_micros(events, ts_col)
    e = events.select(
        F.col(user_col), F.col(type_col).alias("_ty"), us.alias("_u")
    )
    cur = (
        e.where(F.col("_ty") == steps[0])
        .groupBy(user_col)
        .agg(F.min("_u").alias("t_1"))
    )
    for i, st in enumerate(steps[1:], start=2):
        nxt = e.where(F.col("_ty") == st).select(user_col, "_u")
        prev = F.col(f"t_{i - 1}")
        cond = F.col("_u") > prev
        if horizon_us is not None:
            cond = cond & (F.col("_u") <= F.col("t_1") + F.lit(horizon_us))
        keys = [user_col] + [f"t_{j}" for j in range(1, i)]
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(*keys)
            .agg(F.min(F.when(cond, F.col("_u"))).alias(f"t_{i}"))
        )
    completed = F.lit(1)
    for j in range(2, len(steps) + 1):
        completed = completed + F.col(f"t_{j}").isNotNull().cast("int")
    return cur.select(
        user_col,
        *[f"t_{j}" for j in range(1, len(steps) + 1)],
        completed.alias("completed"),
    )


def funnel_arrays(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_us: int | None = None,
) -> DataFrame:
    """Sort-once funnel: identical semantics and output schema to
    `funnel` (greedy earliest-per-step, strict order, optional horizon
    from step 1), different plan — ONE shuffle total instead of k.

    Shape: filter to the k step types (pushed-down scan), ONE
    groupBy(user) collecting a time-sorted array of (epoch_us,
    step_idx), then a single JVM `aggregate()` walk over the array
    that fills the t_1..t_k slots — an event of step j claims slot j
    iff slot j is empty, slot j-1 is filled with a strictly earlier
    time, and it lands within the horizon. Walking in time order
    makes the first claim the minimum, i.e. exactly `funnel`'s
    semantics. Everything after the shuffle is whole-stage-codegen
    column arithmetic (array_sort + transform inside aggregate) — no
    window, no per-step join, no Python.

    Trade-off vs the k-pass `funnel` (measured at sf0.1, k=3 and a
    synthetic k=8 — see PLANS.md "funnel strategies"): one wide
    shuffle of every funnel-relevant event vs k narrow shuffles of
    per-step slices. The k-pass form shuffles ~the same rows in total
    (each row once, in its step's pass) plus (k-1) re-shuffles of the
    per-user frontier; this form wins as k grows and is immune to
    frontier re-shuffles, but materializes each user's full event
    array in one task — a pathological hot user (millions of
    funnel-type events) belongs in a pre-cap (same caveat as any
    collect_list). NULL propagation is structural: slot j can only
    fill after slot j-1."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    us = epoch_micros(events, ts_col)
    idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    ).cast("int")
    e = (
        events.where(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col),
            F.struct(us.alias("u"), idx.alias("idx")).alias("_ev"),
        )
    )
    per_user = e.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_ev")).alias("_evs")
    )
    init = F.array(*[F.lit(None).cast("bigint") for _ in range(k)])

    def _claim(acc, ev):
        j = ev["idx"]  # 1-based step index of this event

        def slot(v, i):
            # i is 0-based slot; slot j-1 belongs to step j
            cond = (i == j - 1) & v.isNull()
            prev_ok = F.when(
                j == 1, F.lit(True)
            ).otherwise(
                F.element_at(acc, j - 1).isNotNull()
                & (ev["u"] > F.element_at(acc, j - 1))
            )
            cond = cond & prev_ok
            if horizon_us is not None:
                in_horizon = F.when(j == 1, F.lit(True)).otherwise(
                    ev["u"] <= F.element_at(acc, 1) + F.lit(horizon_us)
                )
                cond = cond & in_horizon
            return F.when(cond, ev["u"]).otherwise(v)

        return F.transform(acc, slot)

    out = per_user.select(
        user_col, F.aggregate("_evs", init, _claim).alias("_t")
    ).where(F.element_at("_t", 1).isNotNull())
    completed = F.lit(1)
    for j in range(2, k + 1):
        completed = completed + F.element_at("_t", j).isNotNull().cast("int")
    return out.select(
        user_col,
        *[F.element_at("_t", j).alias(f"t_{j}") for j in range(1, k + 1)],
        completed.alias("completed"),
    )
