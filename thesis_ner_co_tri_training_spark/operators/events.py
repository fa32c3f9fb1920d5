"""Event-stream sessionization via native session windows.

Two equivalent forms exist in this engine:

  - q10's relational form (lag + cumulative sum over a per-user window) —
    the oracle-checkable SQL shape;
  - this operator: Spark's native `session_window`, the form that runs
    state-backed in Structured Streaming and needs no per-user ordered
    window in batch (the aggregation is a keyed hash agg with window
    merging, not a sort).

Boundary semantics differ by one edge: session_window starts a new
session when a gap is >= the duration (an event landing exactly at
last_ts + gap falls outside the previous window), while the cumulative
form splits strictly at >. Identical on any input without exact-gap
ties; the parity test uses tie-free data and documents the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """One row per (user, session): start, end, n_events.

    Works unchanged on a streaming DataFrame (add a watermark upstream);
    in batch the plan is a keyed aggregate — no global or per-user sort.
    """
    return (
        events.groupBy(user_col, F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_summary(events: DataFrame, gap: str = "30 minutes",
                    user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-user rollup of user_sessions: n_sessions, n_events."""
    return (
        user_sessions(events, gap, user_col, ts_col)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts: str = "ts", prefix: str = "r_",
              tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join: each left row gains the columns of the
    LATEST right row with right.ts <= left.ts for the same key (nulls
    when none exists) — DuckDB/pandas `ASOF JOIN` semantics, which Spark
    has no native operator for.

    Scalable form: union both sides tagged, ONE window per key ordered
    by (ts, side, tiebreak) with `last(payload, ignorenulls=True)` over
    unbounded-preceding rows. One shuffle on the key, a per-partition
    sort, no range explosion, no per-key collect — the same cost shape
    as any keyed window, so it survives arbitrarily many rows per key.
    (The naive alternatives do not: an inequality join is O(n*m) per
    key, and a range-bucketed join duplicates rows per bucket.)

    Equal timestamps: right rows sort BEFORE left rows (ts <= ts
    matches, inclusive), and among equal-ts right rows the one with the
    greatest `tiebreak` wins. The default tiebreak is the first payload
    column that is NOT the ts column (ts itself is equal among the rows
    being tie-broken, so it would leave the winner nondeterministic);
    callers whose right side can carry duplicate (key, ts, tiebreak)
    triples must pass a tiebreak unique per (key, ts) for a fully
    deterministic result. Right payload columns are prefixed.
    """
    pay_cols = [c for c in right.columns if c != key]
    if tiebreak is None:
        non_ts = [c for c in pay_cols if c != ts]
        tiebreak = non_ts[0] if non_ts else pay_cols[0]
    # SQL ASOF semantics: left.ts >= NULL is never true, so a right row
    # with a null timestamp matches nothing (without this filter it
    # would sort first under asc_nulls_first and act as an
    # earliest-possible match). A left row with null ts likewise sorts
    # before every right row and correctly gets a null match.
    right = right.filter(F.col(ts).isNotNull())
    pay_type = "struct<" + ", ".join(
        f"`{f.name}`:{f.dataType.simpleString()}"
        for f in right.schema.fields if f.name != key
    ) + ">"
    l = left.select(
        "*",
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_type).alias("__p"),
    )
    r = right.select(
        F.col(key),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in pay_cols]).alias("__p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    from pyspark.sql import Window
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", F.col(f"__p.{tiebreak}").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__p", ignorenulls=True).over(w)
    return (
        u.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in pay_cols],
        )
    )


def funnel_stages(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each step was
    reached AFTER (>=) the previous step, plus the deepest stage reached.

    Output: (user, t_<step> per step, stage) — stage = number of steps
    completed in order; a user who purchased before ever signing up does
    NOT credit the purchase step (ts >= previous-step time is required).

    Shape: one chain of whole-partition windows over the SAME user
    partitioning — each step's column references the previous step's, so
    Catalyst plans a single Exchange on the user key followed by window
    ops, then one distinct per user. No self-joins, no per-step shuffle;
    this is the funnel form that survives billions of events per day.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col)
    d = events
    prev_t: F.Column | None = None
    t_cols: list[str] = []
    for step in steps:
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) >= prev_t)
        name = f"t_{step}"
        d = d.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_t = F.col(name)
        t_cols.append(name)
    # build shallow->deep so the DEEPEST completed step is the outermost
    # (first-evaluated) branch of the when-chain
    stage = F.lit(0)
    for i, name in enumerate(t_cols):
        stage = F.when(F.col(name).isNotNull(), F.lit(i + 1)).otherwise(stage)
    return (
        d.select(user_col, *t_cols).distinct()
        .withColumn("stage", stage)
        .orderBy(user_col)
    )


def range_join(left: DataFrame, right: DataFrame, key: str = "user_id",
               ts: str = "ts", start: str = "start", end: str = "end",
               bucket_seconds: int = 1800, prefix: str = "r_") -> DataFrame:
    """Interval (range) join: each left point row matched to every right
    interval row with the same key whose half-open [start, end) contains
    the point's ts. Spark has no native range join; the naive form —
    equi-join on key alone, then filter — materializes every point x
    every interval per key before filtering, which explodes on hot keys.

    Scalable form: time is chunked into fixed buckets. Each interval
    EXPLODES to the buckets it covers (one row when its length <= the
    bucket width), each point lands in exactly one bucket, the join runs
    on (key, bucket) — candidate volume is bounded by true matches plus
    one bucket of slack — and the exact predicate verifies. Pick
    bucket_seconds near the typical interval length: shorter buckets
    multiply interval rows, longer ones widen candidate slack.

    Bucket assignment is session-timezone-proof: a contained point's
    bucket always lies within its interval's covered bucket range
    (floor is monotone and both sides shift by the same epoch offset),
    so the verified output is identical for any tz. Empty or inverted
    intervals (end <= start) match nothing, consistent with the
    half-open contract (also keeps the bucket `sequence` ascending).
    Right payload columns are prefixed; output = left.* + prefixed
    start/end/payloads, one row per (point, interval) match.
    """
    w = bucket_seconds * 1_000_000
    um = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    pay = [c for c in right.columns if c not in (key, start, end)]
    lb = left.withColumn("__b", F.floor(um(ts) / F.lit(w)))
    rb = (
        right.filter(F.col(end) > F.col(start))
        .withColumn(
            "__b",
            F.explode(F.sequence(F.floor(um(start) / F.lit(w)),
                                 F.floor((um(end) - 1) / F.lit(w)))),
        )
        .select(
            F.col(key), "__b",
            F.col(start).alias(f"{prefix}{start}"),
            F.col(end).alias(f"{prefix}{end}"),
            *[F.col(c).alias(f"{prefix}{c}") for c in pay],
        )
    )
    return (
        lb.join(rb, [key, "__b"])
        .filter((F.col(ts) >= F.col(f"{prefix}{start}"))
                & (F.col(ts) < F.col(f"{prefix}{end}")))
        .drop("__b")
    )


def cohort_retention(events: DataFrame, key: str = "user_id",
                     ts: str = "ts", period: str = "week") -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event; for every (cohort, period offset), how many of that
    cohort's users were active. Output (cohort, offset, n_users) —
    offset 0 rows equal each cohort's size by construction.

    Two keyed aggregations and one join, all on the user key: per-user
    first-activity (one shuffle), distinct (user, period) activity (the
    same shuffle key), then a user-keyed join and a (cohort, offset)
    aggregate. offset is an exact integer: both sides are truncated to
    period boundaries, so the day difference is a whole multiple of the
    period length (Monday-start weeks in Spark and DuckDB alike — no
    timezone-dependent arithmetic in any output column).
    """
    days = {"week": 7, "day": 1}[period]
    per = lambda c: F.date_trunc(period, F.col(c))
    first = events.groupBy(key).agg(F.min(ts).alias("__first"))
    cohort = first.select(key, per("__first").alias("cohort"))
    active = events.select(key, per(ts).alias("__p")).distinct()
    return (
        active.join(cohort, key)
        .select(
            "cohort",
            (F.datediff(F.col("__p"), F.col("cohort")) / days)
            .cast("long").alias("offset"),
            F.col(key),
        )
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(key).alias("n_users"))
    )


def value_intervals(events: DataFrame, key: str = "user_id",
                    ts: str = "ts", value: str = "event_type",
                    order_tiebreak: str = "event_id") -> DataFrame:
    """SCD2-style interval collapse (gaps-and-islands): per key, fold
    consecutive events carrying the SAME value into one validity
    interval. Output (key, value, valid_from, valid_to, n_events):
    valid_from = the run's first event time, valid_to = the next run's
    start (NULL on the current/open run — the SCD2 convention), n_events
    = run length. The canonical "attribute history" builder for a
    slowly-changing dimension: feed it (entity, ts, attribute) rows,
    get versioned rows with half-open validity.

    Determinism: events are ordered by (ts, tiebreak) per key — the
    tiebreak column must be unique per key (event ids are), so run
    boundaries and every output value are pinned for any partitioning.

    Shuffle shape at 100 TB: ONE exchange on the key — the change-flag
    lag, the run-id cumulative sum, and the next-run lead all share the
    same (key)-partitioned sort, and Catalyst evaluates them in a
    single Window stage; the per-run aggregate re-keys by (key, run)
    which AQE plans as a local follow-up of the same partitioning
    (key is a prefix). No bare windows, no driver state.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(order_tiebreak))
    flagged = events.select(
        key, ts, value,
        F.when(
            F.lag(value).over(w).isNull()
            | (F.lag(value).over(w) != F.col(value)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("__chg"),
        F.col(order_tiebreak).alias("__tb"),
    ).withColumn(
        "__run",
        F.sum("__chg").over(
            Window.partitionBy(key)
            .orderBy(F.col(ts), F.col("__tb"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = (
        flagged.groupBy(key, "__run")
        .agg(
            F.first(value).alias(value),
            F.min(ts).alias("valid_from"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    w2 = Window.partitionBy(key).orderBy("__run")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(key, value, "valid_from", "valid_to", "n_events")
    )
