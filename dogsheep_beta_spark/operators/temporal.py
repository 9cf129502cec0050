"""Temporal operators — as-of join and gap-based sessionization
(training-data-pipeline extensions; the reference is strictly batch
relational with no temporal operators, SURVEY.md §2 C/I "absent" rows).

Both are expressed Spark-first:

- ``as_of_join``: the classic scalable formulation — tag both inputs,
  UNION them, and resolve the match with ``last(..., ignorenulls=True)``
  over a (key, time)-ordered window.  ONE shuffle on the join key,
  O(n log n) within each key partition.  The naive alternative
  (equi-join on key + ts-inequality filter + row_number) materializes
  every (left, right) pairing per key before pruning — O(n·m) per key,
  which is exactly what dies at 100 TB on dense keys.
- ``sessionize``: lag-gap flag + running sum over the same window
  shape.  Again one shuffle on the key; the per-key state is a single
  cumulative counter, so whole-stage codegen keeps it tight.

Skewed keys (one user with 10^8 events) are the scale risk for both;
AQE skew handling splits the straggler partitions, and callers can
pre-salt with ``operators.skew`` if a single key exceeds executor
memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the most recent
    right row with ``right_ts <= left_ts`` (``<`` when ``strict``),
    matching on ``on``.  Left rows with no prior right row keep NULLs
    (left-outer as-of semantics, like DuckDB/pandas ASOF LEFT JOIN).

    ``right_tiebreak``: a right column ordering simultaneous right rows
    so the surviving match is deterministic (highest wins).  Ordered by
    the column's OWN type — a string/uuid tiebreak orders
    lexicographically instead of silently casting to NULL.

    ``tolerance_seconds``: maximum staleness (pandas ``merge_asof
    tolerance=``): a match older than ``left_ts - tolerance`` is
    discarded — the right slots revert to NULL, exactly as if no prior
    row existed.  Feature pipelines use this to refuse stale features
    (a 3-day-old price is worse than no price).

    The matched right row travels as ONE struct through a single
    last(ignorenulls) window, so all ``right_cols`` (and the staleness
    timestamp) come from the SAME most-recent right row — per-column
    carries would stitch values from different rows whenever the most
    recent row holds a NULL in one column (pandas/DuckDB ASOF return
    that row's NULL, not an older row's value).  Zero extra shuffles.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    rrow_t = T.StructType(
        [T.StructField("_mts", T.LongType())]
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    rtb_t = (
        right.schema[right_tiebreak].dataType if right_tiebreak else T.IntegerType()
    )
    # left rows carry their payload + a NULL matched-row struct; right
    # rows the inverse.  _side orders ties at equal ts: inclusive →
    # right first (visible to the left row), strict → left first.
    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtb_t).alias("_rtb"),
        F.lit(None).cast(rrow_t).alias("_rrow"),
        *[F.col(c) for c in lcols if c not in on],
    )
    rtb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    # a right row with NULL right_ts can never be a valid as-of match
    # (it has no position on the time axis) — dropped up front, so the
    # carried values and the tolerance gate can never disagree.
    rt = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rtb.alias("_rtb"),
        F.struct(
            F.unix_micros(F.col(right_ts)).alias("_mts"),
            *[F.col(c) for c in right_cols],
        ).alias("_rrow"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on
        ],
    )
    side_order = F.desc("_side") if strict else F.asc("_side")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_ts"), side_order, F.asc_nulls_first("_rtb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn(
        "_m", F.last("_rrow", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        # staleness gate on the matched ROW's own timestamp — a pure
        # post-window CASE, no extra pass.
        stale = (
            F.unix_micros(F.col("_ts")) - F.col("_m._mts")
            > tolerance_seconds * 1_000_000
        )
        merged = merged.withColumn(
            "_m", F.when(stale, F.lit(None).cast(rrow_t)).otherwise(F.col("_m"))
        )
    return merged.where(F.col("_side") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[c for c in lcols if c not in on and c != left_ts],
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key ``session_seq`` (1-based) that increments when
    the gap to the previous event STRICTLY exceeds ``gap_seconds``.

    Gap arithmetic is in microseconds (``unix_micros`` ≡ DuckDB
    ``epoch_us``) so sub-second timestamps never alias.
    """
    order = [F.asc(ts_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        F.when(
            prev.isNull()
            | (
                F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
                > gap_seconds * 1_000_000
            ),
            1,
        )
        .otherwise(0)
    )
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def time_bucket(ts_col, bucket_seconds: int):
    """Fixed-width time bucket (the hypertable-rollup bucketing unit):
    floor the µs epoch to the bucket width, back to a timestamp.
    Equivalent to DuckDB ``time_bucket(INTERVAL, ts)`` for widths that
    divide a day.  ``floor`` (not a truncating cast) so pre-1970
    timestamps — negative epochs — bucket downward exactly like DuckDB,
    instead of rounding toward zero."""
    width = bucket_seconds * 1_000_000
    return F.timestamp_micros(
        F.floor(F.unix_micros(ts_col) / width).cast("long") * width
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval range join with half-open bounds
    ``start <= point < end``.

    Spark has no native range join; the naive formulation (equi-join on
    key + ts-inequality predicates) degenerates to a per-key nested
    loop.  Instead both sides are mapped onto fixed-width time buckets
    — each point to ONE bucket, each interval to the ≤⌈len/width⌉+1
    buckets it overlaps (an explode of a tiny integer sequence) — the
    join becomes an equi-join on (keys…, bucket) that hashes and
    shuffles like any other, and the exact inequality refines the
    candidates.  Bucket width should be on the order of the interval
    length: shorter → more interval replicas, longer → more false
    candidates per bucket.

    Returns all (interval × matching point) rows with both sides'
    columns (interval columns first).
    """
    # floor (not truncating cast): negative epochs bucket downward like
    # time_bucket/interval_join, so no double-width bucket at epoch 0.
    width = bucket_seconds * 1_000_000
    pb = points.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(point_ts)) / width).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / width).cast("long"),
                # half-open end: the bucket of (end - 1µs); guard
                # degenerate (empty) intervals to a single bucket
                F.greatest(
                    F.floor((F.unix_micros(F.col(end_ts)) - 1) / width).cast("long"),
                    F.floor(F.unix_micros(F.col(start_ts)) / width).cast("long"),
                ),
            )
        ),
    )
    joined = ib.join(pb, keys + ["_bucket"]).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bucket")


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: (key, session_seq, n_events, session_start,
    session_end).  One extra shuffle on (key, session_seq) after the
    sessionize window — partial aggregation applies."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log.

    Collapses consecutive rows whose ``attr_cols`` are unchanged, then
    assigns each surviving change a validity interval:
    ``valid_from`` = its timestamp, ``valid_to`` = the NEXT change's
    timestamp (null = current row, flagged ``is_current``).  The
    standard lakehouse dimension-history build (MERGE-based SCD2
    replayed as one declarative pass).

    Shape: two windows over the same (key, ts, tie_break) partitioning
    — change capture via lag, interval close via lead — so the whole
    operator is ONE shuffle on the key.  Per-key state is a single
    previous-row comparison; skewed keys split under AQE like the
    other temporal windows.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_break).asc()] if tie_break else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prevs = [F.lag(c).over(w).alias(f"__prev_{c}") for c in attr_cols]
    # first row per key always opens an interval; later rows only when
    # some attribute differs null-safely (null→null is NOT a change).
    # Window expressions are materialized as columns first — Spark
    # rejects them directly inside a filter.
    keep = [key_col, ts_col, *attr_cols] + ([tie_break] if tie_break else [])
    tagged = df.select(
        *keep, *prevs, F.lag(F.col(ts_col)).over(w).alias("__prev_ts")
    )
    changed = F.col("__prev_ts").isNull()
    for c in attr_cols:
        changed = changed | ~F.col(f"__prev_{c}").eqNullSafe(F.col(c))
    changes = tagged.filter(changed)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .select(key_col, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value is a robust outlier within its key group:
    |v − median| > z · 1.4826 · MAD — the median/MAD z-score that a
    telemetry or metrics pipeline runs instead of mean/stddev (one bad
    sensor spike corrupts a mean; the median shrugs it off).

    Plan: two grouped EXACT percentile aggregations (median, then
    median absolute deviation) — each a partial-aggregated shuffle on
    the key, joined back map-side.  The MAD aggregation CARRIES the
    median through (``first(__med)`` — constant within the group), so
    the per-row scoring needs one broadcast stats join, not two, and
    the median subtree is never evaluated twice.  At 100 TB swap
    ``percentile`` for ``percentile_approx`` per group, same shape.
    Groups with MAD = 0 (over half the values identical) flag nothing:
    a degenerate scale estimate must not turn every tie-breaking row
    into an "outlier".

    Adds ``robust_z`` (rounded 6dp) to the surviving rows."""
    med = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    stats = (
        df.join(F.broadcast(med), key_col)
        .groupBy(key_col)
        .agg(
            F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad"),
            F.first("__med").alias("__med"),
        )
    )
    scored = df.join(F.broadcast(stats), key_col).withColumn(
        "robust_z",
        F.round(
            F.abs(F.col(value_col) - F.col("__med"))
            / (F.lit(1.4826) * F.col("__mad")),
            6,
        ),
    )
    return (
        scored.where(
            (F.col("__mad") > 0) & (F.col("robust_z") > F.lit(z_threshold))
        )
        .drop("__med", "__mad")
    )


def funnel_steps(
    df: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """(key, t1..tn): earliest strictly-ordered completion time of each
    funnel stage per key — t_i is the first ``steps[i]`` event AFTER
    t_{i-1}, NULL from the first broken stage on.  The classic product
    funnel (view → click → purchase) as pure relational algebra.

    Plan: one filtered min-aggregate per stage (n-1 equi-joins on the
    key, each bounded by survivors of the previous stage — the funnel
    SHRINKS monotonically, so later stages join ever-smaller sets).
    Each stage is a partial-aggregated shuffle on the key; no windows,
    no per-key state, no event-order assumptions."""
    if not steps:
        raise ValueError("steps must be non-empty")
    out = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        ev = df.select(
            F.col(key_col).alias("key"),
            F.col(type_col).alias("__ty"),
            F.col(ts_col).alias("__ts"),
        ).where(F.col("__ty") == step)
        nxt = (
            ev.join(out.select("key", f"t{i - 1}"), "key")
            .where(F.col("__ts") > F.col(f"t{i - 1}"))
            .groupBy("key")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        out = out.join(nxt, "key", "left")
    return out


def interval_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Interval-overlap join (half-open: a.start < b.end AND
    b.start < a.end) — the interval×interval sibling of ``range_join``.

    Both sides explode onto fixed-width buckets; the equi-join on
    (keys…, bucket) generates candidates that hash-shuffle like any
    join.  A pair overlapping several shared buckets would match
    repeatedly, so the join CLAIMS exactly one canonical bucket — the
    later of the two start buckets — instead of deduplicating with a
    distinct (which would re-shuffle the whole candidate set).  Bounds
    are BIGINT epoch-µs columns, so bucket math is integer arithmetic
    in whole-stage codegen.

    Returns candidates refined by the exact overlap predicate, both
    sides' columns (a's first)."""
    def buckets(df, s, e):
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_width),
                    # half-open end: bucket of (end - 1); degenerate
                    # (empty) intervals still land in their start bucket
                    F.greatest(
                        F.floor((F.col(e) - 1) / bucket_width),
                        F.floor(F.col(s) / bucket_width),
                    ),
                )
            ),
        )

    ab = buckets(a, a_start, a_end)
    bb = buckets(b, b_start, b_end).withColumnRenamed("_bucket", "_bucket_b")
    canonical = F.greatest(
        F.floor(F.col(a_start) / bucket_width),
        F.floor(F.col(b_start) / bucket_width),
    )
    cond = [ab[k] == bb[k] for k in keys]
    cond.append(ab["_bucket"] == bb["_bucket_b"])
    return (
        ab.join(bb, cond)
        .where(
            (F.col(a_start) < F.col(b_end))
            & (F.col(b_start) < F.col(a_end))
            & (F.col("_bucket") == canonical)
        )
        .drop("_bucket", "_bucket_b")
        .drop(*[bb[k] for k in keys])
    )


def decayed_score(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
) -> DataFrame:
    """(key, decayed_score): exponentially time-decayed value sum —
    recency-weighted engagement with a half-life, the freshness prior
    recommendation/data-mixing pipelines apply to interaction counts.

    score(key) = Σ v_i · 2^(−(t_ref − t_i)/half_life), with t_ref the
    corpus max timestamp — data-derived, so the result is a pure
    function of the table (reproducible, oracle-checkable; a wall-clock
    t_ref would not be).  The reference instant enters as a broadcast
    1-row aggregate; the decay weight is a map-side codegen expression;
    the sum is one partial-aggregated shuffle on the key.  O(n), no
    windows — the recurrence form (ewma·α + v) needs ordered state,
    this closed form doesn't."""
    ref = df.agg(F.max(ts_col).alias("__ref"))
    hl_us = float(half_life_seconds) * 1_000_000.0
    weight = F.pow(
        F.lit(2.0),
        -(F.unix_micros(F.col("__ref")) - F.unix_micros(F.col(ts_col)))
        / F.lit(hl_us),
    )
    return (
        df.crossJoin(F.broadcast(ref))
        .groupBy(key_col)
        .agg(F.round(F.sum(F.col(value_col) * weight), 6).alias("decayed_score"))
    )


def gap_fill(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    bucket_seconds: int,
    zero_cols: list[str] | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Densify a time-bucket rollup: emit one row for EVERY bucket in
    each key's [min, max] bucket span, not just buckets that had data —
    the hypertable ``time_bucket_gapfill`` / Timescale ``locf`` analog
    (the reference's timeline UI simply skips empty days; a training
    curriculum or rate monitor can't).

    ``zero_cols`` fill missing buckets with 0 (counts/sums);
    ``ffill_cols`` carry the last observed value forward (gauges), NULL
    before the first observation.

    Scale shape — no join at all, the as_of_join union+window device:
    the dense spine (per-key ``sequence(min, max, step)`` + map-side
    ``explode``; one partial-aggregated shuffle for the span) is
    UNIONed under the rollup rows, and one key-partitioned window pass
    resolves both fills — per-bucket values via a RANGE(0,0) frame
    over the bucket epoch (exactly the same-bucket rows), locf via
    last-ignorenulls over the cumulative frame.  Two hash exchanges
    total (span agg + window), vs four for the naive spine⋈rollup
    formulation, and nothing is ever wider than the densified result.
    A key whose span is pathologically long (one event in 1970, one
    today) makes its own spine huge — that's inherent to the ask; cap
    spans upstream if it bites.
    """
    zero_cols = zero_cols or []
    ffill_cols = ffill_cols or []
    val_cols = [
        c for c in rollup.columns if c not in (*key_cols, bucket_col)
    ]
    step = F.lit(bucket_seconds * 1_000_000).cast("long")
    us_b = F.unix_micros(F.col(bucket_col))
    # Misaligned input must FAIL, not lose data: if the observed
    # buckets don't all share one residue mod step, the spine misses
    # them (the max bucket would silently drop at the closing filter).
    # The residue check rides the same single-pass per-key aggregate as
    # min/max bounds (min residue == max residue ⟺ one residue — a
    # count_distinct would add a whole extra Exchange); the guard is
    # folded into __lo so column pruning can never skip it.
    lo_checked = F.when(F.col("__rlo") == F.col("__rhi"), F.col("__lo")).otherwise(
        F.raise_error(
            F.lit(
                "gap_fill: bucket values are not aligned to "
                "bucket_seconds — rollup with the same width you fill"
            )
        ).cast("long")
    )
    spine = (
        rollup.groupBy(*key_cols)
        .agg(
            F.min(us_b).alias("__lo"),
            F.max(us_b).alias("__hi"),
            F.min(F.pmod(us_b, step)).alias("__rlo"),
            F.max(F.pmod(us_b, step)).alias("__rhi"),
        )
        .select(
            *key_cols,
            F.explode(
                F.sequence(lo_checked, F.col("__hi"), step)
            ).alias("__us"),
        )
        .select(
            *key_cols,
            F.timestamp_micros(F.col("__us")).alias(bucket_col),
            F.lit(1).alias("__spine"),
            *[
                F.lit(None).cast(rollup.schema[c].dataType).alias(c)
                for c in val_cols
            ],
        )
    )
    tagged = rollup.select(
        *key_cols, bucket_col, F.lit(0).alias("__spine"), *val_cols
    )
    merged = spine.unionByName(tagged)
    us = F.unix_micros(F.col(bucket_col))
    # same-bucket frame: RANGE (0,0) over the bucket epoch pairs every
    # spine row with its bucket's (≤1) rollup row — an equi-join's
    # worth of work inside the window, no Exchange for it.
    w_bucket = Window.partitionBy(*key_cols).orderBy(us).rangeBetween(0, 0)
    w_ffill = (
        Window.partitionBy(*key_cols)
        .orderBy(us, F.col("__spine"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged
    for c in val_cols:
        if c in ffill_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w_ffill))
        else:
            filled = F.max(c).over(w_bucket)
            if c in zero_cols:
                filled = F.coalesce(filled, F.lit(0))
            out = out.withColumn(c, filled)
    return out.where(F.col("__spine") == 1).drop("__spine")


def rolling_time_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    range_seconds: int,
) -> DataFrame:
    """Trailing time-RANGE window aggregates: for each row, the
    count and sum of ``value_col`` over the last ``range_seconds`` of
    the same key — the moving-average / rate-limiter primitive
    (``RANGE BETWEEN INTERVAL x PRECEDING AND CURRENT ROW``).  Raw
    aggregates, no rounding: callers pick the presentation (and a
    DECIMAL value column makes the sum exact — float association
    order differs between engines' frame algorithms).

    Spark's ``rangeBetween`` frames need a numeric ordering, so the
    frames run over ``unix_micros(ts)`` — exact microsecond semantics,
    identical to the ANSI interval frame.  Rows at the same microsecond
    share a frame (RANGE, not ROWS — deterministic under ties, unlike a
    ROWS frame over a non-unique ordering).

    NOT the naive sliding frame: Spark evaluates a bounded-both-ends
    RANGE frame by rescanning the frame buffer per row — O(rows ×
    frame width), quadratic on dense keys (measured 11× DuckDB's
    segment tree at sf0.1).  Frames whose start is UNBOUNDED and whose
    end only advances are evaluated INCREMENTALLY (each row is added
    once, never rescanned), so the trailing window is computed as the
    difference of two cumulative frames:

        sum[t-r, t]  =  sum(-inf, t]  -  sum(-inf, t-r)

    (integer µs: the subtracted frame ends at ``-(r·10⁶+1)``, i.e.
    strictly before the inclusive window start).  Subtraction is only
    exact when the sum is — another reason the value column should be
    DECIMAL.  Both frames share one partition ordering: one shuffle,
    one sort, O(n) total."""
    us = F.unix_micros(F.col(ts_col))
    wb = Window.partitionBy(*key_cols).orderBy(us)
    w_all = wb.rangeBetween(Window.unboundedPreceding, 0)
    w_before = wb.rangeBetween(
        Window.unboundedPreceding, -(range_seconds * 1_000_000 + 1)
    )
    zero = F.lit(0).cast(df.schema[value_col].dataType)
    return df.select(
        *key_cols,
        F.col(ts_col),
        F.col(value_col),
        (
            F.count(F.lit(1)).over(w_all) - F.count(F.lit(1)).over(w_before)
        ).alias("n_window"),
        (
            F.sum(value_col).over(w_all)
            - F.coalesce(F.sum(value_col).over(w_before), zero)
        ).alias("sum_window"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset_days: int = 7,
    cache_registry: list | None = None,
) -> DataFrame:
    """(cohort_day, day_offset, n_active_users, cohort_size,
    retention_permille) — the classic COHORT RETENTION matrix: users
    grouped by the calendar day of their first event, and for each day
    offset 0..``max_offset_days`` the count still active on that day.
    ``retention_permille`` = ⌊1000·n_active/cohort_size⌋ — integer
    exact, so the matrix strict-hashes cross-engine.

    Scale shape (the event table is the 100 TB side here; the raw
    table is scanned ONCE):

    1. daily activity: (user, day) aggregate — partial map-side dedup
       collapses a user's same-day events before the one exchange
       keyed on the raw event stream, and the deduped set PERSISTS
       (users × active-days rows, orders of magnitude below the event
       count) so the raw table is scanned exactly ONCE.  Exchange
       reuse cannot deliver this here: Catalyst correctly collapses
       the stacked aggregates (MIN-per-user folds straight onto the
       raw scan, cohort sizes re-derive from scratch), which an
       .explain of the unpersisted form shows as THREE parquet legs —
       the cache is the scan-once guarantee, not an optimizer hope;
    2. cohort assignment (MIN day per user) and cohort sizes are both
       aggregates OF the cached activity set;
    3. offsets filter BEFORE the matrix aggregate (rows beyond the
       window never shuffle), then a (cohort_day, offset) aggregate —
       output rows = days × offsets, corpus-size-independent;
    4. cohort_size joins back BROADCAST (days-sized dimension), so the
       permille divide is map-side.

    ``cache_registry`` follows the library-wide contract: pass a list
    to own the persisted intermediate's lifecycle
    (``__spark_entry__.teardown`` unpersists registered caches);
    without it the cache lives until the session ends.

    Every offset-0 row equals its own cohort_size by construction —
    retained as an internal consistency check for tests."""
    day = F.to_date(F.col(ts_col))
    ev = df.select(F.col(user_col).alias("uid"), day.alias("day"))
    active = (
        ev.groupBy("uid", "day")
        .agg(F.count(F.lit(1)).alias("__c"))
        .drop("__c")
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(active)
    cohort = active.groupBy("uid").agg(F.min("day").alias("cohort_day"))
    mat = (
        active.join(cohort, "uid")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active_users"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return mat.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_active_users",
        "cohort_size",
        F.floor(
            F.col("n_active_users") * F.lit(1000) / F.col("cohort_size")
        ).cast("long").alias("retention_permille"),
    )
