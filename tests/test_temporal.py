"""Temporal operators: as-of join and sessionization.

The reference has no temporal operators (SURVEY.md §2 C/I absent rows);
these are training-pipeline extensions.  Semantics pinned here:
inclusive vs strict as-of bounds, left-outer no-match NULLs, per-key
isolation, deterministic right-side tie-break, and the strict-gap
session boundary.
"""

from datetime import datetime

from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.temporal import (
    as_of_join,
    range_join,
    session_stats,
    sessionize,
    time_bucket,
)


def ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "L1"),
            (1, ts("2024-01-01 12:00:00"), "L2"),
            (2, ts("2024-01-01 09:00:00"), "L3"),  # before any right row
            (3, ts("2024-01-01 10:00:00"), "L4"),  # key with no right rows
        ],
        "k int, lts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30:00"), 100, 1.0),
            (1, ts("2024-01-01 10:00:00"), 101, 2.0),  # simultaneous with L1
            (1, ts("2024-01-01 11:00:00"), 102, 3.0),
            (2, ts("2024-01-01 09:30:00"), 103, 4.0),
        ],
        "k int, rts timestamp, rid int, rval double",
    )
    return left, right


def test_asof_inclusive_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r["lval"]: (r["rid"], r["rval"])
        for r in as_of_join(
            left, right, ["k"], "lts", "rts", ["rid", "rval"], right_tiebreak="rid"
        ).collect()
    }
    assert out["L1"] == (101, 2.0)  # rts == lts visible when inclusive
    assert out["L2"] == (102, 3.0)  # latest prior, not first
    assert out["L3"] == (None, None)  # no right row at or before
    assert out["L4"] == (None, None)  # key absent from right


def test_asof_strict_excludes_simultaneous(spark):
    left, right = _frames(spark)
    out = {
        r["lval"]: r["rid"]
        for r in as_of_join(
            left, right, ["k"], "lts", "rts", ["rid", "rval"], strict=True,
            right_tiebreak="rid",
        ).collect()
    }
    assert out["L1"] == 100  # 10:00 right row no longer visible
    assert out["L2"] == 102


def test_asof_right_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "L")], "k int, lts timestamp, lval string"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00:00"), 7, 1.0),
            (1, ts("2024-01-01 09:00:00"), 9, 2.0),  # same instant: max rid wins
        ],
        "k int, rts timestamp, rid int, rval double",
    )
    row = as_of_join(
        left, right, ["k"], "lts", "rts", ["rid"], right_tiebreak="rid"
    ).collect()[0]
    assert row["rid"] == 9


def test_sessionize_strict_gap_boundary(spark):
    # gap of exactly 60s does NOT split; 60s + 1µs does.
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1),
            (1, ts("2024-01-01 10:01:00"), 2),  # exactly 60s later
            (1, ts("2024-01-01 10:02:00.000001"), 3),  # 60s + 1µs later
            (2, ts("2024-01-01 10:00:00"), 4),  # other key isolated
        ],
        "user int, t timestamp, eid int",
    )
    s = sessionize(df, "user", "t", gap_seconds=60, tiebreak="eid")
    got = {r["eid"]: r["session_seq"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats_rollup(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1),
            (1, ts("2024-01-01 10:00:30"), 2),
            (1, ts("2024-01-01 11:00:00"), 3),
        ],
        "user int, t timestamp, eid int",
    )
    rows = (
        session_stats(df, "user", "t", gap_seconds=60, tiebreak="eid")
        .orderBy("user", "session_seq")
        .collect()
    )
    assert [(r["session_seq"], r["n_events"]) for r in rows] == [(1, 2), (2, 1)]
    assert rows[0]["session_start"] == ts("2024-01-01 10:00:00")
    assert rows[0]["session_end"] == ts("2024-01-01 10:00:30")


def test_range_join_half_open_bounds(spark):
    # interval [10:00, 11:00): point at 10:00 in, at 11:00 out; bucket
    # boundary crossings (10:59:59 in a later bucket than start) still
    # match because the interval explodes to both buckets.
    points = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "at-start"),
            (1, ts("2024-01-01 10:59:59"), "near-end"),
            (1, ts("2024-01-01 11:00:00"), "at-end"),
            (2, ts("2024-01-01 10:30:00"), "other-key"),
        ],
        "k int, pts timestamp, pname string",
    )
    intervals = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "I")],
        "k int, s timestamp, e timestamp, iname string",
    )
    got = sorted(
        r["pname"]
        for r in range_join(
            points, intervals, ["k"], "pts", "s", "e", bucket_seconds=3600
        ).collect()
    )
    assert got == ["at-start", "near-end"]


def test_range_join_matches_naive_inequality_join(spark, sf_dir):
    from dogsheep_beta_spark.sources.registry import register_testdata

    register_testdata(spark, sf_dir, tables=("events",))
    ev = spark.table("events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    bucketed = set(
        (r["error_id"], r["click_id"])
        for r in range_join(
            clicks, errors, ["user_id"], "ts", "start_ts", "end_ts", 600
        ).collect()
    )
    naive = set(
        (r["error_id"], r["click_id"])
        for r in errors.join(clicks, "user_id")
        .where((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .collect()
    )
    assert bucketed == naive and len(bucketed) > 0


def test_range_join_plan_no_nested_loop(spark):
    """The bucketing rewrite must keep the range join a hash equi-join —
    a BroadcastNestedLoopJoin/CartesianProduct here means the inequality
    leaked into the join strategy and the operator won't scale."""
    points = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1)], "k int, pts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"), 1)],
        "k int, s timestamp, e timestamp, iid int",
    )
    plan = (
        range_join(points, intervals, ["k"], "pts", "s", "e", 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_time_bucket_floor(spark):
    df = spark.createDataFrame(
        [(ts("2024-01-01 10:59:59.999999"),), (ts("2024-01-01 11:00:00"),)],
        "t timestamp",
    )
    got = [r[0] for r in df.select(time_bucket(F.col("t"), 3600)).collect()]
    assert got == [ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")]


def test_asof_plan_single_shuffle(spark):
    """The union+window formulation shuffles ONCE on the key — no
    join node at all in the physical plan."""
    left, right = _frames(spark)
    plan = (
        as_of_join(left, right, ["k"], "lts", "rts", ["rid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(k") == 1


def test_scd2_intervals_collapse_and_null_safety(spark):
    """Consecutive duplicates collapse, null→null is not a change, the
    first row always opens an interval, open intervals flag current."""
    from datetime import datetime

    from dogsheep_beta_spark.operators.temporal import scd2_intervals

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: a a b b a  →  a[0,2) b[2,4) a[4,∞)
        (1, t(0), "a", 1), (1, t(1), "a", 2), (1, t(2), "b", 3),
        (1, t(3), "b", 4), (1, t(4), "a", 5),
        # user 2: null null x null  →  null[0,2) x[2,3) null[3,∞)
        (2, t(0), None, 6), (2, t(1), None, 7), (2, t(2), "x", 8),
        (2, t(3), None, 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, attr string, event_id long"
    )
    got = [
        (r["user_id"], r["attr"], r["valid_from"].second,
         r["valid_to"].second if r["valid_to"] else None, r["is_current"])
        for r in scd2_intervals(
            df, "user_id", "ts", ["attr"], tie_break="event_id"
        ).orderBy("user_id", "valid_from").collect()
    ]
    assert got == [
        (1, "a", 0, 2, 0), (1, "b", 2, 4, 0), (1, "a", 4, None, 1),
        (2, None, 0, 2, 0), (2, "x", 2, 3, 0), (2, None, 3, None, 1),
    ]


def test_robust_outliers_median_mad(spark):
    from dogsheep_beta_spark.operators.temporal import robust_outliers

    # group a: values 1..9 (med 5, |dev| med 2) + one wild spike
    rows = [("a", i, float(i)) for i in range(1, 10)] + [("a", 99, 100.0)]
    # group b: constant values -> MAD 0 -> never flags, even the odd one out
    rows += [("b", i, 7.0) for i in range(5)] + [("b", 50, 7.5)]
    df = spark.createDataFrame(rows, "k string, event_id int, value double")
    out = robust_outliers(df, "k", "value", z_threshold=3.0).collect()
    flagged = {(r["k"], r["event_id"]) for r in out}
    assert flagged == {("a", 99)}
    z = [r["robust_z"] for r in out if r["event_id"] == 99][0]
    # med=5.5 over 10 values? exact: median of [1..9,100] = 5.5; MAD of
    # |v-5.5| = [4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,94.5] -> median 2.5
    assert abs(z - round(abs(100 - 5.5) / (1.4826 * 2.5), 6)) < 1e-9


def test_funnel_steps_strict_order_and_breaks(spark):
    from dogsheep_beta_spark.operators.temporal import funnel_steps

    rows = [
        # u1 completes in order
        (1, "view", 10.0), (1, "click", 20.0), (1, "purchase", 30.0),
        # u2: click BEFORE view -> funnel breaks at click
        (2, "click", 5.0), (2, "view", 10.0), (2, "purchase", 30.0),
        # u3: view only
        (3, "view", 1.0),
        # u4: never views (purchase alone doesn't count)
        (4, "purchase", 1.0),
        # u5: completes; earliest qualifying times picked, not earliest overall
        (5, "view", 10.0), (5, "click", 8.0), (5, "click", 12.0),
        (5, "purchase", 11.0), (5, "purchase", 15.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts double")
    out = {r["key"]: r for r in funnel_steps(df, "user_id", "event_type", "ts",
                                             ["view", "click", "purchase"]).collect()}
    assert out[1]["t3"] == 30.0
    # u2's only click (t=5) precedes the first view (t=10): broken funnel
    assert out[2]["t2"] is None and out[2]["t3"] is None
    assert out[3]["t2"] is None
    assert 4 not in out  # never entered the funnel
    assert (out[5]["t1"], out[5]["t2"], out[5]["t3"]) == (10.0, 12.0, 15.0)


def test_interval_join_no_duplicate_pairs_and_exact(spark):
    """Candidate generation across many shared buckets must yield each
    overlapping pair EXACTLY once (canonical-bucket claim), and match a
    brute-force inequality join."""
    from dogsheep_beta_spark.operators.temporal import interval_join

    W = 1_000  # tiny bucket width so intervals span many buckets
    a = spark.createDataFrame(
        [(1, 10, 0, 5_000), (1, 11, 4_000, 9_000), (2, 20, 0, 100)],
        "k int, aid int, s long, e long",
    )
    b = spark.createDataFrame(
        [(1, 100, 4_500, 4_600),   # inside both a-intervals
         (1, 101, 8_999, 20_000),  # overlaps only aid 11 at its edge
         (1, 102, 9_000, 9_100),   # touches end (half-open: no overlap)
         (2, 200, 100, 200),       # touches end of aid 20: no overlap
         (3, 300, 0, 10)],         # wrong key
        "k int, bid int, bs long, be long",
    )
    out = interval_join(a, b, ["k"], "s", "e", "bs", "be", bucket_width=W)
    pairs = sorted((r["aid"], r["bid"]) for r in out.collect())
    assert pairs == [(10, 100), (11, 100), (11, 101)]
    # exactly once each, despite interval 10 and window 100 sharing
    # multiple candidate buckets
    assert len(pairs) == len(set(pairs))


def test_decayed_score_half_life(spark):
    from dogsheep_beta_spark.operators.temporal import decayed_score

    # ref = max ts = t0 + 7d.  Event exactly one half-life old weighs
    # 0.5; an event AT the reference weighs 1.0.
    rows = [
        (1, ts("2024-01-01 00:00:00"), 10.0),   # 7 days before ref -> 5.0
        (1, ts("2024-01-08 00:00:00"), 4.0),    # at ref -> 4.0
        (2, ts("2024-01-04 12:00:00"), 8.0),    # half a half-life -> 8/sqrt(2)
    ]
    df = spark.createDataFrame(rows, "user int, t timestamp, value double")
    out = {r["user"]: r["decayed_score"]
           for r in decayed_score(df, "user", "t", "value", 7 * 86400).collect()}
    assert out[1] == 9.0
    assert abs(out[2] - round(8.0 / 2 ** 0.5, 6)) < 1e-9


def test_asof_tolerance_refuses_stale_match(spark):
    left, right = _frames(spark)
    out = as_of_join(
        left,
        right,
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        right_cols=["rid", "rval"],
        tolerance_seconds=3600,
    )
    rows = {r["lval"]: r for r in out.collect()}
    # L1 at 10:00 matches the simultaneous 10:00 row — staleness 0.
    assert rows["L1"]["rid"] == 101
    # L2 at 12:00: nearest prior is 11:00 → 3600 s old, within (<=) tol.
    assert rows["L2"]["rid"] == 102
    # with a tighter tolerance the same match is refused.
    tight = as_of_join(
        left,
        right,
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        right_cols=["rid", "rval"],
        tolerance_seconds=1800,
    )
    trows = {r["lval"]: r for r in tight.collect()}
    assert trows["L2"]["rid"] is None and trows["L2"]["rval"] is None
    # no-match rows stay NULL, never resurrected by the gate.
    assert trows["L3"]["rid"] is None and trows["L4"]["rid"] is None


def test_gap_fill_zero_and_locf(spark):
    from dogsheep_beta_spark.operators.temporal import gap_fill

    rollup = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:00:00"), 2, 1.5),
            ("a", ts("2024-01-01 03:00:00"), 1, 9.0),  # hours 1,2 missing
            ("b", ts("2024-01-01 01:00:00"), 5, 4.0),
        ],
        "key string, bucket timestamp, n long, gauge double",
    )
    dense = gap_fill(
        rollup,
        key_cols=["key"],
        bucket_col="bucket",
        bucket_seconds=3600,
        zero_cols=["n"],
        ffill_cols=["gauge"],
    ).orderBy("key", "bucket")
    rows = dense.collect()
    a = [r for r in rows if r["key"] == "a"]
    # spine covers every hour in [min, max] inclusive.
    assert [r["bucket"].hour for r in a] == [0, 1, 2, 3]
    assert [r["n"] for r in a] == [2, 0, 0, 1]
    # locf carries 1.5 across the gap, then the 03:00 observation wins.
    assert [r["gauge"] for r in a] == [1.5, 1.5, 1.5, 9.0]
    # single-bucket key: spine is just that bucket, untouched values.
    b = [r for r in rows if r["key"] == "b"]
    assert len(b) == 1 and b[0]["n"] == 5 and b[0]["gauge"] == 4.0


def test_rolling_time_agg_range_frame(spark):
    from dogsheep_beta_spark.operators.temporal import rolling_time_agg

    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1.0),
            (1, ts("2024-01-01 10:30:00"), 2.0),
            # exactly 1 h after the first row — RANGE bound is inclusive,
            # so the 10:00 row is still in frame here.
            (1, ts("2024-01-01 11:00:00"), 4.0),
            (1, ts("2024-01-01 12:01:00"), 8.0),  # everything expired
            (2, ts("2024-01-01 10:15:00"), 16.0),  # other key isolated
        ],
        "k int, t timestamp, v double",
    )
    out = rolling_time_agg(
        df, key_cols=["k"], ts_col="t", value_col="v", range_seconds=3600
    ).orderBy("k", "t")
    got = [(r["k"], r["n_window"], r["sum_window"]) for r in out.collect()]
    assert got == [
        (1, 1, 1.0),
        (1, 2, 3.0),
        (1, 3, 7.0),
        (1, 1, 8.0),
        (2, 1, 16.0),
    ]


def test_asof_null_right_ts_rows_never_match(spark):
    """A right row with NULL right_ts has no position on the time axis:
    it must neither donate values nor confuse the tolerance gate
    (ADVICE r4: such a row contributed right_cols via last(ignorenulls)
    while leaving _mts NULL)."""
    left = spark.createDataFrame(
        [("k", ts("2024-01-01 10:00:00"), "L1")],
        "k string, lts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [("k", None, 999, "GHOST"), ("k", ts("2024-01-01 09:00:00"), 1, "ok")],
        "k string, rts timestamp, rid long, rval string",
    )
    out = as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid", "rval"], tolerance_seconds=7200,
    ).collect()
    assert len(out) == 1 and out[0]["rid"] == 1 and out[0]["rval"] == "ok"
    # with ONLY the NULL-ts right row, nothing can ever match
    out2 = as_of_join(
        left,
        right.where(F.col("rts").isNull()),
        on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid", "rval"],
    ).collect()
    assert out2[0]["rid"] is None and out2[0]["rval"] is None


def test_gap_fill_misaligned_buckets_fail_loudly(spark):
    """Buckets not on the bucket_seconds grid used to silently drop the
    final rollup row (ADVICE r4); now the spine guard raises."""
    import pytest
    from dogsheep_beta_spark.operators.temporal import gap_fill

    rollup = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:00:00"), 1),
            ("a", ts("2024-01-01 02:30:00"), 2),  # off the 3600s grid
        ],
        "key string, bucket timestamp, n long",
    )
    dense = gap_fill(
        rollup, key_cols=["key"], bucket_col="bucket",
        bucket_seconds=3600, zero_cols=["n"],
    )
    with pytest.raises(Exception, match="not aligned"):
        dense.collect()


def test_as_of_join_null_right_col_comes_from_matched_row(spark):
    """The matched right ROW travels whole: a NULL in one right column
    of the most recent row must surface as NULL, never be backfilled
    from an older row (pandas/DuckDB ASOF semantics)."""
    from dogsheep_beta_spark.operators import temporal as tp

    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 10.0, 5),
         ("k", "2024-01-01 11:00:00", None, 7)],
        "k string, ts string, price double, qty int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = spark.createDataFrame(
        [("k", "2024-01-01 12:00:00")], "k string, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    out = tp.as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="ts",
        right_cols=["price", "qty"],
    ).collect()
    assert len(out) == 1
    assert out[0]["qty"] == 7 and out[0]["price"] is None  # same row
    # tolerance gate judges the MATCHED row's ts, not an older donor's
    out2 = tp.as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="ts",
        right_cols=["price", "qty"], tolerance_seconds=5400,
    ).collect()
    assert out2[0]["qty"] == 7 and out2[0]["price"] is None  # 1h old: fresh
    out3 = tp.as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="ts",
        right_cols=["price", "qty"], tolerance_seconds=1800,
    ).collect()
    assert out3[0]["qty"] is None and out3[0]["price"] is None  # stale


def test_as_of_join_string_tiebreak_is_deterministic(spark):
    """A non-numeric tiebreak column orders by its own type instead of
    silently casting to NULL (which made the winner nondeterministic)."""
    from dogsheep_beta_spark.operators import temporal as tp

    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", "a", 1),
         ("k", "2024-01-01 10:00:00", "b", 2)],
        "k string, ts string, rid string, val int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = spark.createDataFrame(
        [("k", "2024-01-01 11:00:00")], "k string, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    out = tp.as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="ts",
        right_cols=["val"], right_tiebreak="rid",
    ).collect()
    assert out[0]["val"] == 2  # highest tiebreak ('b') wins, every run
