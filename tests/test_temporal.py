"""As-of join and sessionization (operators/temporal.py)."""

import datetime as dt

from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.operators import temporal


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_as_of_join_picks_most_recent_and_nulls_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(30)), (3, 200, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(8), 1.0), (100, _ts(29), 2.0), (100, _ts(31), 9.0),
         (300, _ts(1), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.matched_ts, r.matched_value)
        for r in temporal.as_of_join(left, right, on="user_id").collect()
    }
    assert out[1] == (_ts(8), 1.0)       # most recent <= ts, not the later one
    assert out[2] == (_ts(29), 2.0)      # skips the future row at :31
    assert out[3] == (None, None)        # user 200 has no right rows


def test_as_of_join_equal_ts_matches_and_tie_breaks(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts(10), 1.0, 7), (5, _ts(10), 2.0, 9)],
        "user_id long, ts timestamp, value double, rid long",
    )
    row = temporal.as_of_join(
        left, right, on="user_id", right_cols=("value", "rid"), tie_col="rid"
    ).first()
    # simultaneous right row matches (>=), highest tie_col wins
    assert row.matched_rid == 9 and row.matched_value == 2.0


def test_as_of_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts(0), 1.0)], "user_id long, ts timestamp, value double"
    )
    ok = temporal.as_of_join(left, right, on="user_id",
                             tolerance_seconds=600).first()
    assert ok.matched_value == 1.0  # exactly at the tolerance edge
    stale = temporal.as_of_join(left, right, on="user_id",
                                tolerance_seconds=599).first()
    assert stale.matched_value is None


def test_sessionize_gap_boundary(spark):
    # gaps: 100s (same session), exactly 300s (same — strictly-greater
    # splits), 301s (new session)
    ev = spark.createDataFrame(
        [(1, _ts(0, 0)), (2, _ts(1, 40)), (3, _ts(6, 40)), (4, _ts(11, 41))],
        "event_id long, ts timestamp",
    ).select(F.lit(7).alias("user_id"), "event_id", "ts")
    out = {
        r.event_id: r.session_id
        for r in temporal.sessionize(ev, gap_seconds=300).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0, 4: 1}


def test_session_stats(spark):
    ev = spark.createDataFrame(
        [(7, _ts(0)), (7, _ts(2)), (7, _ts(40)), (8, _ts(0))],
        "user_id long, ts timestamp",
    )
    rows = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in temporal.session_stats(ev, gap_seconds=600).collect()
    }
    assert rows[(7, 0)] == (2, _ts(0), _ts(2))
    assert rows[(7, 1)] == (1, _ts(40), _ts(40))
    assert rows[(8, 0)] == (1, _ts(0), _ts(0))


def test_salted_as_of_join_matches_base_on_skewed_keys(spark):
    """as_of_join_salted must be output-identical to as_of_join on a
    pathologically skewed input (one user owns ~95% of rows) — the
    carry path (matches crossing bucket boundaries), ties, and
    unmatched-left NULLs all exercised."""
    n = 2000
    left = spark.range(n).select(
        # 95% of rows on user 0 -> one hot window key in the base form
        F.when(F.col("id") % 20 < 19, 0).otherwise(F.col("id") % 7).alias("user_id"),
        F.col("id").alias("event_id"),
        # one event every ~97s -> spans many 3600s buckets
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id*97)").alias("ts"),
    )
    right = spark.range(0, n, 3).select(
        F.when(F.col("id") % 20 < 19, 0).otherwise(F.col("id") % 7).alias("user_id"),
        F.col("id").alias("view_id"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id*101)").alias("ts"),
        (F.col("id") * 2).cast("double").alias("value"),
    )
    kw = dict(on="user_id", ts="ts", right_cols=("value", "view_id"), tie_col="view_id")
    base = temporal.as_of_join(left, right, **kw)
    salted = temporal.as_of_join_salted(
        left, right, bucket_width_seconds=3600, **kw
    )
    key = lambda r: (r.user_id, r.event_id)  # noqa: E731
    b = {key(r): (r.matched_ts, r.matched_view_id, r.matched_value) for r in base.collect()}
    s = {key(r): (r.matched_ts, r.matched_view_id, r.matched_value) for r in salted.collect()}
    assert s == b

    # skew evidence: the base form serializes the hot user in ONE window
    # partition (~1900 rows); the salted form's largest single window
    # partition (the task-serialized unit) is a small fraction of that.
    bucket = F.floor(F.unix_timestamp("ts") / F.lit(3600))
    sizes = (
        left.unionByName(
            right.select("user_id", F.col("view_id").alias("event_id"), "ts"),
            allowMissingColumns=False,
        )
        .groupBy("user_id", bucket.alias("b"))
        .count()
        .agg(F.max("count").alias("mx"))
        .first()
    )
    hot_total = left.filter(F.col("user_id") == 0).count() + right.filter(
        F.col("user_id") == 0
    ).count()
    assert sizes.mx < hot_total / 10


def test_salted_as_of_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 2, dt.datetime(2024, 1, 1, 2, 0, 0))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 5.0)], "user_id long, ts timestamp, value double"
    )
    out = {
        r.event_id: r.matched_value
        for r in temporal.as_of_join_salted(
            left, right, on="user_id", ts="ts", right_cols=("value",),
            tolerance_seconds=600, bucket_width_seconds=3600,
        ).collect()
    }
    assert out[1] == 5.0
    assert out[2] is None  # match exists but is older than tolerance


# -- interval_join --------------------------------------------------------------

from nolock_social_ocr_services_spark.operators.temporal import interval_join


def _iv_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, start long, end long"
    )


def _brute_pairs(left, right):
    """Reference: nested-loop overlap join on half-open intervals."""
    out = set()
    for lk, li, ls, le in left:
        for rk, ri, rs, re in right:
            if lk == rk and le > ls and re > rs and ls < re and rs < le:
                out.add((lk, li, ri))
    return out


def _got_pairs(df):
    return {(r.user_id, r.l_event_id, r.r_event_id) for r in df.collect()}


def test_interval_join_golden_small_buckets(spark):
    # bucket_width=4 forces multi-bucket intervals; pairs sharing
    # several buckets must still be emitted exactly once
    left = [(1, 10, 0, 10), (1, 11, 20, 30), (2, 12, 0, 10)]
    right = [
        (1, 20, 5, 25),   # overlaps BOTH left-1 intervals, many buckets
        (1, 21, 10, 20),  # touches 10 and 20: half-open -> matches NEITHER
        (2, 22, 9, 12),   # overlaps key-2 only
        (1, 23, 100, 104),
    ]
    out = interval_join(
        _iv_df(spark, left), _iv_df(spark, right), on="user_id",
        bucket_width=4,
    )
    rows = out.collect()
    assert _got_pairs(out) == _brute_pairs(left, right) == {
        (1, 10, 20), (1, 11, 20), (2, 12, 22),
    }
    assert len(rows) == 3  # once per pair, no bucket duplicates


def test_interval_join_empty_intervals_never_match(spark):
    # an empty interval strictly inside a long one satisfies the bare
    # predicate but must not match
    left = [(1, 1, 0, 100)]
    right = [(1, 2, 50, 50), (1, 3, 60, 40)]
    out = interval_join(
        _iv_df(spark, left), _iv_df(spark, right), on="user_id",
        bucket_width=16,
    )
    assert out.count() == 0


def test_interval_join_matches_brute_force_randomized(spark):
    import random

    rng = random.Random(7)
    left = [
        (rng.randrange(4), 100 + i, s, s + rng.randrange(0, 40))
        for i, s in enumerate(rng.randrange(0, 300) for _ in range(60))
    ]
    right = [
        (rng.randrange(4), 200 + i, s, s + rng.randrange(0, 40))
        for i, s in enumerate(rng.randrange(0, 300) for _ in range(60))
    ]
    for width in (7, 64, 1024):
        out = interval_join(
            _iv_df(spark, left), _iv_df(spark, right), on="user_id",
            bucket_width=width,
        )
        rows = out.collect()
        assert _got_pairs(out) == _brute_pairs(left, right)
        assert len(rows) == len(set(rows))


def test_interval_join_carries_and_prefixes_columns(spark):
    out = interval_join(
        _iv_df(spark, [(1, 1, 0, 10)]),
        _iv_df(spark, [(1, 2, 5, 15)]),
        on="user_id",
    )
    assert set(out.columns) == {
        "user_id",
        "l_event_id", "l_start", "l_end",
        "r_event_id", "r_start", "r_end",
    }
    r = out.collect()[0]
    assert (r.l_start, r.l_end, r.r_start, r.r_end) == (0, 10, 5, 15)
