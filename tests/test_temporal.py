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
