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


def test_gapfill_locf_golden(spark):
    """Hand-computed: per-user grid spans [min,max] buckets, gaps carry
    the last observation forward, in-bucket winner is latest (ts, tie),
    and users never leak into each other's grids."""
    from nolock_social_ocr_services_spark.operators.temporal import (
        gapfill_locf,
    )

    rows = [
        # user 1: buckets 0, 3 observed (bucket_s=10) -> 1, 2 filled
        (0, "2024-01-01 00:00:01", 1, "e", 1.00, None),
        (1, "2024-01-01 00:00:05", 1, "e", 2.00, None),  # same bucket, later wins
        (2, "2024-01-01 00:00:35", 1, "e", 9.00, None),
        # user 2: single bucket
        (3, "2024-01-01 00:00:12", 2, "e", 5.00, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    base = 1704067200  # 2024-01-01 epoch
    out = {
        (r.user_id, r.bucket_start): (r.v_cents, r.filled)
        for r in gapfill_locf(ev, bucket_s=10).collect()
    }
    assert out[(1, base + 0)] == (200, False)   # later obs in bucket wins
    assert out[(1, base + 10)] == (200, True)   # gap: carried forward
    assert out[(1, base + 20)] == (200, True)
    assert out[(1, base + 30)] == (900, False)
    assert out[(2, base + 10)] == (500, False)
    assert len(out) == 5  # no rows outside each user's span


def test_gapfill_locf_matches_pandas(spark):
    """Parity with a pandas reference (bucket -> last obs -> reindex ->
    ffill) on random data with real gaps."""
    import numpy as np
    import pandas as pd

    from nolock_social_ocr_services_spark.operators.temporal import (
        gapfill_locf,
    )

    rng = np.random.default_rng(17)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 3_000_000, n), unit="s"),
            "user_id": rng.integers(0, 7, n),
            "event_type": "e",
            "value": np.round(rng.uniform(0, 100, n), 2),
            "props": "",
        }
    )
    ev = spark.createDataFrame(pdf)
    got = {
        (r.user_id, r.bucket_start): (r.v_cents, r.filled)
        for r in gapfill_locf(ev, bucket_s=21600).collect()
    }
    want = {}
    pdf["b"] = (pdf.ts.astype("int64") // 10**9) // 21600
    pdf["cents"] = (pdf.value * 100).round().astype("int64")
    for uid, g in pdf.groupby("user_id"):
        last = (
            g.sort_values(["ts", "event_id"]).groupby("b")["cents"].last()
        )
        grid = pd.RangeIndex(last.index.min(), last.index.max() + 1)
        re = last.reindex(grid)
        filled = re.isna()
        re = re.ffill()
        for b, v, f in zip(grid, re, filled):
            want[(uid, b * 21600)] = (int(v), bool(f))
    assert got == want and len(want) > n  # grid larger than events


def test_scd2_apply_golden(spark):
    """Kimball chain: open version closes at the first REAL change,
    consecutive no-change updates collapse, multiple changes chain,
    history rows pass through untouched, and a NULL attribute value
    counts as a change in both directions."""
    from nolock_social_ocr_services_spark.operators.temporal import (
        scd2_apply,
    )

    current = spark.createDataFrame(
        [
            # k=1: one closed history row + open version 'a'
            (1, "old", _ts(0), _ts(1)),
            (1, "a", _ts(1), None),
            # k=2: open version 'x', no updates arrive
            (2, "x", _ts(0), None),
            # k=3: open 'p', update chain p -> NULL -> p
            (3, "p", _ts(0), None),
        ],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [
            (1, "a", _ts(2)),   # no change: collapsed
            (1, "b", _ts(3)),   # change: closes 'a'
            (1, "b", _ts(4)),   # no change again
            (3, None, _ts(5)),  # change to NULL
            (3, "p", _ts(6)),   # change back from NULL
        ],
        "k long, seg string, ts timestamp",
    )
    out = scd2_apply(current, updates, key="k", attrs=["seg"], ts="ts")
    rows = {(r.k, r.valid_from): (r.seg, r.valid_to) for r in out.collect()}
    assert rows[(1, _ts(0))] == ("old", _ts(1))       # history untouched
    assert rows[(1, _ts(1))] == ("a", _ts(3))         # closed at change
    assert rows[(1, _ts(3))] == ("b", None)           # new open version
    assert rows[(2, _ts(0))] == ("x", None)           # untouched open
    assert rows[(3, _ts(0))] == ("p", _ts(5))
    assert rows[(3, _ts(5))] == (None, _ts(6))        # NULL is a change
    assert rows[(3, _ts(6))] == ("p", None)
    assert len(rows) == 7


def test_scd2_point_in_time_lookup_consistent(spark):
    """Every (key, instant) resolves to at most one version, and the
    chain tiles the key's span with no overlaps or holes."""
    from nolock_social_ocr_services_spark.operators.temporal import (
        scd2_apply,
    )

    current = spark.createDataFrame(
        [(1, "a", _ts(0), None)],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [(1, "b", _ts(2)), (1, "c", _ts(4)), (1, "b", _ts(6))],
        "k long, seg string, ts timestamp",
    )
    out = scd2_apply(current, updates, key="k", attrs=["seg"], ts="ts")
    vs = sorted(out.collect(), key=lambda r: r.valid_from)
    for a, b in zip(vs, vs[1:]):
        assert a.valid_to == b.valid_from  # tiled, no gap/overlap
    assert vs[-1].valid_to is None
    for m, want in [(1, "a"), (3, "b"), (5, "c"), (7, "b")]:
        hits = [
            r.seg for r in vs
            if r.valid_from <= _ts(m) and (r.valid_to is None or _ts(m) < r.valid_to)
        ]
        assert hits == [want], m


def test_funnel_strict_order_golden(spark):
    """Steps must complete strictly in order: an early 'click' before
    'view' completes is ignored, a later one counts; equal timestamps
    do NOT satisfy the strictly-after rule; never-reached steps stay
    NULL and don't block earlier ones."""
    from nolock_social_ocr_services_spark.operators.temporal import funnel

    rows = [
        # u1: click at t=5 BEFORE view(t=10) is ignored; click t=20 counts
        (0, _ts(0), 1, "signup", 0.0, ""),
        (1, _ts(0, 5), 1, "click", 0.0, ""),
        (2, _ts(0, 10), 1, "view", 0.0, ""),
        (3, _ts(0, 20), 1, "click", 0.0, ""),
        (4, _ts(0, 30), 1, "purchase", 0.0, ""),
        # u2: view at the SAME second as signup -> not strictly after
        (5, _ts(1), 2, "signup", 0.0, ""),
        (6, _ts(1), 2, "view", 0.0, ""),
        # u3: starts mid-funnel (no signup): nothing completes
        (7, _ts(2), 3, "view", 0.0, ""),
        (8, _ts(2, 10), 3, "purchase", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r.user_id: r
        for r in funnel(
            ev, steps=["signup", "view", "click", "purchase"]
        ).collect()
    }
    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    u1 = out[1]
    assert u1.steps_completed == 4
    assert (
        u1.ts_signup, u1.ts_view, u1.ts_click, u1.ts_purchase
    ) == (base, base + 10, base + 20, base + 30)
    u2 = out[2]
    assert u2.steps_completed == 1 and u2.ts_view is None
    u3 = out[3]
    assert u3.steps_completed == 0
    assert u3.ts_view is None and u3.ts_purchase is None


def test_funnel_matches_chained_min_python(spark):
    """Parity with the chained-min reference on random event streams."""
    import numpy as np

    from nolock_social_ocr_services_spark.operators.temporal import funnel

    rng = np.random.default_rng(23)
    types = ["signup", "view", "click", "purchase", "error"]
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1)
            + dt.timedelta(seconds=int(rng.integers(0, 5000))),
            int(rng.integers(0, 12)),
            types[int(rng.integers(0, 5))],
            0.0,
            "",
        )
        for i in range(600)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    steps = ["signup", "view", "click", "purchase"]
    got = {
        r.user_id: (r.steps_completed, r.ts_signup, r.ts_view, r.ts_click,
                    r.ts_purchase)
        for r in funnel(ev, steps=steps).collect()
    }
    want = {}
    by_user: dict = {}
    for _eid, ts, uid, y, _v, _p in rows:
        if y in steps:
            by_user.setdefault(uid, []).append(
                (int(ts.replace(tzinfo=dt.timezone.utc).timestamp()), y)
            )
    for uid, evs in by_user.items():
        hits = []
        prev = None
        for s in steps:
            cand = [
                t for t, y in evs
                if y == s and (prev is None or t > prev)
            ]
            cur = min(cand) if cand else None
            hits.append(cur)
            if cur is None:
                break
            prev = cur
        hits += [None] * (4 - len(hits))
        want[uid] = (sum(h is not None for h in hits), *hits)
    assert got == want and len(want) > 5


def test_cohort_retention_golden(spark):
    """Two cohorts; retention counts distinct users per offset, a user
    active twice in one period counts once, offsets beyond max_periods
    drop, and the milli-rate is exact integer division."""
    from nolock_social_ocr_services_spark.operators.temporal import (
        cohort_retention,
    )

    day = 86400

    def ev(eid, uid, day_off, sec=0):
        return (
            eid,
            dt.datetime(2024, 1, 1) + dt.timedelta(days=day_off, seconds=sec),
            uid,
            "e",
            0.0,
            "",
        )

    rows = [
        ev(0, 1, 0), ev(1, 1, 0, 30), ev(2, 1, 1),   # u1: cohort d0, d1
        ev(3, 2, 0), ev(4, 2, 2),                    # u2: cohort d0, d2
        ev(5, 3, 0), ev(6, 3, 99),                   # u3: offset 99 dropped
        ev(7, 4, 1),                                 # u4: cohort d1 only
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r.cohort_start, r.period_offset): (
            r.n_active, r.cohort_size, r.retention_milli
        )
        for r in cohort_retention(df, period_s=day, max_periods=5).collect()
    }
    base = int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    )
    assert out[(base, 0)] == (3, 3, 1000)       # u1 u2 u3
    assert out[(base, 1)] == (1, 3, 333)        # u1 only; 1000//3
    assert out[(base, 2)] == (1, 3, 333)        # u2
    assert out[(base + day, 0)] == (1, 1, 1000)  # u4's own cohort
    assert len(out) == 4                         # offset-99 row dropped


def test_pair_rules_golden(spark):
    """Hand-computed support/confidence/lift, in-basket duplicates
    collapse, and an over-cap basket is excluded from pairs AND from
    the lift population."""
    from nolock_social_ocr_services_spark.functions import basket as bk

    rows = [
        (1, "milk"), (1, "bread"), (1, "milk"),      # dup milk collapses
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "eggs"),
        (4, "bread"),
        (5, "a"), (5, "b"), (5, "c"),                # over cap: dropped
    ]
    tx = spark.createDataFrame(rows, "txn long, item string")
    out = {
        (r.item_a, r.item_b): r
        for r in bk.pair_rules(
            tx, min_pair_count=2, max_basket=2
        ).collect()
    }
    # post-cap population: txns 1-4 (basket 5 has 3 items > cap)
    assert set(out) == {("bread", "milk")}
    r = out[("bread", "milk")]
    assert r.pair_count == 2
    assert (r.count_a, r.count_b) == (3, 3)          # bread 1,2,4; milk 1,2,3
    assert r.conf_ab_milli == 2 * 1000 // 3          # P(milk|bread)
    assert r.conf_ba_milli == 2 * 1000 // 3
    assert r.lift_milli == 2 * 4 * 1000 // 9         # lift = P(ab)/P(a)P(b)
