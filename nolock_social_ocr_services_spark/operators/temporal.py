"""Temporal operators Spark lacks as built-ins: as-of join and
gap-based sessionization.

Both are expressed as single-shuffle window compositions — the
idiomatic distributed form — rather than range-exploded joins:

  * ``as_of_join``: union-tag the two sides, one window per key with
    ``last(..., ignorenulls)`` carries the most recent right-side row
    forward onto each left row. ONE shuffle on the key column, zero
    join fan-out — the N x M per-key range join never materializes.
    (A broadcast range join would shuffle nothing but only works when
    the right side fits in memory; this form scales with both sides.)
  * ``sessionize``: lag + conditional cumulative sum assigns session
    ids per key in one window pass; the session aggregate is a second
    shuffle on the (key, session) pair.

Skew note: ``as_of_join``/``sessionize`` shuffle on the entity key
(user_id); a pathological hot key serializes inside one task.
``as_of_join_salted`` is the hot-key-safe variant: the window shuffle
key becomes (key, coarse time bucket) — a hot entity splits across as
many tasks as it spans buckets — and the cross-bucket "most recent
right row" is carried in via a BUCKET-LEVEL as-of over the tiny
per-(key, bucket) last-row table, so the merge step costs O(keys x
buckets) metadata rows, never a second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _struct_type(df: DataFrame, cols: list[str]) -> str:
    return (
        "struct<"
        + ",".join(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.select(*cols).schema.fields
        )
        + ">"
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: int | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with the
    same ``on`` key and right.ts <= left.ts (DuckDB ``ASOF JOIN``
    semantics, left-outer: unmatched left rows keep NULLs).

    Returns all left columns plus ``matched_ts`` and
    ``matched_<c>`` for each c in ``right_cols``.

    ``tie_col``: deterministic winner among right rows sharing
    (key, ts) — highest ``tie_col`` wins (DuckDB leaves this
    unspecified, so oracle comparisons must dedupe the right side the
    same way). ``tolerance_seconds``: nulls the match when the right
    row is older than the tolerance.
    """
    carry = [ts, *right_cols]

    l_tag = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(_struct_type(right, carry)).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.lit(None).cast(_struct_type(left, list(left.columns))).alias("_lrow"),
        F.struct(*[F.col(c) for c in carry]).alias("_rrow"),
    )
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tie_col is not None:
        order.append(F.col("_rrow")[tie_col].asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rrow", ignorenulls=True).over(w)
    out = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", matched)
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        # timestamp-interval arithmetic: exact to the microsecond and
        # valid for TIMESTAMP_NTZ (which refuses casts to long)
        within = F.col(ts) <= F.col("_match")[ts] + F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        out = out.withColumn(
            "_match", F.when(within, F.col("_match"))
        )
    sel = [F.col("_lrow")[c].alias(c) for c in left.columns]
    sel.append(F.col("_match")[ts].alias("matched_ts"))
    sel += [F.col("_match")[c].alias(f"matched_{c}") for c in right_cols]
    return out.select(*sel)


def as_of_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: int | None = None,
    tie_col: str | None = None,
    bucket_width_seconds: int = 86400,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Hot-key-safe as-of join: output-identical to ``as_of_join`` (same
    columns, same matches), but the big window shuffles on
    (key, time-bucket) instead of key alone, so a pathological hot key
    splits across as many tasks as it spans buckets.

    How the cross-bucket match survives the split: for each left bucket
    b, the candidate set is (right rows inside b) + (the single most
    recent right row from any earlier bucket). The latter comes from a
    bucket-LEVEL as-of: one hash-agg reduces the right side to its last
    row per (key, bucket) — ``max_by`` over (ts, tie) picks the same
    winner the base operator's window order does — then a window over
    that tiny table (O(keys x buckets) rows, never the data) carries the
    running last into every left bucket. The carry row is injected into
    its bucket with its TRUE timestamp, so the in-bucket window needs no
    special casing; a same-bucket duplicate of an injected row is
    harmless (``last`` sees equal values).

    ``bucket_expr`` overrides the default ``floor(unix_timestamp(ts) /
    bucket_width_seconds)`` for non-TIMESTAMP ts columns; it must be
    monotone non-decreasing in ``ts``.
    """
    carry = [ts, *right_cols]
    b = (
        bucket_expr
        if bucket_expr is not None
        else F.floor(
            F.unix_timestamp(F.col(ts)) / F.lit(int(bucket_width_seconds))
        )
    )
    r_struct_t = _struct_type(right, carry)
    l_struct_t = _struct_type(left, list(left.columns))

    # 1. right side reduced to its last row per (key, bucket): the
    # max_by order struct mirrors the base window's (ts, tie) order
    # (struct comparison puts a NULL tie first = smallest, matching
    # asc_nulls_first).
    order_fields = [F.col(ts)] + ([F.col(tie_col)] if tie_col else [])
    rl = (
        right.withColumn("_b", b)
        .groupBy(on, "_b")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in carry]), F.struct(*order_fields)
            ).alias("_rrow")
        )
    )

    # 2. bucket-level as-of over the tiny table: latest right bucket-last
    # from a STRICTLY earlier bucket for each left bucket. Within a
    # bucket the left row sorts FIRST (side desc: 1 before 0) — a
    # same-bucket right last must NOT become the carry: its ts can be
    # LATER than left rows in the bucket, and taking it would overwrite
    # the true earlier-bucket carry those rows need (the in-bucket
    # window already sees same-bucket right rows at their real order).
    lb = left.withColumn("_b", b)
    lbuckets = lb.select(on, "_b").distinct()
    tag_lb = lbuckets.select(
        F.col(on),
        F.col("_b"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_t).alias("_rrow"),
    )
    tag_rl = rl.select(on, "_b", F.lit(0).alias("_side"), "_rrow")
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("_b").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carries = (
        tag_lb.unionByName(tag_rl)
        .withColumn("_carry", F.last("_rrow", ignorenulls=True).over(wb))
        .filter((F.col("_side") == 1) & F.col("_carry").isNotNull())
        .select(on, "_b", F.col("_carry").alias("_rrow"))
    )

    # 3. the big union, windowed per (key, bucket) — the skew-split key
    l_rows = lb.select(
        F.col(on),
        F.col(ts),
        F.col("_b"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_struct_t).alias("_rrow"),
    )
    r_rows = right.withColumn("_b", b).select(
        F.col(on),
        F.col(ts),
        F.col("_b"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_t).alias("_lrow"),
        F.struct(*[F.col(c) for c in carry]).alias("_rrow"),
    )
    c_rows = carries.select(
        F.col(on),
        F.col("_rrow")[ts].alias(ts),
        F.col("_b"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_t).alias("_lrow"),
        F.col("_rrow"),
    )
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tie_col is not None:
        order.append(F.col("_rrow")[tie_col].asc_nulls_first())
    w = (
        Window.partitionBy(on, "_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        l_rows.unionByName(r_rows)
        .unionByName(c_rows)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        within = F.col(ts) <= F.col("_match")[ts] + F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        out = out.withColumn("_match", F.when(within, F.col("_match")))
    sel = [F.col("_lrow")[c].alias(c) for c in left.columns]
    sel.append(F.col("_match")[ts].alias("matched_ts"))
    sel += [F.col("_match")[c].alias(f"matched_{c}") for c in right_cols]
    return out.select(*sel)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the
    inter-event gap within ``key`` exceeds ``gap_seconds``. Adds
    ``session_id`` (0-based per key, ts order). One window shuffle."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    new_session = (
        prev.isNull()
        | (F.col(ts) - prev > F.expr(f"INTERVAL {int(gap_seconds)} SECONDS"))
    ).cast("long")
    # first row's flag is 1; subtract 1 for 0-based ids
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregate: (key, session_id, n_events,
    session_start, session_end)."""
    s = sessionize(events, key=key, ts=ts, gap_seconds=gap_seconds)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    start: str = "start",
    end: str = "end",
    bucket_width: int = 3600,
    lprefix: str = "l_",
    rprefix: str = "r_",
) -> DataFrame:
    """All (left, right) row pairs sharing ``on`` whose half-open
    integer intervals ``[start, end)`` overlap — the range/interval
    join Spark lacks as a built-in (Databricks exposes it as a
    RANGE_JOIN hint; single-node engines run it as a plain inequality
    join, which Spark would plan as a per-key cartesian).

    Shape: each side explodes its interval onto fixed-width time
    buckets (fan-out = duration/bucket_width + 1 rows, so choose
    ``bucket_width`` near the typical duration), the sides equi-join on
    (key, bucket) — ONE ordinary shuffle hash join, never an
    inequality join — and the true overlap predicate filters the bucket
    collisions. A pair sharing several buckets is emitted exactly once
    WITHOUT a distinct: only the bucket containing
    ``greatest(l.start, r.start)`` — the first overlapped instant,
    which lies in both intervals and is therefore a bucket both sides
    exploded into — keeps the pair (the "owner bucket" dedup of
    spatial grid joins; a filter, not a shuffle).

    Empty intervals (``end <= start``) are dropped on input, so they
    never match even when the bare predicate would hold (an empty
    interval strictly inside a long one). Interval columns must be
    non-negative integers (epoch seconds/millis); ``div`` floor
    division keeps bucket ids integer-exact. Output: ``on``, then
    every other left column as ``lprefix+name`` and right column as
    ``rprefix+name``. Skew: a hot key is already subdivided by time
    bucket; AQE's skew-join split covers a residual hot (key, bucket).
    """
    w = int(bucket_width)

    def tagged(df: DataFrame, prefix: str) -> DataFrame:
        cols = [c for c in df.columns if c != on]
        return df.filter(F.col(end) > F.col(start)).select(
            F.col(on),
            *[F.col(c).alias(prefix + c) for c in cols],
            F.explode(
                F.sequence(
                    F.expr(f"{start} div {w}"),
                    F.expr(f"({end} - 1) div {w}"),
                )
            ).alias("_bk"),
        )

    lt, rt = tagged(left, lprefix), tagged(right, rprefix)
    ls, le = lprefix + start, lprefix + end
    rs, re_ = rprefix + start, rprefix + end
    pairs = lt.join(rt, [on, "_bk"]).filter(
        (F.col(ls) < F.col(re_))
        & (F.col(rs) < F.col(le))
        & (F.col("_bk") == F.expr(f"greatest({ls}, {rs}) div {w}"))
    )
    return pairs.drop("_bk")


def gapfill_locf(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tie_col: str = "event_id",
    bucket_s: int = 21600,
    cents: int = 100,
) -> DataFrame:
    """Time-bucket gap-fill with last-observation-carried-forward —
    TimescaleDB's ``time_bucket_gapfill(...) + locf(...)``, the
    hypertable regularization pass a sensor/log training pipeline
    runs before windowed feature extraction.

    Per key: (1) one hash-agg reduces events to per-bucket LAST
    observations (winner by ``(ts, tie_col)`` via ``max_by`` — a
    deterministic reduction, unlike a float mean whose partial-sum
    order would differ across partitionings); (2) the key's bucket
    GRID materializes from its own [min, max] bucket span with
    ``sequence`` + ``explode`` — fan-out is bounded by span/bucket_s,
    never by row count, and empty buckets appear exactly once;
    (3) ``last(..., ignorenulls)`` over (key ORDER BY bucket) carries
    observations forward into the gaps. Values are held in integer
    "cents" (``round(value*cents)``) so every step is bit-identical
    across engines and cluster sizes.

    Scale shape: two key-partitioned shuffles (the observation agg and
    the grid window — the join between them is a third exchange at
    most, key-co-partitioned). The window per key is the standard
    timeseries layout; a key hot enough to serialize a task gets the
    same (key, coarse-bucket) split ``as_of_join_salted`` uses.

    Returns (key, bucket_start :epoch secs, v_cents, filled) — one
    row per key per bucket in the key's span; ``filled`` marks rows
    whose value was carried forward rather than observed.
    """
    b = F.floor(F.unix_timestamp(F.col(ts)) / bucket_s).cast("long")
    obs = (
        df.select(
            F.col(key),
            b.alias("_b"),
            F.col(ts),
            F.col(tie_col),
            F.round(F.col(value) * cents).cast("long").alias("_v"),
        )
        .groupBy(key, "_b")
        .agg(
            F.max_by(
                "_v", F.struct(F.col(ts), F.col(tie_col))
            ).alias("_v")
        )
    )
    grid = (
        obs.groupBy(key)
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            key,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_b"),
        )
    )
    joined = grid.join(obs, on=[key, "_b"], how="left")
    w = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key),
        (F.col("_b") * bucket_s).alias("bucket_start"),
        F.last("_v", ignorenulls=True).over(w).alias("v_cents"),
        F.col("_v").isNull().alias("filled"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts: str = "ts",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge (Kimball): apply a batch
    of timestamped attribute updates to a versioned dimension, closing
    the open version and opening a new one at each REAL change —
    consecutive updates with unchanged attributes are collapsed, and
    closed history rows pass through untouched.

    ``current``: (key, *attrs, valid_from, valid_to) with
    ``valid_to IS NULL`` marking each key's open version.
    ``updates``: (key, *attrs, ts). Multiple updates per key per batch
    chain in ``ts`` order (ties broken open-row-first, so an update
    stamped at exactly the open version's start supersedes it).

    Distributed shape: the open rows and the updates union into ONE
    key-partitioned window pass (change-detect via ``lag`` on the attr
    struct, then ``lead`` to close intervals — the filter between the
    two windows preserves the partitioning, so Catalyst plans a single
    exchange); history rows never shuffle at all. At 10^12 rows the
    open set is |keys| and the updates batch is incremental — the
    window never sees the full history.

    Returns the new dimension: (key, *attrs, valid_from, valid_to).
    """
    a = F.struct(*[F.col(c) for c in attrs])
    open_rows = current.filter(F.col("valid_to").isNull()).select(
        F.col(key),
        a.alias("_a"),
        F.col("valid_from"),
        F.lit(0).alias("_src"),
    )
    ups = updates.select(
        F.col(key),
        a.alias("_a"),
        F.col(ts).alias("valid_from"),
        F.lit(1).alias("_src"),
    )
    w = Window.partitionBy(key).orderBy("valid_from", "_src")
    cand = (
        open_rows.unionByName(ups)
        .withColumn("_prev", F.lag("_a").over(w))
        # NOT eqNullSafe, not !=: a change to/from a NULL attribute
        # value must count as a change, and struct != is NULL there
        .filter(~F.col("_prev").eqNullSafe(F.col("_a")))
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", "_src")
    versions = cand.select(
        F.col(key),
        "_a",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    history = current.filter(F.col("valid_to").isNotNull()).select(
        F.col(key), a.alias("_a"), "valid_from", "valid_to"
    )
    return history.unionByName(versions).select(
        key,
        *[F.col("_a")[c].alias(c) for c in attrs],
        "valid_from",
        "valid_to",
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Strict-order funnel completion (the Amplitude/Mixpanel funnel,
    SQL's MATCH_RECOGNIZE-lite): per key, the earliest time each step
    completes, where step i must occur STRICTLY after step i-1's
    completion; an event type can only fill its own step, and a step
    fills at most once (earliest win).

    Shape: map-side filter to funnel-relevant events (the scan drops
    every other type before any exchange), then ONE key-partitioned
    shuffle into collect_list -> array_sort -> a single ``aggregate``
    HOF fold whose accumulator is an array<long> of per-step
    completion epochs — no join chain (the join-of-aggs form costs
    len(steps) shuffles and len(steps)-1 joins), no Python, state
    bounded at len(steps) longs per key. Per-key event lists are
    user-history-sized; a pathologically hot key takes the same
    (key, coarse-bucket) pre-split as the other temporal operators.

    Returns (key, steps_completed, ts_<step>... epoch secs, NULL where
    never reached). Keys with no funnel-relevant events are absent.
    """
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(key),
        F.struct(
            F.unix_timestamp(F.col(ts)).alias("t"),
            F.col(tie_col).cast("long").alias("tie"),
            F.col(type_col).alias("y"),
        ).alias("e"),
    )
    grouped = ev.groupBy(key).agg(
        F.array_sort(F.collect_list("e")).alias("evs")
    )
    init = F.expr(f"cast(array({', '.join(['null'] * n)}) as array<bigint>)")

    def step_fold(acc, e):
        # position i (0-based) fills when still null, the event's type
        # IS steps[i], and step i-1 completed strictly earlier.
        # greatest(i, 1): keeps element_at's 1-based index valid when
        # i == 0 (the `i == 0` disjunct decides that case; ANSI mode
        # would reject index 0 even on the untaken branch).
        return F.transform(
            acc,
            lambda v, i: F.coalesce(
                v,
                F.when(
                    (e["y"] == F.element_at(step_arr, i + F.lit(1)))
                    & (
                        (i == F.lit(0))
                        | (
                            F.element_at(
                                acc, F.greatest(i, F.lit(1))
                            ).isNotNull()
                            & (
                                e["t"]
                                > F.element_at(acc, F.greatest(i, F.lit(1)))
                            )
                        )
                    ),
                    e["t"],
                ),
            ),
        )

    done = grouped.select(
        F.col(key), F.aggregate("evs", init, step_fold).alias("hits")
    )
    return done.select(
        F.col(key),
        F.size(F.filter("hits", lambda v: v.isNotNull())).alias(
            "steps_completed"
        ),
        *[
            F.element_at("hits", i + 1).alias(f"ts_{s}")
            for i, s in enumerate(steps)
        ],
    )


def cohort_retention(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    period_s: int = 7 * 86400,
    max_periods: int = 8,
) -> DataFrame:
    """Cohort retention table (the product-analytics staple next to
    :func:`funnel`): users are cohorted by the period of their FIRST
    event; retention[c][k] = how many of cohort c were active k
    periods later, as count + milli-rate (integer arithmetic — a
    float division per engine would differ in the last ulp).

    Shape: one (key) hash-agg pins each user's cohort period (min
    bucket — partial aggs collapse map-side); one distinct over
    (key, period) reduces activity to user-period rows BEFORE the
    cohort join (so a user's 10^6 events in a week cost one row);
    the join back is key-partitioned; the final agg is over
    (cohort, offset) — at most cohorts x max_periods rows. No row
    explosion anywhere; every exchange is on keys or on the tiny
    result space.

    Returns (cohort_start epoch secs, period_offset, n_active,
    cohort_size, retention_milli), offsets 0..max_periods.
    """
    b = F.floor(F.unix_timestamp(F.col(ts)) / period_s).cast("long")
    activity = df.select(F.col(key), b.alias("_p")).distinct()
    cohorts = activity.groupBy(key).agg(F.min("_p").alias("_c"))
    sizes = cohorts.groupBy("_c").agg(F.count("*").alias("cohort_size"))
    hits = (
        activity.join(cohorts, on=key)
        .withColumn("_k", (F.col("_p") - F.col("_c")).cast("int"))
        .filter(F.col("_k") <= max_periods)
        .groupBy("_c", "_k")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        hits.join(sizes, on="_c")
        .select(
            (F.col("_c") * period_s).alias("cohort_start"),
            F.col("_k").alias("period_offset"),
            "n_active",
            "cohort_size",
            # integer div, not float /: a double quotient's last ulp
            # can truncate differently across engines
            F.expr("n_active * 1000 div cohort_size").alias(
                "retention_milli"
            ),
        )
    )
