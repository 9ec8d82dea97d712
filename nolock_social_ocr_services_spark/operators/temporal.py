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
