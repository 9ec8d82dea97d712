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

Skew note: both operators shuffle on the entity key (user_id). A
pathological hot key serializes inside one task — at 100 TB, split hot
entities first (salt the key by coarse time bucket, then merge
sessions that straddle bucket edges; for as-of, replicate the right
side into each salt bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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

    def struct_type(df: DataFrame, cols: list[str]) -> str:
        return (
            "struct<"
            + ",".join(
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.select(*cols).schema.fields
            )
            + ">"
        )

    l_tag = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(struct_type(right, carry)).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.lit(None).cast(struct_type(left, list(left.columns))).alias("_lrow"),
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
