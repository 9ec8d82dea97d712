"""Data-quality profiling and constraint validation (the Deequ /
Great-Expectations surface a production table pipeline runs before
publishing a snapshot).

Two ops:
  * ``profile_table`` — per-column stats (rows, nulls, distincts,
    min/max as canonical strings) computed in a FIXED number of
    passes: one agg for counts/min/max over every column at once
    (partial aggs collapse map-side, the shuffle carries one row per
    partition), plus one distinct-agg. Output is one row per column —
    bounded by schema width, never by data.
  * ``check_constraints`` — row-level boolean rules evaluated in ONE
    map-side projection + ONE tiny agg: (rule, n_rows, n_fail,
    fail_milli). A failing rule never fails the job — errors are data
    (the reference's errors-as-data contract, SURVEY §2.10 ST6).

Everything integer or string — no float leaves either op, so results
are bit-identical across engines and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str). min/max are canonical strings (numerics via
    plain CAST) so one schema serves every column type; NULL when the
    column is all-NULL."""
    cols = cols if cols is not None else df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}")
        )
        # min/max in the column's NATIVE order, cast to string after —
        # casting first would rank numerics lexicographically ("10"<"9")
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    # pivot the single stats row into one output row per column —
    # stack is a plan-side reshape of an already-1-row relation
    parts = ", ".join(
        f"'{c}', _nulls_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {parts}) AS"
        " (column, n_nulls, n_distinct, min_str, max_str)",
        "_n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def check_constraints(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate named boolean rules over every row in one pass:
    (rule, n_rows, n_fail, fail_milli). A NULL rule result counts as a
    FAILURE (unknown is not a pass — the Deequ convention)."""
    flags = df.select(
        *[
            (~F.coalesce(expr, F.lit(False))).cast("long").alias(name)
            for name, expr in rules.items()
        ]
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.col(name)).alias(f"_f_{name}") for name in rules],
    )
    parts = ", ".join(f"'{name}', _f_{name}" for name in rules)
    return agg.selectExpr(
        f"stack({len(rules)}, {parts}) AS (rule, n_fail)", "_n AS n_rows"
    ).select(
        "rule",
        "n_rows",
        "n_fail",
        F.expr("n_fail * 1000 div n_rows").alias("fail_milli"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    k_milli: int = 3500,
) -> DataFrame:
    """Per-group robust outliers by median/MAD (the Iglewicz-Hoaglin
    robust z-score — the outlier rule that survives the outliers
    themselves, unlike mean/stddev): flag rows where
    |x - median| > k * MAD, k in milli-units (3500 = the classic 3.5).

    DOUBLED-INTEGER exactness: for an integer ``value_col``, the 0.5
    quantile interpolates to either an integer or a half — so
    ``med2 = 2*median`` and ``mad4 = 2*median(|2x - med2|)`` are exact
    integers in BOTH engines, and the flag rule multiplies through to
    ``2000*|2x - med2| > k_milli * mad4`` with no float anywhere.

    Shape: two grouped percentile aggs + two key-partitioned joins.
    Exact per-group percentile is sort-based within the group — the
    correctness form; at 10^12 rows the dial is the same
    approx-boundary substitution ``length_curriculum`` demonstrates
    (hist-bucket medians), which this rule tolerates by construction
    (MAD is robust to quantile slack).

    Returns outlier rows: (group, id, value, dev2, mad4).
    """
    g, i, v = F.col(group_col), F.col(id_col), F.col(value_col)
    med = df.groupBy(g.alias("_g")).agg(
        (2 * F.expr(f"percentile({value_col}, 0.5)"))
        .cast("long")
        .alias("_med2")
    )
    dev = (
        df.select(g.alias("_g"), i.alias("_id"), v.alias("_v"))
        .join(med, on="_g")
        .withColumn("_a", F.abs(2 * F.col("_v") - F.col("_med2")))
    )
    mad = dev.groupBy("_g").agg(
        (2 * F.expr("percentile(_a, 0.5)")).cast("long").alias("_mad4")
    )
    return (
        dev.join(mad, on="_g")
        .filter(2000 * F.col("_a") > F.lit(k_milli) * F.col("_mad4"))
        .select(
            F.col("_g").alias(group_col),
            F.col("_id").alias(id_col),
            F.col("_v").alias(value_col),
            F.col("_a").alias("dev2"),
            F.col("_mad4").alias("mad4"),
        )
    )
