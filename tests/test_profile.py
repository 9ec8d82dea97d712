"""Data-quality ops (functions/profile.py)."""

from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions.profile import (
    check_constraints,
    mad_outliers,
    profile_table,
)


def test_profile_table_counts_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", 5.0), (2, None, 7.0), (10, "a", None)],
        "k long, s string, v double",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert (out["k"].n_nulls, out["k"].n_distinct) == (0, 3)
    assert (out["s"].n_nulls, out["s"].n_distinct) == (1, 2)
    assert (out["v"].n_nulls, out["v"].n_distinct) == (2, 2)
    # native-order min/max, stringified AFTER: 10 > 2 numerically
    assert (out["k"].min_str, out["k"].max_str) == ("1", "10")
    assert (out["s"].min_str, out["s"].max_str) == ("a", "b")


def test_check_constraints_null_is_failure(spark):
    df = spark.createDataFrame(
        [(1, "O"), (2, None), (3, "X"), (None, "O")],
        "k long, st string",
    )
    out = {r.rule: r for r in check_constraints(
        df,
        {
            "k_not_null": F.col("k").isNotNull(),
            "st_domain": F.col("st").isin("O", "F"),
        },
    ).collect()}
    assert out["k_not_null"].n_fail == 1
    # NULL status is a failure (unknown != pass), plus the 'X'
    assert out["st_domain"].n_fail == 2
    assert out["st_domain"].n_rows == 4
    assert out["st_domain"].fail_milli == 500


def test_mad_outliers_hand_computed(spark):
    """Group a: values 10..14 + one 100 — median 12(.5), the 100 flags;
    group b: constant values, MAD 0, any deviation flags, none exists."""
    rows = [("a", i, v) for i, v in enumerate([10, 11, 12, 13, 14, 100])]
    rows += [("b", i, 7) for i in range(10, 14)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = [
        (r.g, r.id, r.v, r.dev2, r.mad4)
        for r in mad_outliers(
            df, group_col="g", id_col="id", value_col="v", k_milli=3500
        ).collect()
    ]
    # group a: med2 = 25 (median 12.5); devs2 = |2v-25| = 5,3,1,1,3,175
    # sorted: 1,1,3,3,5,175 -> median 3 -> mad4 = 6
    # rule: 2000*a > 3500*6 = 21000 -> a > 10.5 -> only the 100 (a=175)
    assert out == [("a", 5, 100, 175, 6)]


def test_mad_outliers_is_robust_to_the_outliers_themselves(spark):
    """The med2/mad4 estimates must be unaffected by the outliers they
    flag (the whole point of MAD over mean/std): spread inliers 48..52
    give mad4 = 4 with or without the two extreme points, and only the
    extremes flag."""
    vals = [48, 49, 50, 51, 52] * 6 + [500, 480]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, id long, v long"
    )
    rows = mad_outliers(
        df, group_col="g", id_col="id", value_col="v", k_milli=3500
    ).collect()
    assert {r.v for r in rows} == {500, 480}
    # med2 = 100 (median 50), a = |2v-100| in {0,2,4} for inliers,
    # sorted a: 0 x6, 2 x12, 4 x12, 860, 900 -> median 2 -> mad4 = 4 —
    # identical to what the inliers alone would give
    assert all(r.mad4 == 4 for r in rows)
