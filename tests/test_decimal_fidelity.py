"""Decimal fidelity vectors (reference: DataValidationTests.cs:30-110).

The reference's money type is C# decimal (28-29 significant digits);
ours is DecimalType(38,6). These vectors pin that 29-significant-digit
values round-trip exactly through (a) a Spark plan (cast/arithmetic
stay in Catalyst decimal math) and (b) the Arrow pandas-UDF boundary —
the two places precision could silently degrade to float.
"""

from decimal import Decimal

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nolock_social_ocr_services_spark.extract.records import MONEY

# 29 significant digits (23 integer + 6 fractional), the C# decimal
# ceiling, plus boundary shapes.
VECTORS = [
    Decimal("12345678901234567890123.456789"),
    Decimal("-12345678901234567890123.456789"),
    Decimal("99999999999999999999999.999999"),
    Decimal("0.000001"),
    Decimal("-0.000001"),
    Decimal("0.000000"),
    Decimal("1.100000"),  # classic binary-float trap: 1.1
    Decimal("20000000000000000000000.000001"),
]


@pytest.fixture(scope="module")
def money_df(spark):
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType(), False),
            T.StructField("amount", MONEY, True),
        ]
    )
    return spark.createDataFrame(list(enumerate(VECTORS)), schema)


def test_roundtrip_through_plan(spark, money_df):
    got = {r.i: r.amount for r in money_df.collect()}
    for i, v in enumerate(VECTORS):
        assert got[i] == v, (i, got[i], v)


def test_arithmetic_is_exact_decimal(spark, money_df):
    """+0 and *1 must be identity in decimal math (they are NOT in
    float64: 12345678901234567890123.456789 would lose its tail)."""
    out = money_df.select(
        "i",
        (F.col("amount") + F.lit(0).cast(MONEY)).alias("plus0"),
        F.col("amount").cast("string").alias("s"),
    ).collect()
    for r in out:
        v = VECTORS[r.i]
        assert r.plus0 == v
        assert Decimal(r.s) == v
        # float64 provably cannot hold these: demonstrate the gap the
        # decimal path avoids (except for the exactly-representable ones)
        if abs(v) > Decimal("1e18"):
            assert Decimal(repr(float(v))) != v


def test_roundtrip_through_pandas_udf(spark, money_df):
    """Arrow boundary: decimal38(6) -> pandas (object Decimal) -> back."""

    @F.pandas_udf(MONEY)
    def identity(s: pd.Series) -> pd.Series:
        assert all(isinstance(v, Decimal) for v in s if v is not None)
        return s

    got = {r.i: r.out for r in money_df.select("i", identity("amount").alias("out")).collect()}
    for i, v in enumerate(VECTORS):
        assert got[i] == v, (i, got[i], v)


def test_sum_keeps_tail_digits(spark, money_df):
    """Aggregate of the vectors stays exact (decimal(38,6) sum)."""
    expected = sum(VECTORS, Decimal(0))
    got = money_df.agg(F.sum("amount").alias("s")).first().s
    assert got == expected
