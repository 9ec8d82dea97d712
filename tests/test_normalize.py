"""ftfy-lite text normalization: per-rule goldens + map-only plan."""

from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions import text as text_fns
from nolock_social_ocr_services_spark.plans.inspect import (
    batch_eval_count,
    exchange_count,
)


def _norm(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "t string")
    return df.select(
        text_fns.normalize_text(F.col("t")).alias("n")
    ).first()["n"]


def test_mojibake_repair(spark):
    assert _norm(spark, "CafÃ© maÃ±ana") == (
        "Café mañana"
    )
    # cp1252 smart punctuation (3-char sequences)
    assert _norm(spark, "itâ€™s â€œqâ€") == (
        "it’s “q”"
    )
    assert _norm(spark, "a â€” b") == "a — b"


def test_whitespace_and_controls(spark):
    # NBSP -> space, CRLF/CR -> LF, BEL stripped, runs collapsed,
    # spaces around newlines stripped, outer trim
    assert _norm(spark, "a b") == "a b"
    assert _norm(spark, "a \r\n  b\rc") == "a\nb\nc"
    assert _norm(spark, "x\x07y\t\tz") == "xy z"
    assert _norm(spark, "  lots   of    space  ") == "lots of space"


def test_clean_text_unchanged(spark):
    assert _norm(spark, "already clean text") == "already clean text"


def test_normalize_plan_is_map_only(spark):
    df = spark.createDataFrame([("x",)], "t string")
    out = df.select(text_fns.normalize_text(F.col("t")).alias("n"))
    assert exchange_count(out) == 0
    assert batch_eval_count(out) == 0
