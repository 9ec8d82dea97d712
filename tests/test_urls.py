"""URL canonicalization + blocklist filter: rule-by-rule goldens and
the broadcast-anti plan shape."""

from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions import urls
from nolock_social_ocr_services_spark.plans.inspect import (
    batch_eval_count,
    explain_str,
    has_broadcast_join,
)


def _canon(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "url string")
    return df.select(
        urls.canonicalize_url(F.col("url")).alias("c")
    ).first()["c"]


def test_canonicalize_rules(spark):
    # scheme+host lowercased, default port stripped, fragment stripped,
    # tracking params stripped in every position, path case PRESERVED
    assert (
        _canon(spark, "HTTP://WWW.Ex.COM:80/Path/A?utm_source=x#f")
        == "http://www.ex.com/Path/A"
    )
    assert (
        _canon(spark, "https://a.b.com:443/p?id=1&utm_campaign=y&z=2")
        == "https://a.b.com/p?id=1&z=2"
    )
    # first-position tracking keeps the following param reachable
    assert (
        _canon(spark, "https://a.b.com/p?fbclid=abc&id=1")
        == "https://a.b.com/p?id=1"
    )
    # only-tracking query collapses to no query at all
    assert _canon(spark, "https://a.b.com/p?gclid=1") == "https://a.b.com/p"
    # NON-default port survives
    assert _canon(spark, "http://a.b.com:8080/p") == "http://a.b.com:8080/p"
    # multiple tracking params all go (global replace)
    assert (
        _canon(spark, "https://a.b.com/?utm_a=1&utm_b=2")
        == "https://a.b.com/"
    )


def test_registered_domain_last_two_labels(spark):
    df = spark.createDataFrame(
        [("https://www.news.site.co/x",), ("https://plain.org/",)],
        "url string",
    )
    got = [
        r["d"]
        for r in df.select(
            urls.registered_domain(
                urls.canonicalize_url(F.col("url"))
            ).alias("d")
        ).collect()
    ]
    assert got == ["site.co", "plain.org"]


def test_url_filter_drops_blocked_and_broadcasts(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://good.example.org/a"),
            (2, "https://WWW.Bad.Spam.NET/b?utm_x=1"),
            (3, "http://ok.example.org:80/c"),
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame([("spam.net",)], "domain string")
    out = urls.url_filter(docs, blocked)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    plan = explain_str(out)
    assert has_broadcast_join(out)
    assert "SortMergeJoin" not in plan
    assert batch_eval_count(out) == 0
