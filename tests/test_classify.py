"""Spark-side classification stage: the compiled-trie pandas UDF over the
synthesized corpus must detect exactly the MIME each payload was
constructed with (unknown signatures -> octet-stream fallback), and the
plan must never ship more than a 16-byte-equivalent prefix into Python.
"""

import pytest
from pyspark.sql import functions as F

from nolock_social_ocr_services_spark import corpus
from nolock_social_ocr_services_spark.operators.classify import (
    classify_mime,
    decode_data_url_prefix,
)
from nolock_social_ocr_services_spark.trie import MimeTypeTrie, strict_trie


@pytest.fixture(scope="module")
def media_spans(spark, sf_dir):
    return (
        corpus.flat_spans(spark, sf_dir)
        .filter(F.col("media_ref").isNotNull())
        .select("doc_id", "offset", F.col("mime").alias("intended_mime"), "media_ref")
        .cache()
    )


def test_classify_detects_constructed_mime(media_spans):
    out = classify_mime(media_spans, data_url_col="media_ref", out_col="detected")
    mismatches = out.filter(F.col("detected") != F.col("intended_mime"))
    assert mismatches.count() == 0
    assert out.filter(F.col("detected").isNull()).count() == 0


def test_classify_octet_stream_fallback(media_spans):
    out = classify_mime(media_spans, data_url_col="media_ref", out_col="detected")
    fb = out.filter(F.col("intended_mime") == "application/octet-stream")
    assert fb.count() > 0
    assert fb.filter(F.col("detected") != "application/octet-stream").count() == 0


def test_strict_mode_nulls_unknown(media_spans):
    out = classify_mime(
        media_spans,
        data_url_col="media_ref",
        out_col="detected",
        strict=True,
        trie=strict_trie(),
    )
    unknown = out.filter(F.col("intended_mime") == "application/octet-stream")
    assert unknown.filter(F.col("detected").isNotNull()).count() == 0


def test_classify_binary_column(spark):
    rows = [
        (bytes.fromhex("FFD8FFE0") + b"x" * 100, "image/jpeg"),
        (bytes.fromhex("89504E470D0A1A0A") + b"y" * 100, "image/png"),
        (bytes.fromhex("ABCDEF"), "application/octet-stream"),
        (b"", "application/octet-stream"),
        (None, None),
    ]
    df = spark.createDataFrame(rows, "payload binary, expected string")
    out = classify_mime(df, payload_col="payload", out_col="mime")
    got = {r.expected: r.mime for r in out.collect()}
    for r in out.collect():
        assert r.mime == r.expected


def test_decode_data_url_prefix_roundtrip(spark):
    import base64

    payload = bytes.fromhex("89504E470D0A1A0A") + b"hello world padding"
    url = "data:image/png;base64," + base64.b64encode(payload).decode()
    df = spark.createDataFrame([(url,)], "media_ref string")
    prefix = df.select(decode_data_url_prefix(F.col("media_ref")).alias("p")).first().p
    assert bytes(prefix) == payload[:18]  # 24 b64 chars -> 18 bytes
    assert bytes(prefix)[:16] == payload[:16]


def test_custom_trie_longest_prefix_in_spark(spark):
    t = MimeTypeTrie()
    t.add(b"\xff\xd8", "short/type")
    t.add(b"\xff\xd8\xff\xe0", "long/type")
    df = spark.createDataFrame(
        [(b"\xff\xd8\xff\xe0rest",), (b"\xff\xd8\xff",), (b"\xab",)],
        "payload binary",
    )
    out = classify_mime(df, payload_col="payload", out_col="mime", trie=t)
    assert [r.mime for r in out.collect()] == [
        "long/type",
        "short/type",
        "application/octet-stream",
    ]


def test_prefix_slicing_stays_jvm_side(media_spans):
    # The physical plan must show ArrowEvalPython receiving a substring /
    # unbase64 projection, i.e. full payloads never cross into Python.
    out = classify_mime(media_spans, data_url_col="media_ref", out_col="detected")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized (Arrow) UDF, not BatchEvalPython


def test_mime_from_url_map(spark):
    """S4 extension map (ImageUrlToDataUrlTransformer.cs:21-36): path
    extension wins case-insensitively, query/fragment stripped, unknown
    or missing extension -> image/jpeg default (:235)."""
    from nolock_social_ocr_services_spark.operators.classify import mime_from_url

    cases = [
        ("https://a/x.jpg", "image/jpeg"),
        ("https://a/x.JPEG", "image/jpeg"),
        ("https://a/x.png?w=1", "image/png"),
        ("https://a/x.svg#frag", "image/svg+xml"),
        ("https://a/x.tif", "image/tiff"),
        ("https://a/x.pdf", "application/pdf"),
        ("https://a/x.dat", "image/jpeg"),  # unknown ext -> default
        ("https://a/noext", "image/jpeg"),  # no ext -> default
        (None, None),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in cases], "url string"
    ).withColumn("mime", mime_from_url(F.col("url")))
    got = {r.url: r.mime for r in df.collect()}
    for url, want in cases:
        assert got[url] == want, (url, got[url], want)


def test_classify_with_url_fallback(spark, media_spans):
    """Magic bytes win; octet-stream payloads defer to the URL ext."""
    from nolock_social_ocr_services_spark.operators.classify import (
        classify_with_url_fallback,
    )

    with_url = media_spans.withColumn(
        "payload_prefix", decode_data_url_prefix(F.col("media_ref"))
    ).withColumn("url", F.lit("https://img.example/x.webp"))
    out = classify_with_url_fallback(with_url, url_col="url", out_col="combined")
    # every known payload keeps its trie mime
    known = out.filter(F.col("intended_mime") != "application/octet-stream")
    assert known.filter(F.col("combined") != F.col("intended_mime")).count() == 0
    # unknown payloads pick up the url extension mime
    unknown = out.filter(F.col("intended_mime") == "application/octet-stream")
    assert unknown.count() > 0
    assert unknown.filter(F.col("combined") != "image/webp").count() == 0


def test_expr_engine_equivalent_to_udf(media_spans):
    """trie_match_expr (codegen'd fast path) must agree with the
    compiled-NumPy UDF on EVERY corpus span, in both modes."""
    for kwargs in (
        {},
        {"strict": True, "trie": strict_trie()},
    ):
        a = classify_mime(
            media_spans, data_url_col="media_ref", out_col="m",
            engine="udf", **kwargs
        ).select("doc_id", "offset", "m")
        b = classify_mime(
            media_spans, data_url_col="media_ref", out_col="m",
            engine="expr", **kwargs
        ).select("doc_id", "offset", F.col("m").alias("m2"))
        j = a.join(b, on=["doc_id", "offset"])
        assert j.filter(~F.col("m").eqNullSafe(F.col("m2"))).count() == 0


def test_expr_engine_golden_vectors(spark):
    """Longest-prefix semantics of the when-chain on edge payloads:
    short forms vs long forms, branching GIF, partial/divergent, NULL,
    malformed base64."""
    rows = [
        ("data:x;base64,/9j/4A==", "image/jpeg"),          # FFD8FF E0: long form
        ("data:x;base64,/9g=", "image/jpeg"),              # FFD8 only: 2-byte short form
        ("data:x;base64,iVBORw0KGgo=", "image/png"),       # full 8-byte png
        ("data:x;base64,iVBORw==", "image/png"),           # 4-byte short form
        ("data:x;base64,R0lGODdh", "image/gif"),           # GIF87a
        ("data:x;base64,R0lGODlh", "image/gif"),           # GIF89a
        ("data:x;base64,R0lGOQ==", "application/octet-stream"),  # GIF8 9-divergent
        ("data:x;base64,JVBERg==", "application/pdf"),
        ("data:x;base64,!!notbase64", "application/octet-stream"),
        (None, None),
    ]
    df = spark.createDataFrame(rows, "media_ref string, expect string")
    out = classify_mime(df, data_url_col="media_ref", out_col="m", engine="expr")
    for r in out.collect():
        assert r.m == r.expect, (r.media_ref, r.m, r.expect)


def test_unknown_engine_raises(media_spans):
    with pytest.raises(ValueError, match="unknown classify engine"):
        classify_mime(media_spans, data_url_col="media_ref", engine="bogus")
