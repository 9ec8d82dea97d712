"""Corpus synthesis: Spark derivation must agree byte-for-byte with the
DuckDB oracle derivation (same rules, independent engines), and the
nested form must round-trip through explode + offset-order reassembly.
"""

import base64

import duckdb
import pytest
from pyspark.sql import functions as F

from nolock_social_ocr_services_spark import corpus
from nolock_social_ocr_services_spark.trie import lenient_trie


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_flat_spans_match_duckdb(spark, sf_dir, duck):
    spark_rows = sorted(
        (r.doc_id, r.offset, r.kind, r.mime, r.text, r.media_ref)
        for r in corpus.flat_spans(spark, sf_dir).collect()
    )
    duck_rows = sorted(
        tuple(r)
        for r in duck.sql(corpus.oracle_flat_spans_sql()).fetchall()
    )
    assert len(spark_rows) == len(duck_rows) > 0
    assert spark_rows == duck_rows


def test_media_ref_payloads_carry_real_signatures(spark, sf_dir):
    trie = lenient_trie()
    rows = (
        corpus.flat_spans(spark, sf_dir)
        .filter(F.col("media_ref").isNotNull())
        .select("mime", "media_ref")
        .collect()
    )
    assert rows
    seen = set()
    for r in rows:
        b64 = r.media_ref.split(";base64,", 1)[1]
        payload = base64.b64decode(b64)
        detected = trie.search(payload)
        if r.mime == "application/octet-stream":
            assert detected is None  # unknown signature -> trie miss
        else:
            assert detected == r.mime, (r.mime, payload[:8].hex())
        seen.add(r.mime)
    # the cycle exercises every production signature family + fallback
    assert seen == set(corpus.SIG_HEX)


def test_skew_tail_exists(spark, sf_dir):
    counts = (
        corpus.flat_spans(spark, sf_dir)
        .groupBy("doc_id")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("med"),
        )
        .first()
    )
    assert counts.mx == corpus.GIANT_SPANS
    assert counts.mx >= 6 * counts.med  # giant docs dominate the median


def test_nested_corpus_physical_order_is_shuffled_but_complete(spark, sf_dir):
    nested = corpus.synthesize_documents(spark, sf_dir)
    row = nested.filter(F.size("spans") >= 6).first()
    offsets = [s.offset for s in row.spans]
    assert sorted(offsets) == list(range(len(offsets)))
    # md5-shuffled physical order: astronomically unlikely to be sorted
    assert offsets != sorted(offsets)


def test_nested_matches_flat_after_explode(spark, sf_dir):
    nested = corpus.synthesize_documents(spark, sf_dir)
    exploded = nested.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id", "s.offset", "s.kind", "s.text", "s.media_ref"
    )
    flat = corpus.flat_spans(spark, sf_dir).select(
        "doc_id", "offset", "kind", "text", "media_ref"
    )
    assert exploded.exceptAll(flat).isEmpty()
    assert flat.exceptAll(exploded).isEmpty()
